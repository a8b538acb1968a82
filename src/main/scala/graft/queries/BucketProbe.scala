package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{minhash_signature, phash64, shingles, sign_pack32, tokens}

/** Scratch calibration probe (round 10): measures bucket-occupancy
  * distributions for every blocked-pair enumeration site, so the hub
  * caps (VERDICT r9 #1) can be pinned ABOVE the organic gate-scale
  * maximum (overflow must be 0 at both gate scales for the literal
  * oracles) while still bounding task state against mega-bucket skew.
  * Run: runMain graft.queries.BucketProbe <sfDir> */
object BucketProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val s = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._

    // one LEDGER line per site carries the APPLIED cap and the overflow
    // the capped enumerator would surface (buckets/keys above cap) —
    // the round-12 skew ledger: every site's overflow economics in one
    // greppable section instead of six query rows (VERDICT r11 #7).
    def stats(name: String, occ: org.apache.spark.sql.DataFrame,
        cap: Int): Unit = {
      val r = occ.agg(count(lit(1)).as("n_buckets"), max("n").as("max_occ"),
        round(avg("n"), 1).as("mean_occ"),
        sum(when(col("n") > 64, 1).otherwise(0)).as("gt64"),
        sum(when(col("n") > 128, 1).otherwise(0)).as("gt128"),
        sum(when(col("n") > 256, 1).otherwise(0)).as("gt256"),
        sum(when(col("n") > cap, 1).otherwise(0)).as("over_cap")).collect()(0)
      println(s"PROBE $name buckets=${r.get(0)} max=${r.get(1)} " +
        s"mean=${r.get(2)} gt64=${r.get(3)} gt128=${r.get(4)} gt256=${r.get(5)}")
      println(s"LEDGER site=$name cap=$cap overflow=${r.get(6)} max_occ=${r.get(1)}")
    }

    // 1. q_phash_dedup (round 14 shape): exact-hash classes collapse
    // BEFORE banding, so the band site is measured over the class
    // REPRESENTATIVES (what the shipped plan blocks on — duplication-
    // invariant occupancy) and the class-size site carries the other
    // cap. The r13 media-level numbers (14876 over cap, max 3264 at
    // 100×) were exactly the exact-duplication mass this split removes.
    val media = Tables.documents(s, d)
      .select(col("doc_id").as("media_id"), col("text").as("txt"))
      .unionAll(MultimodalQueries.phPlanted.toDF("media_id", "txt"))
      .select(col("media_id"), phash64(encode(col("txt"), "UTF-8")).as("ph"))
    stats("phash_classes", media.groupBy("ph").agg(count(lit(1)).as("n")),
      Blocking.BandCap)
    stats("phash_bands", media.groupBy("ph").agg(min("media_id").as("rep_id"))
      .select(col("rep_id"),
        posexplode(array((0 until 4).map(b =>
          shiftright(col("ph"), b * 16).bitwiseAND(lit(0xFFFFL))): _*))
          .as(Seq("band", "bkey")))
      .groupBy("band", "bkey").agg(count(lit(1)).as("n")), Blocking.BandCap)

    // 2. q_multimodal_dedup channels over documents ⋈ embeddings
    val items = Tables.documents(s, d).select(col("doc_id").as("id"), col("text"))
      .join(Tables.embeddings(s, d).select(col("vec_id").as("id"), col("embedding")), "id")
    val grams = items.select(col("id"),
        array_distinct(shingles(tokens(col("text")), 3)).as("g"))
      .withColumn("sig", minhash_signature(col("g"), 16))
    stats("minhash_bands", grams.select(col("id"),
        posexplode(array((0 until 4).map(b =>
          hash(slice(col("sig"), b * 4 + 1, 4), lit(b))): _*)).as(Seq("band", "bkey")))
      .groupBy("band", "bkey").agg(count(lit(1)).as("n")), Blocking.BandCap)
    stats("sign_buckets", items.select(col("id"), sign_pack32(col("embedding")).as("sg"))
      .groupBy("sg").agg(count(lit(1)).as("n")), Blocking.BandCap)
    // round 15: the payload channel collapses exact-hash classes before
    // banding (the q_phash_dedup rule carried to q_multimodal_dedup), so
    // the ledger now mirrors BOTH shipped levels — class occupancy (the
    // capped hamming-0 enumeration) and REP-level band occupancy (the
    // duplication-invariant quantity the r15 collapse bought; the old
    // raw-member site read 3 overflowing buckets at 10× / 6454 at 100×)
    val payloadPhs = items
      .select(col("id"), phash64(encode(col("text"), "UTF-8")).as("ph"))
    stats("payload_phash_classes",
      payloadPhs.groupBy("ph").agg(count(lit(1)).as("n")), Blocking.BandCap)
    stats("payload_phash_bands", payloadPhs
      .groupBy("ph").agg(min("id").as("rep_id"))
      .select(col("rep_id"), posexplode(array((0 until 4).map(b =>
          shiftright(col("ph"), b * 16).bitwiseAND(lit(0xFFFFL))): _*))
          .as(Seq("band", "bkey")))
      .groupBy("band", "bkey").agg(count(lit(1)).as("n")), Blocking.BandCap)

    // 2b. round-11 join-form sites (VERDICT r10 #3): the band/chunk/gram
    // keys whose SELF-JOINS were the uncapped half of the skew family
    val postings = TextQueries.postingsOf(s, d)
    stats("gram_df", postings.groupBy("gh").agg(count(lit(1)).as("n")),
      Blocking.GramDfCap)
    val mhSigs = postings.groupBy("doc_id")
      .agg(min(xxhash64(lit(0), col("gh"))).as("h0"),
        (1 until 16).map(j => min(xxhash64(lit(j), col("gh"))).as(s"h$j")): _*)
    stats("neardup_band_buckets", mhSigs
      .select(col("doc_id"), explode(array((0 until 8).map { b =>
        xxhash64(lit(b), concat_ws(",",
          (0 until 2).map(r => col(s"h${b * 2 + r}").cast("string")): _*))
      }: _*)).as("band"))
      .groupBy("band").agg(count(lit(1)).as("n")), Blocking.BandCap)
    stats("simhash_chunk_buckets", TextQueries.simhashSigs(s, d)
      .select(col("doc_id"), posexplode(array((0 until 4).map(i =>
        shiftright(col("sig"), i * 16).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("blk", "key")))
      .groupBy("blk", "key").agg(count(lit(1)).as("n")), Blocking.ChunkCap)

    // 3. knnGraphShared LSH buckets (same sizing arithmetic)
    val emb = VectorQueries.plantedEmb(s, d)
    val n = emb.count()
    val p = math.max(4, math.ceil(math.log(n / 64.0) / math.log(2)).toInt)
    println(s"PROBE knn n=$n P=$p")
    stats("knn_lsh_buckets", VectorQueries.hyperplaneBuckets(emb, L = 12, P = p)
      .groupBy("t", "bucket").agg(count(lit(1)).as("n")), Blocking.LshCap)

    // 4. q_embed_neardup blocking buckets (L=16 hyperplane LSH,
    // BandCap) — the one capped site the round-10 probe missed. P is
    // data-adaptive since round 13 (the r12 fixed P=8 saturated every
    // bucket at 100×): probe with the query's own sizing rule so the
    // ledger row measures what the query actually runs.
    val embNd = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val nNd = embNd.count() + 2 // the query adds 2 planted near-dup rows
    val pNd = VectorQueries.embedNeardupP(nNd)
    println(s"PROBE embed n=$nNd P=$pNd")
    stats("embed_lsh_buckets",
      VectorQueries.hyperplaneBuckets(embNd, L = 16, P = pNd)
      .groupBy("t", "bucket").agg(count(lit(1)).as("n")), Blocking.BandCap)

    s.stop()
  }
}
