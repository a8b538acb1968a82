package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: regenerate the N× validation sets — per-token-tagged
  * (gram-disjoint) copies of sf0.1 documents plus key-offset copies of
  * events/orders/lineitem and sign-scrambled copies of embeddings.
  * Gram-disjoint copies are the honest scale-out test for the posting-
  * join family (see BASELINE.md: prefix-sharing copies instead measure
  * the hot-key failure mode, not scale-out).
  *
  * Usage: `runMain graft.Gen10x [outDir] [copies]` — defaults
  * `/tmp/sf1 10` (the 10× set); `runMain graft.Gen10x /tmp/sf10 100`
  * builds the 100× set for the two-orders-of-magnitude superlinearity
  * check (a 2-point 10× fit can hide an n² term a 3rd point exposes).
  */
object Gen10x {
  def main(args: Array[String]): Unit = {
    val src = "/root/testdata/sf0.1"
    val out = if (args.length > 0) args(0) else "/tmp/sf1"
    val n = if (args.length > 1) args(1).toInt else 10
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def copies(df: DataFrame, f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until n).map(c => f(df, c)).reduce(_ unionAll _)

    // doc offset c*10k, NOT c*1e6 (round 14): source doc_ids are
    // 0..4999, and a 1e6 stride put copy 9 at 9,000,000–9,004,999 —
    // exactly on top of the 9,000,001+ planted-dedup id space the
    // text-dedup queries union in (the same collision class the
    // embedding offset fix below documents; measured at 10×:
    // q_simhash_neardup / q_stream_minhash_dedup flag flips, because
    // the colliding organic doc floods the planted pair's bucket on
    // the capped engine side while the uncapped oracle keeps it). A
    // 10k stride keeps even the 100× set at max 99·10k+4999 = 994,999,
    // clear of every 9,000,001+ plant space. Regenerate /tmp/sf1 and
    // /tmp/sf10 with --regen at the next round open; the round-14
    // ledger/sweep artifacts were produced on the old-stride corpora
    // (collision documented in BASELINE §round-14).
    val docs = Tables.documents(spark, src)
    copies(docs, (d, c) => d.select(
        (col("doc_id") + c * 10000L).as("doc_id"),
        array_join(transform(split(col("text"), " "),
          t => concat(t, lit(s"x$c"))), " ").as("text"),
        col("lang"), col("source"), col("n_chars")))
      .repartition(32).write.mode("overwrite").parquet(s"$out/documents.parquet")

    val ev = Tables.events(spark, src)
    copies(ev, (d, c) => d.select(
        (col("event_id") + c * 10000000L).as("event_id"), col("ts"),
        (col("user_id") + c * 100000L).as("user_id"),
        col("event_type"), col("value"), col("props")))
      .repartition(32).write.mode("overwrite").parquet(s"$out/events.parquet")

    val ord = Tables.orders(spark, src)
    copies(ord, (d, c) => d.withColumn("o_orderkey",
        col("o_orderkey") + c * 10000000L))
      .repartition(32).write.mode("overwrite").parquet(s"$out/orders.parquet")

    val li = Tables.lineitem(spark, src)
    copies(li, (d, c) => d.withColumn("l_orderkey",
        col("l_orderkey") + c * 10000000L))
      .repartition(32).write.mode("overwrite").parquet(s"$out/lineitem.parquet")

    // Embedding copies are SIGN-SCRAMBLED per copy (copy 0 = identity):
    // a key-offset copy with dims as-is would plant n−1 exact cos-1.0
    // duplicates of EVERY vector — an artificial mega-cluster that (a)
    // blows q_embed_neardup up to O(n²) pairs and (b) swamps the r9
    // planted-cluster recall gates, whose premise is the near-uniform
    // geometry the shipped corpus actually has. Component-wise ±1 flips
    // keyed by (copy, pos) preserve every norm exactly while making the
    // copies near-orthogonal to their originals — n× the rows, same
    // geometry class as the source.
    val emb = Tables.embeddings(spark, src)
    def signFlip(c: Int): DataFrame = {
      import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
      val signs = (0 until 64).map { j =>
        val h = XxHash64(Seq(Literal(c), Literal(j)), 77L).eval(null).asInstanceOf[Long]
        if ((h & 1L) == 0L) 1.0f else -1.0f
      }.toArray
      // offset keyed well BELOW the planted id spaces (9000001+ dedup
      // plants, 9200001+ ANN plants): c*1e6 put copy 9 exactly on top of
      // the q_embed_neardup plant ids, and the bucket groupBy summed the
      // colliding rows' sign bits into garbage buckets (0 candidate
      // pairs at 10× — observed, diagnosed, fixed here). c*10000 keeps
      // even the 100× set (max id ~1e6) clear of 9000001+.
      emb.withColumn("vec_id", col("vec_id") + c * 10000L)
        .withColumn("embedding",
          zip_with(col("embedding"), lit(signs), (a, b) => a * b))
    }
    (Seq(emb) ++ (1 until n).map(signFlip)).reduce(_ unionAll _)
      .repartition(32).write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    Seq("customer", "nation", "region", "supplier", "part").foreach { t =>
      Tables(spark, src, t).write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    println(s"[gen10x] done: $out ($n copies)")
    spark.stop()
  }
}
