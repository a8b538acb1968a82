package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Capped blocked-pair enumeration (VERDICT r9 #1) — the shared
  * skew guard for every bucket-blocking dedup/ANN site.
  *
  * Blocked candidate generation (band/bucket equi-self-join) is
  * quadratic PER BUCKET: a mega-bucket of b members emits b² pairs from
  * one task. At gate scales every organic bucket is tiny (BucketProbe,
  * round 10: max 20 for the 16-bit phash/minhash/sign blocks at sf0.1,
  * max ≈ 2× the designed mean 64 for the LSH graph buckets), but at
  * 100 TB a degenerate key — a boilerplate document duplicated 10⁶
  * times, an all-zero embedding — would put 10¹² pairs in one task.
  * The cap bounds that: members are ranked by id within their bucket
  * (row_number — a sort shuffle, linear in bucket size and spillable,
  * unlike a collect_list that must hold the mega-bucket in one agg
  * buffer), only the `cap` lowest-id members enumerate pairs
  * (≤ cap²/2 per bucket), and every overflowing bucket is COUNTED so
  * the caller can surface the loss as an `overflow_buckets` accounting
  * column instead of silently degrading recall. Rank cap+1 exists in
  * exactly the overflowing buckets, so the accounting rides the same
  * ranked intermediate — which is materialized ONCE (localCheckpoint,
  * round 12) so a consumer embedding both outputs in one plan never
  * re-plans the upstream bucket pipeline.
  *
  * Caps are calibrated ABOVE the organic gate-scale maximum (so the
  * literal oracles pin overflow_buckets = 0 and results are unchanged)
  * but bound adversarial skew; BlockingSpec proves the bound on a
  * planted 200-copy mega-bucket.
  */
object Blocking {

  /** Cap for the 16-bit band / sign-pattern blocking sites (organic
    * max 20 at sf0.1; a real near-dup bucket is a handful of drafts). */
  val BandCap = 64

  /** Cap for the kNN-graph LSH buckets, which are SIZED for mean
    * occupancy 64 (P ≈ log2(n/64)) — 4× the design mean (organic max
    * ≈ 2× at every probed scale). */
  val LshCap = 256

  /** Cap for the simhash 16-bit-chunk blocking (round 11): similar
    * documents CONCENTRATE in chunk buckets (organic max grows with
    * corpus: 179 at sf0.1, 468 at 10×, 867 at 100× — BucketProbe), so
    * this site needs more headroom than the uniform-hash bands. 1024
    * keeps overflow 0 at every probed scale while bounding an
    * adversarial degenerate-signature bucket at ~0.5M pairs instead of
    * b². */
  val ChunkCap = 1024

  /** Document-frequency cap for the gram-posting self-joins (round 11):
    * a gram appearing in more than this many documents is a COMMON gram
    * — it carries no near-dup signal and its posting list would emit
    * df² join rows from one key. Dropping it from both sides before the
    * self-join is the CCNet/stopword-removal standard; the count of
    * dropped grams is surfaced as a `hot_grams` accounting column so
    * the event is visible, never silent. Calibration (BucketProbe,
    * round 11): organic max df is 25 at EVERY generated scale
    * (sf0.01 → 100× — the corpus grows by adding new grams, per-gram
    * df stays bounded), so 64 changes nothing organically while
    * bounding per-gram fan-out at 64²/2 pairs under adversarial skew. */
  val GramDfCap = 64

  /** Splits `postings` (one row per (doc, key), pre-distinct) into
    * (retained postings, 1-row `hot_grams` count): keys whose posting
    * list exceeds `cap` are removed from BOTH join sides. The hot set
    * is tiny by construction (≤ total/cap keys can be hot) so it
    * broadcasts; the df aggregate is one linear scan. */
  private[graft] def dfCappedPostings(postings: DataFrame, key: String,
      cap: Int): (DataFrame, DataFrame) = {
    val hot = postings.groupBy(key).agg(count(lit(1)).as("df_"))
      .filter(col("df_") > cap).select(key)
    // the USING anti-join moves the key column first — restore the
    // caller's column order (consumers rename positionally via toDF)
    val kept = postings.join(broadcast(hot), Seq(key), "left_anti")
      .select(postings.columns.map(col).toIndexedSeq: _*)
    val hotCount = hot.agg(count(lit(1)).as("hot_grams"))
    (kept, hotCount)
  }

  /** Returns (pairs, overflow): `pairs` = distinct (id_a < id_b)
    * candidate pairs from members sharing a bucket, at most `cap`
    * lowest-id members per bucket; `overflow` = 1-row DataFrame with a
    * single BIGINT `overflow_buckets` column counting capped buckets.
    * `buckets` must have the `key` columns plus a numeric/orderable
    * `idCol`; duplicate (key, id) rows are fine (pairs are distinct). */
  private[graft] def cappedBucketPairs(buckets: DataFrame, key: Seq[String],
      idCol: String, cap: Int): (DataFrame, DataFrame) = {
    val w = Window.partitionBy(key.map(col): _*).orderBy(col(idCol))
    // the ranked intermediate is MATERIALIZED once (round 12, VERDICT
    // r11 #2): a consumer that embeds BOTH outputs in one plan (the
    // `.crossJoin(broadcast(overflow))` accounting shape of
    // q_embed_neardup / q_minhash_neardup / q_minhash_recall / simhash /
    // multimodal) would otherwise re-plan the whole upstream signature
    // pipeline twice — the rk ≤ cap and rk = cap+1 consumers carry
    // different WindowGroupLimit params, which blocks exchange reuse
    // above the rank, so the duplication was a 2× tax on the most
    // expensive stage of every blocked-dedup query. The rk ≤ cap+1
    // filter keeps the checkpoint BOUNDED (≤ cap+1 rows per bucket,
    // planned as one WindowGroupLimit that prunes before the full
    // sort) and both outputs read the materialized blocks.
    val ranked = buckets
      .select((key :+ idCol).map(col): _*).distinct()
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= cap + 1)
      .localCheckpoint()
    // enumerate pairs from a list collected AFTER the cap: the list is
    // bounded (≤ cap entries per bucket, so the agg buffer can never
    // hold a mega-bucket).
    val pairs = ranked.filter(col("rk") <= cap)
      .groupBy(key.map(col): _*)
      .agg(collect_list(col(idCol)).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(col("ids")).as("id_a"), col("ids"))
      .select(col("id_a"), explode(col("ids")).as("id_b"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val overflow = ranked.filter(col("rk") === cap + 1)
      .agg(count(lit(1)).as("overflow_buckets"))
    (pairs, overflow)
  }

  /** Ride `overflow`'s 1-row count on every row of `rows` — and, when
    * `rows` is EMPTY, emit one all-null sentinel row still carrying the
    * count. Round 12: the pair-list consumers (q_embed_neardup,
    * q_minhash_neardup) used a plain crossJoin, so in the all-overflow
    * regime (observed at 100× on the fixed-P embed buckets: every
    * bucket clips, every planted pair drops) the output was EMPTY and
    * the accounting column vanished exactly when it mattered — a
    * silent clip, the one thing the accounting exists to prevent. The
    * presence probe is `rows.limit(1)` (a ≤1-row relation, broadcast
    * at any scale; the 1-row-vs-1-row anti join emits the sentinel iff
    * no result row survived). At the oracle gate scales `rows` is
    * nonempty, the sentinel never fires, and the output is
    * byte-identical to the crossJoin form.
    *
    * `rows` is MATERIALIZED once (ADVICE r12): only the blocking stage
    * upstream is checkpointed, so the un-materialized form re-executed
    * the id-joins/cosine/jaccard VERIFY stage twice per query (result +
    * presence probe) — and in the all-overflow regime the probe scanned
    * the entire verify pipeline just to prove emptiness. The verify
    * output is the query's own (cap-bounded) result set, so the
    * checkpoint is no larger than what the query writes anyway. */
  private[graft] def withOverflowAccounting(rows: DataFrame,
      overflow: DataFrame): DataFrame = {
    val mat = rows.localCheckpoint()
    val withCol = mat.crossJoin(broadcast(overflow))
    val nulls = mat.schema.fields.toSeq
      .map(f => lit(null).cast(f.dataType).as(f.name))
    val sentinel = overflow
      .join(broadcast(mat.limit(1)), lit(true), "left_anti")
      .select(nulls :+ col("overflow_buckets"): _*)
    withCol.unionByName(sentinel)
  }
}
