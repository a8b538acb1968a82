package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev diagnostic (VERDICT r9→r12 carried stretch): RAW recall@10 of
  * every approximate ANN path against the exact brute-force top-10,
  * over the UNplanted corpus of a given directory. On the shipped
  * near-uniform corpus raw recall is data-limited (1–3/10 — nothing to
  * find); on the GenClustered set (10 genuine Gaussian clusters) it
  * measures real cluster recovery. The CONTRACT gates stay pinned on
  * the planted-cluster pigeonhole floors and are untouched by this
  * probe — this is the "report raw recall alongside the floors" table
  * for BASELINE.md §clustered-recall.
  *
  * Usage: `runMain graft.queries.AnnRecallProbe [sfDir ...]` (default:
  * /root/testdata/sf0.01 /tmp/sfc0.01). Prints one block per dir with
  * hits@10 per method.
  */
object AnnRecallProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/tmp/sfc0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    dirs.foreach { d =>
      println(s"\n[annrecall] dir=$d")
      val exact = VectorQueries.bruteTop10(spark, d).localCheckpoint()
      val methods: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
        "ivf_np2"      -> (() => VectorQueries.ivfTop10(spark, d)),
        "lsh_l12p4"    -> (() => VectorQueries.lshTop10(spark, d)),
        "int8"         -> (() => VectorQueries.quantizedTop10(spark, d)),
        "pq_m8k16"     -> (() => VectorQueries.pqTop10(spark, d)),
        // 8-bit codebook (round 13): the other axis of the recall-vs-
        // depth trade. Measured on 500-member clusters: bit-width
        // LEFT-SHIFTS the depth curve (r128: 7 vs 3; r256: 9 vs 4) but
        // cannot rescue a shortlist far below the tie set (r64: 3 = 3)
        "pq8_m8k256"   -> (() => VectorQueries.pq8Top10(spark, d)),
        "ivfpq_np2"    -> (() => VectorQueries.ivfpqTop10(spark, d)),
        // deep-rerank twins: the recall-vs-depth curve (round 13) — a
        // cluster LARGER than the shortlist saturates 4-bit ADC codes
        // (near-ties rank ~randomly), so depth must cover the tie set
        "pq_r512"      -> (() => VectorQueries.pqTop10(spark, d, rerank = 512)),
        "ivfpq_r512"   -> (() => VectorQueries.ivfpqTop10(spark, d, rerank = 512)),
        // the other two cells of the 8-bit matrix: depth-512 twin, and
        // a 3-step-Lloyd (near-converged) codebook at depth 64 — does
        // training quality substitute for depth inside tight clusters?
        "pq8_r512"     -> (() => VectorQueries.pq8Top10(spark, d, rerank = 512)),
        "pq8_s3"       -> (() => VectorQueries.pq8Top10(spark, d, steps = 3)),
        "pq_r128"      -> (() => VectorQueries.pqTop10(spark, d, rerank = 128)),
        "pq_r256"      -> (() => VectorQueries.pqTop10(spark, d, rerank = 256)),
        "pq8_r128"     -> (() => VectorQueries.pq8Top10(spark, d, rerank = 128)),
        "pq8_r256"     -> (() => VectorQueries.pq8Top10(spark, d, rerank = 256)),
        // 8-bit RESIDUAL codebooks (per-cell k≤256, hash-order seeds):
        // the full IVFADC production shape — does the left-shift hold
        // when codes quantize residuals inside coarse cells?
        "ivfpq8_np2"   -> (() => VectorQueries.ivfpqTop10(spark, d, kCodes = 256)),
        "ivfpq_r128"   -> (() => VectorQueries.ivfpqTop10(spark, d, rerank = 128)),
        "ivfpq_r256"   -> (() => VectorQueries.ivfpqTop10(spark, d, rerank = 256)),
        "ivfpq8_r128"  -> (() => VectorQueries.ivfpqTop10(spark, d, rerank = 128, kCodes = 256)),
        "ivfpq8_r256"  -> (() => VectorQueries.ivfpqTop10(spark, d, rerank = 256, kCodes = 256)),
        "nsw_beam_t3"  -> (() => VectorQueries.graphTop10Raw(spark, d)))
      val labeled = graft.Tables.embeddings(spark, d)
        .select(col("vec_id"), col("label"))
        .crossJoin(broadcast(graft.Tables.embeddings(spark, d)
          .filter(col("vec_id") === 0).select(col("label").as("qlabel"))))
        .filter(col("label") === col("qlabel"))
        .select("vec_id").localCheckpoint()
      methods.foreach { case (name, f) =>
        val top = f().select("vec_id").localCheckpoint()
        val hits = top.join(exact, "vec_id").count()
        // in-cluster@10 separates CLUSTER RECOVERY (did the index land
        // in the right region?) from exact-rank resolution: in a tight
        // cluster every member is a near-tie, so a quantized path (PQ's
        // 4-bit codes) can recover the cluster perfectly yet reorder
        // the near-identical cosines below exact-set overlap.
        val inCluster = top.join(labeled, "vec_id").count()
        println(f"[annrecall] $name%-12s raw_hits@10 = $hits  in_cluster@10 = $inCluster")
      }
      // context row: how concentrated is the exact answer? On the
      // clustered set all 10 exact neighbors share the query's cluster.
      val sameLabel = exact
        .join(graft.Tables.embeddings(spark, d), "vec_id")
        .crossJoin(broadcast(graft.Tables.embeddings(spark, d)
          .filter(col("vec_id") === 0).select(col("label").as("qlabel"))))
        .filter(col("label") === col("qlabel")).count()
      println(s"[annrecall] exact-top10 in query's label/cluster: $sameLabel/10")
    }
    spark.stop()
  }
}
