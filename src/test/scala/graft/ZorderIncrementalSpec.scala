package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Incremental Z-order maintenance (q_zorder_incremental): the
 * bounded-rewrite property and the merge audit flags.
 */
class ZorderIncrementalSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark
  private val sf = GraftSpark.sf

  test("a p8-local delta can only land in the 4 z-buckets with p-bits 6,7 = 0") {
    // structural bound behind rewrite_bounded: bucket = z-bits 12..15 =
    // (p6, s6, p7, s7); p8 < 16 forces p6 = p7 = 0 → bucket ∈ {0,2,8,10}
    val z = (p: Long, s: Long) => (0 until 8).map(i =>
      (((p >> i) & 1L) << (2 * i)) | (((s >> i) & 1L) << (2 * i + 1))).reduce(_ | _)
    val buckets = for (p <- 0L until 16L; s <- 0L until 256L) yield z(p, s) >> 12
    assert(buckets.toSet == Set(0L, 2L, 8L, 10L))
  }

  test("merge audit: files of untouched buckets preserved, rows preserved, rewrite bounded") {
    val r = SparkEntry.queries("q_zorder_incremental")(spark, sf).head()
    val (total, delta, rewritten) = (r.getLong(0), r.getLong(1), r.getLong(4))
    info(s"total=$total delta=$delta rewritten=$rewritten " +
      s"buckets=${r.getLong(2)} touched=${r.getLong(3)}")
    assert(r.getBoolean(5), "rewrite_bounded must hold")
    assert(r.getBoolean(6), "untouched bucket files must be byte-identical")
    assert(r.getBoolean(7), "row content must be preserved")
    assert(delta > 0 && rewritten < total,
      "the delta must be nonempty and the rewrite strictly partial")
  }

  test("the merged table answers queries identically to the logical union") {
    // post-merge table == base ∪ delta (same multiset of (orderkey, p8, s8))
    val after = spark.read.parquet(graft.GraftIO.root + "/zorder_incr")
      .groupBy("l_orderkey").agg(count(lit(1)).as("n"),
        sum("p8").as("sp"), sum("s8").as("ss"))
    val expected = Tables.lineitem(spark, sf).select(
        col("l_orderkey"),
        col("l_partkey").bitwiseAND(lit(255L)).as("p8"),
        col("l_suppkey").bitwiseAND(lit(255L)).as("s8"))
      .groupBy("l_orderkey").agg(count(lit(1)).as("n"),
        sum("p8").as("sp"), sum("s8").as("ss"))
    assert(after.exceptAll(expected).isEmpty && expected.exceptAll(after).isEmpty,
      "merged table diverges from the logical union")
  }
}
