package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Bucketing = the pre-shuffle design for repeated fact⨝fact joins at
 * 100 TB: both sides written bucketed on the join key join with NO
 * exchange — the join runs bucket-by-bucket on co-located partitions.
 * (SURVEY.md §2e / the "co-locate joins via bucketing" scale note.)
 */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark
  import spark.implicits._

  /** Write the bucketed twins once for the whole suite. */
  private lazy val bucketedTablesReady: Unit = {
    Tables.lineitem(spark, GraftSpark.sf)
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    Tables.orders(spark, GraftSpark.sf)
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_bucketed")
  }

  test("bucketed tables join without any shuffle exchange") {
    bucketedTablesReady

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"), $"l_orderkey" === $"o_orderkey")
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))

      // the JOIN must not shuffle either side (the later groupBy on an
      // unrelated key legitimately exchanges)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey") &&
             !plan.contains("Exchange hashpartitioning(o_orderkey"),
        s"bucketed join should not shuffle its keys:\n$plan")
      assert(plan.contains("Bucketed: true"), s"expected bucketed scans:\n$plan")

      // and it computes the same thing as the plain join
      val expected = Tables.lineitem(spark, GraftSpark.sf)
        .join(Tables.orders(spark, GraftSpark.sf),
          $"l_orderkey" === $"o_orderkey")
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }

  test("bucket pruning: single-key filter reads one bucket") {
    bucketedTablesReady
    val prev = spark.conf.get("spark.sql.maxMetadataStringLength")
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    // keep the scan bucketed even though no join needs the distribution —
    // otherwise DisableUnnecessaryBucketedScan turns off bucket pruning
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      val df = spark.table("li_bucketed").filter($"l_orderkey" === 42L)
      // correctness of the pruned read
      val expected = Tables.lineitem(spark, GraftSpark.sf)
        .filter($"l_orderkey" === 42L).count()
      assert(df.count() === expected)
      val scan = df.queryExecution.executedPlan.toString
      assert(scan.contains("SelectedBucketsCount: 1 out of 8"),
        s"expected bucket pruning in scan:\n$scan")
    } finally {
      spark.conf.set("spark.sql.maxMetadataStringLength", prev)
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
    }
  }
}
