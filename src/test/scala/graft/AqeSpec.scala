package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Adaptive Query Execution (SURVEY.md §4): the runtime re-planning a
 * 100 TB job depends on — static stats are wrong at scale, so the
 * engine must coalesce undersized shuffle partitions, switch join
 * strategies once true sizes are known, and split skewed partitions.
 * Each test materializes the query, then asserts on the FINAL adaptive
 * plan (query-stage wrappers hide the nodes from `collect`, so the
 * assertions read the rendered plan).
 */
class AqeSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark
  import spark.implicits._

  /** Run with temporary runtime confs, restoring previous values. */
  private def withConf[T](kv: (String, String)*)(body: => T): T = {
    val prior = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  /** Materialize, then render the final adaptive physical plan. */
  private def finalPlanString(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("AQE coalesces undersized shuffle partitions at runtime") {
    // 32 static shuffle partitions over a few KB of data → coalesced read
    val plan = finalPlanString(
      Tables.nation(spark, GraftSpark.sf).groupBy("n_regionkey")
        .agg(count(lit(1)).as("n")))
    assert(plan.contains("AQEShuffleRead coalesced"),
      s"expected coalesced AQEShuffleRead in final plan:\n$plan")
  }

  test("AQE switches sort-merge join to broadcast once runtime size is known") {
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // static planner: SMJ
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "10485760") {
      val df = Tables.orders(spark, GraftSpark.sf)
        .join(Tables.customer(spark, GraftSpark.sf),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      assert(!df.queryExecution.sparkPlan.exists(_.isInstanceOf[BroadcastHashJoinExec]),
        "precondition: static plan must not broadcast")
      val plan = finalPlanString(df)
      assert(plan.contains("BroadcastHashJoin"),
        s"expected AQE to convert SMJ -> broadcast at runtime:\n$plan")
    }
  }

  test("AQE splits skewed join partitions") {
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.shuffle.partitions" -> "4",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB") {
      // one hot key carrying ~90% of rows on both sides; the downstream
      // agg is GLOBAL (no partitioning requirement), so OptimizeSkewedJoin
      // is free to split the hot partition — a keyed agg right after the
      // join would veto the split to preserve co-partitioning
      val left = spark.range(200000)
        .select(when($"id" % 10 === 0, $"id" % 1000).otherwise(lit(7L)).as("k"),
          $"id".as("v"))
      val right = spark.range(20000)
        .select(when($"id" % 10 === 0, $"id" % 1000).otherwise(lit(7L)).as("k"),
          $"id".as("w"))
      val joined = left.join(right, "k").agg(count(lit(1)).as("n"))
      val plan = finalPlanString(joined)
      assert(plan.contains("skewed") || plan.contains("skew=true"),
        s"expected skew-split in final plan:\n$plan")
    }
  }
}
