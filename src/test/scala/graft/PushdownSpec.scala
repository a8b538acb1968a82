package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Scan efficiency contracts (SURVEY.md §4): predicates must reach the
 * parquet reader (row-group skipping via min/max stats) and the read
 * schema must shrink to the referenced columns. At 100 TB these two
 * properties are the difference between scanning terabytes and
 * scanning gigabytes — so they are pinned here, not assumed.
 */
class PushdownSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark
  import spark.implicits._

  private def scanOf(df: org.apache.spark.sql.DataFrame): FileSourceScanExec =
    df.queryExecution.executedPlan.collectFirst {
      case f: FileSourceScanExec => f
    }.getOrElse(fail("no FileSourceScanExec in plan"))

  test("filter predicate is pushed to the parquet scan") {
    val df = Tables.lineitem(spark, GraftSpark.sf)
      .filter($"l_quantity" > 45.0)
      .select("l_orderkey")
    val pushed = scanOf(df).metadata("PushedFilters")
    assert(pushed.contains("GreaterThan(l_quantity"),
      s"expected l_quantity predicate in PushedFilters: $pushed")
  }

  test("column pruning: scan reads only referenced columns") {
    val df = Tables.lineitem(spark, GraftSpark.sf)
      .filter($"l_quantity" > 45.0)
      .select("l_orderkey")
    val read = scanOf(df).requiredSchema.fieldNames.toSet
    assert(read === Set("l_orderkey", "l_quantity"),
      s"expected 2-column read schema, got $read")
  }

  test("aggregate pushdown shape: partial agg before the exchange") {
    // map-side combine: the plan must contain a partial HashAggregate
    // below the shuffle so each executor pre-reduces its partitions
    val df = Tables.lineitem(spark, GraftSpark.sf)
      .groupBy("l_returnflag").agg(sum("l_quantity").as("q"))
    val plan = df.queryExecution.executedPlan.toString
    val firstPartial = plan.indexOf("partial_sum")
    val firstExchange = plan.indexOf("Exchange")
    assert(firstPartial >= 0, s"no partial aggregation in plan:\n$plan")
    // plan strings print top-down: the final agg and exchange appear
    // before (above) the partial agg feeding them
    assert(firstExchange >= 0 && firstExchange < firstPartial,
      s"expected Exchange above partial agg (partial runs map-side):\n$plan")
  }
}
