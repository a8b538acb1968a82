package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * The Bloom semi-join prefilter rule (graft.plans.BloomSemiPrefilterRule):
 * fires under its conf gate, injects a bloom_might_contain probe backed by
 * a scalar subquery, and — because Bloom filters have no false negatives —
 * never changes query results.
 */
class BloomPrefilterRuleSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark
  import spark.implicits._

  private def semiJoin() = {
    val li = Tables.lineitem(spark, GraftSpark.sf)
    val urgent = Tables.orders(spark, GraftSpark.sf)
      .filter($"o_orderpriority" === "1-URGENT").select("o_orderkey")
    li.join(urgent, $"l_orderkey" === $"o_orderkey", "left_semi")
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  }

  private def withPrefilter[T](enabled: Boolean)(body: => T): T = {
    spark.conf.set("spark.graft.bloomPrefilter.enabled", enabled.toString)
    // tiny testdata: force the size guards open so the rule can fire
    spark.conf.set("spark.graft.bloomPrefilter.maxBuildBytes", (1L << 40).toString)
    spark.conf.set("spark.graft.bloomPrefilter.minProbeRatio", "1")
    try body
    finally spark.conf.set("spark.graft.bloomPrefilter.enabled", "false")
  }

  test("rule rewrites the plan: bloom probe appears, gated by conf") {
    val without = semiJoin().queryExecution.optimizedPlan.toString
    assert(!without.contains("bloom_might_contain"))
    withPrefilter(enabled = true) {
      val plan = semiJoin().queryExecution.optimizedPlan.toString
      assert(plan.contains("bloom_might_contain"),
        s"expected bloom probe in optimized plan:\n$plan")
      assert(plan.contains("scalar-subquery"),
        "bloom build should run as a scalar subquery")
    }
  }

  test("rewrite is semantics-preserving (no false negatives)") {
    val expected = semiJoin().collect().toSeq
    val got = withPrefilter(enabled = true) { semiJoin().collect().toSeq }
    assert(got === expected)
  }

  test("rule is idempotent: exactly one probe per join key") {
    withPrefilter(enabled = true) {
      val plan = semiJoin().queryExecution.optimizedPlan.toString
      val n = "bloom_might_contain".r.findAllIn(plan).length
      assert(n === 1, s"expected exactly 1 probe, found $n:\n$plan")
    }
  }
}
