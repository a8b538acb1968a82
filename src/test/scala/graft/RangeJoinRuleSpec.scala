package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * RangeJoinBinningRule: the automatic point-in-interval → binned
 * equi-join rewrite (plans/RangeJoinBinningRule.scala).
 *
 * Contract under test:
 *  - OFF (binSize unset/0): plan keeps the nested-loop shape, results are
 *    the ground truth;
 *  - ON: identical rows, but the executed plan contains the injected
 *    Generate (interval replication) and an equi-join on the bin key —
 *    no BroadcastNestedLoopJoin;
 *  - guards: joins that already have an equi conjunct, non-inner joins,
 *    and single-sided bounds are left untouched;
 *  - descending intervals (lo > hi) match nothing and don't crash the
 *    `sequence` fan-out;
 *  - strict bounds keep strictness (boundary rows excluded).
 */
class RangeJoinRuleSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark
  import spark.implicits._

  private def points = (0 until 400).map(i => (i.toLong, i * 2.5)).toDF("pid", "x")
  private def ivals = (0 until 60).map { i =>
    (i.toLong, i * 17.0 - 5.0, i * 17.0 + 45.0)
  }.toDF("iid", "lo", "hi")

  private def withBin[A](w: Double)(f: => A): A = {
    spark.conf.set("spark.graft.rangeJoin.binSize", w.toString)
    try f finally spark.conf.unset("spark.graft.rangeJoin.binSize")
  }

  private def bandJoin = points.join(ivals, $"x" >= $"lo" && $"x" <= $"hi")
    .groupBy("iid").agg(count(lit(1)).as("n"), sum("pid").as("s"))
    .orderBy("iid")

  test("rewrite preserves every row of the nested-loop ground truth") {
    val expected = bandJoin.collect().toSeq
    val got = withBin(50.0)(bandJoin.collect().toSeq)
    assert(got == expected)
  }

  test("rewrite replaces BNLJ with Generate + bin equi-join") {
    withBin(50.0) {
      val plan = bandJoin.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"binned plan must not contain a nested-loop join:\n$plan")
      assert(plan.contains("Generate"),
        s"binned plan must replicate intervals via Generate:\n$plan")
      assert(plan.contains("graft_bin"),
        s"bin key must appear in the executed plan:\n$plan")
    }
  }

  test("off by default: nested-loop shape, no bin attributes") {
    val plan = bandJoin.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), s"expected BNLJ:\n$plan")
    assert(!plan.contains("graft_bin"))
  }

  test("guard: equi conjunct present → rule does not fire") {
    withBin(50.0) {
      val withKey = points.withColumn("k", $"pid" % 7)
      val ivalsK = ivals.withColumn("k", $"iid" % 7)
      val plan = withKey.join(ivalsK,
        Seq("k").map(c => withKey(c) === ivalsK(c))
          .reduce(_ && _) && $"x" >= $"lo" && $"x" <= $"hi")
        .queryExecution.executedPlan
      assert(!plan.toString.contains("graft_bin"))
    }
  }

  test("guard: one-sided inequality → rule does not fire") {
    withBin(50.0) {
      val plan = points.join(ivals, $"x" >= $"lo")
        .queryExecution.executedPlan
      assert(!plan.toString.contains("graft_bin"))
    }
  }

  test("descending interval (lo > hi) matches nothing, no crash") {
    withBin(10.0) {
      val bad = Seq((1L, 30.0, 10.0), (2L, 0.0, 25.0)).toDF("iid", "lo", "hi")
      val got = points.join(bad, $"x" >= $"lo" && $"x" <= $"hi")
        .groupBy("iid").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got == Map(2L -> 11L)) // x ∈ {0, 2.5, …, 25}
    }
  }

  test("strict bounds stay strict through the rewrite") {
    withBin(10.0) {
      val iv = Seq((1L, 0.0, 25.0)).toDF("iid", "lo", "hi")
      val strict = points.join(iv, $"x" > $"lo" && $"x" < $"hi").count()
      val incl = points.join(iv, $"x" >= $"lo" && $"x" <= $"hi").count()
      assert(strict == 9 && incl == 11) // drops x=0.0 and x=25.0
    }
  }

  test("q_range_join_auto leaves the caller's session untouched") {
    // the query scopes the rule + binSize conf to an isolated session
    // clone; after building AND executing it, the caller's session must
    // have neither, and a fresh band join must keep its nested-loop shape
    val before = spark.experimental.extraOptimizations
    val df = SparkEntry.queries("q_range_join_auto")(spark, GraftSpark.sf)
    assert(df.count() > 0)
    assert(spark.conf.getOption("spark.graft.rangeJoin.binSize").isEmpty,
      "binSize conf leaked into the caller's session")
    assert(spark.experimental.extraOptimizations
      .count(_.isInstanceOf[graft.plans.RangeJoinBinningRule]) ==
      before.count(_.isInstanceOf[graft.plans.RangeJoinBinningRule]),
      "RangeJoinBinningRule leaked into the caller's extraOptimizations")
    val plan = bandJoin.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") && !plan.contains("graft_bin"),
      s"caller-session band join inherited the rewrite:\n$plan")
  }

  test("pre-built session path: Graft.enableRangeBinning attaches the rule") {
    // simulate the driver's extension-less session by cloning: the clone
    // shares state but gets a fresh experimental-methods list
    val s2 = spark.newSession()
    Graft.enableRangeBinning(s2, 50.0)
    Graft.enableRangeBinning(s2, 50.0) // idempotent
    assert(s2.experimental.extraOptimizations
      .count(_.isInstanceOf[graft.plans.RangeJoinBinningRule]) == 1)
    s2.conf.unset("spark.graft.rangeJoin.binSize")
  }
}
