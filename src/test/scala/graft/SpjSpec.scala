package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Storage-partitioned join (q_spj_join): the graftpart scans report
 * KeyGroupedPartitioning, and v2 bucketing must be the LOAD-BEARING
 * switch — same join with it off shuffles both sides.
 */
class SpjSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark

  private def joinedIn(s2: org.apache.spark.sql.SparkSession) = {
    val a = s2.read.format("graftpart").option("rows", 700).load()
    val b = s2.read.format("graftpart").option("rows", 70)
      .option("salt", 70000).load()
      .select(col("id").as("id_b"), col("val").as("val_b"), col("cat"))
    a.join(b, "cat").groupBy("cat").agg(count(lit(1)).as("n")).orderBy("cat")
  }

  test("key-grouped scans join with zero exchange; without SPJ they shuffle") {
    val on = spark.newSession()
    on.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    on.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val off = spark.newSession()
    off.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
    off.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val planOn = joinedIn(on).queryExecution.executedPlan.toString
    val planOff = joinedIn(off).queryExecution.executedPlan.toString
    assert(!planOn.contains("Exchange hashpartitioning"),
      s"SPJ plan must have no shuffle exchange:\n$planOn")
    assert(planOff.contains("Exchange hashpartitioning"),
      s"without v2 bucketing the join must shuffle (else the test is vacuous):\n$planOff")
    // identical results either way
    val rOn = joinedIn(on).collect().map(_.toString).toSeq
    val rOff = joinedIn(off).collect().map(_.toString).toSeq
    assert(rOn === rOff)
    // and exact: n per cat = 100 * 10
    assert(rOn.length === 7)
    joinedIn(on).collect().foreach(r => assert(r.getLong(1) === 1000L))
  }
}
