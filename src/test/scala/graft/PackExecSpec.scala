package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PackOps

/**
 * The custom NextFitPack operator (LogicalPlan + Strategy + SparkPlan):
 * semantics on crafted edges, and the plan property that motivates the
 * operator form — its distribution/ordering CONTRACT is declared, so
 * Catalyst inserts the exchange+sort only when the child doesn't
 * already satisfy it.
 */
class PackExecSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark
  import spark.implicits._

  private def crafted = Seq(
    ("s1", 1L, 300L), ("s1", 2L, 300L), // 300+300 > 500 → packs 1, 2
    ("s1", 3L, 900L),                   // oversized → its own pack 3
    ("s1", 4L, 100L),                   // new pack 4 (fill 900 overflows)
    ("s2", 9L, 500L), ("s2", 10L, 1L)   // fresh group: pack 1; 501 > 500 → pack 2
  ).toDF("source", "doc_id", "n_tok")

  test("next-fit semantics: group reset, overflow, oversized row") {
    val got = PackOps.nextFitPack(crafted, "source", "doc_id", "n_tok", 500L)
      .select("source", "doc_id", "pack_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set(
      ("s1", 1L, 1L), ("s1", 2L, 2L), ("s1", 3L, 3L), ("s1", 4L, 4L),
      ("s2", 9L, 1L), ("s2", 10L, 2L)))
  }

  test("unsatisfied contract: EnsureRequirements plans the exchange and sort") {
    val plan = PackOps.nextFitPack(crafted, "source", "doc_id", "n_tok", 500L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("NextFitPack"), s"operator missing:\n$plan")
    assert(plan.contains("hashpartitioning(source"),
      s"expected a planner-inserted exchange on the group key:\n$plan")
    assert(plan.contains("Sort ["), s"expected a planner-inserted sort:\n$plan")
  }

  test("satisfied contract: pre-partitioned, pre-sorted input adds NO exchange or sort") {
    val ready = crafted.repartition(col("source"))
      .sortWithinPartitions("source", "doc_id")
    val plan = PackOps.nextFitPack(ready, "source", "doc_id", "n_tok", 500L)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).size
    val sorts = "Sort \\[".r.findAllIn(plan).size
    assert(exchanges === 1, s"only the explicit repartition may exchange:\n$plan")
    assert(sorts === 1, s"only the explicit sortWithinPartitions may sort:\n$plan")
    // and the result is still correct on the satisfied-contract path
    val got = PackOps.nextFitPack(ready, "source", "doc_id", "n_tok", 500L)
      .select("doc_id", "pack_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L), (9L, 1L), (10L, 2L)))
  }
}
