package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.GraftGenSource

/**
 * The `graftgen` DataSource V2: filter pushdown narrows the GENERATED
 * range (not a post-scan filter), column pruning reaches row
 * generation, partition planning splits the range evenly, and the
 * produced table matches a driver-side recomputation exactly.
 */
class Dsv2SourceSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark

  private def gen(rows: Long, parts: Int) =
    spark.read.format("graftgen")
      .option("rows", rows.toString).option("parts", parts.toString).load()

  test("generated table matches the pure function of id") {
    val got = gen(1000, 3).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).sortBy(_._1)
    assert(got.length == 1000)
    got.foreach { case (id, v, c) =>
      assert(v == GraftGenSource.valOf(id))
      assert(c == GraftGenSource.catOf(id))
    }
    assert(got.map(_._1).toSeq == (0L until 1000L))
  }

  test("range predicates push into the source and narrow the scan") {
    val df = gen(100000, 8).filter(col("id") >= 20000L && col("id") < 80000L)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("range=[20000,80000)"),
      s"pushed range must reach the scan description:\n$plan")
    // the narrowed range is what gets partitioned: 8 slices of 60k ids
    assert(df.rdd.getNumPartitions == 8)
    assert(df.count() == 60000L)
  }

  test("column pruning reaches generation") {
    val df = gen(10000, 4).select("cat")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("cols=cat"),
      s"pruned schema must reach the scan description:\n$plan")
    assert(df.distinct().count() == 7)
  }

  test("partitions split the id range evenly and cover it exactly") {
    val df = gen(100001, 8) // non-divisible on purpose
    val sizes = df.groupBy(spark_partition_id().as("p")).count()
      .collect().map(_.getLong(1))
    assert(sizes.length == 8)
    assert(sizes.sum == 100001L)
    assert(sizes.max - sizes.min <= 1, s"uneven slices: ${sizes.toSeq}")
  }

  test("an empty pushed range plans zero partitions") {
    val df = gen(1000, 4).filter(col("id") >= 5000L)
    assert(df.count() == 0L)
  }
}
