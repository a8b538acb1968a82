package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions._

/** Pins the Hilbert-curve layout key (functions.hilbert_index8). */
class HilbertSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark
  import spark.implicits._

  /** Driver-side reference xy2d (flip-then-swap rot with sub-square s) —
    * the interpreted twin the codegen'd plan must reproduce. */
  private def refXy2d(xIn: Long, yIn: Long): Long = {
    var x = xIn & 255L; var y = yIn & 255L
    var d = 0L; var s = 128L
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  test("hilbert_index8: bijection over all 2^16 cells, every step unit-adjacent") {
    // the two properties that define a Hilbert curve (and that Z-order
    // fails: Morton has 2^15-ish non-adjacent jumps at order 8)
    val cells = spark.range(65536).select(
      (col("id") / 256).cast("long").as("x"), (col("id") % 256).as("y"))
    val d = cells
      .select(hilbert_index8(col("x"), col("y")).as("d"), col("x"), col("y"))
      .localCheckpoint()
    val stats = d.agg(countDistinct("d").as("ndv"),
      min("d").as("mn"), max("d").as("mx")).head()
    assert(stats.getLong(0) === 65536L && stats.getLong(1) === 0L &&
      stats.getLong(2) === 65535L, "must be a bijection onto [0, 65536)")
    val next = d.select((col("d") - 1).as("d"),
      col("x").as("x2"), col("y").as("y2"))
    val jumps = d.join(next, "d")
      .filter(abs(col("x") - col("x2")) + abs(col("y") - col("y2")) =!= 1)
      .count()
    assert(jumps === 0L, "consecutive d values must be adjacent cells")
  }

  test("hilbert_index8: codegen plan == driver-side reference walk") {
    val got = spark.range(1000)
      .select((col("id") * 37 % 256).as("x"), (col("id") * 101 % 256).as("y"))
      .select($"x", $"y", hilbert_index8($"x", $"y").as("d"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) === refXy2d(r.getLong(0), r.getLong(1)))
    }
  }

  test("hilbert buckets: tighter or equal total bbox area than z-order on the data") {
    // the locality claim the layout audit makes, measured on the actual
    // key distribution: 16-bucket split over each curve, summed
    // bounding-box area (the min-max skipping cost) must not be worse
    // under Hilbert
    val rows = Tables.lineitem(spark, GraftSpark.sf).select(
      col("l_partkey").bitwiseAND(lit(255L)).as("p8"),
      col("l_suppkey").bitwiseAND(lit(255L)).as("s8")).localCheckpoint()
    def totalArea(bucket: org.apache.spark.sql.Column): Long =
      rows.withColumn("b", bucket).groupBy("b")
        .agg(((max("p8") - min("p8") + 1) *
              (max("s8") - min("s8") + 1)).as("area"))
        .agg(sum("area")).head().getLong(0)
    val hilbert = totalArea(shiftright(hilbert_index8($"p8", $"s8"), 12))
    val zorder = totalArea(shiftright(
      (0 until 8).map { i =>
        shiftleft(shiftright($"p8", i).bitwiseAND(lit(1L)), 2 * i)
          .bitwiseOR(shiftleft(shiftright($"s8", i).bitwiseAND(lit(1L)), 2 * i + 1))
      }.reduce(_.bitwiseOR(_)), 12))
    assert(hilbert <= zorder,
      s"hilbert total bbox area $hilbert should be <= z-order $zorder")
  }
}
