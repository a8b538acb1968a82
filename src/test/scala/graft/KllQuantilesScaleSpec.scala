package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** q_kll_quantiles' exact-quartile yardstick went two-level in round 13
  * (VERDICT r12 "What's wrong" #3): `percentile` buffered O(group
  * values) per group — the last plan that would not run at 100 TB. The
  * two-level form (bounded 1024-bin histogram → rank inside the ≤6
  * target buckets) must (a) reproduce percentile/quantile_cont's
  * interpolated values exactly, (b) keep every window in the executed
  * plan partitioned, and (c) short-circuit the all-equal-values group
  * (whose histogram would otherwise funnel the whole group into bucket
  * 0's one-task rank). Driven through the real contract query over a
  * generated parquet dir — the TokenBudgetDegenerateSpec pattern. */
class KllQuantilesScaleSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark

  test("two-level quartiles: exact interpolation, degenerate group short-circuits, windows partitioned") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_kll_scale").toString
    // group A: 1000 varied prices (interpolation lands BETWEEN order
    // statistics at p25/p75: n−1 = 999 → pos 249.75/749.25); group B:
    // every value identical (the degenerate short-circuit); group C:
    // n = 1 (pos = 0, k_hi clamps to n)
    val rows =
      (1 to 1000).map(i => ("A", 100.0 + (i * 7919 % 1000) * 0.25)) ++
      (1 to 50).map(_ => ("B", 42.5)) ++
      Seq(("C", 7.0))
    rows.toDF("l_returnflag", "l_extendedprice")
      .repartition(4).write.parquet(s"$dir/lineitem.parquet")

    val df = graft.queries.SourceQueries.queries("q_kll_quantiles")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    "windowspecdefinition\\(([^,)]+)".r.findAllMatchIn(plan).foreach { m =>
      assert(!m.group(1).contains(" ASC") && !m.group(1).contains(" DESC"),
        s"partition-less window in the quartile plan:\n$plan")
    }
    val got = df.collect().map(r => r.getString(0) ->
      ((r.getDouble(1), r.getDouble(2), r.getDouble(3)), r.getBoolean(4))).toMap

    // driver-side reference: percentile/quantile_cont interpolation
    def quantile(vs: Seq[Double], p: Double): Double = {
      val sorted = vs.sorted
      val pos = p * (sorted.size - 1)
      val lo = math.floor(pos).toInt
      val hi = math.min(lo + 1, sorted.size - 1)
      val q = sorted(lo) + (pos - lo) * (sorted(hi) - sorted(lo))
      java.math.BigDecimal.valueOf(q)
        .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue
    }
    for ((g, vs) <- rows.groupBy(_._1).view.mapValues(_.map(_._2))) {
      val (qs, rankOk) = got(g)
      assert(qs === ((quantile(vs, 0.25), quantile(vs, 0.5), quantile(vs, 0.75))),
        s"group $g quartiles diverge from the exact interpolation")
      assert(rankOk, s"group $g kll rank band must hold")
    }
  }
}
