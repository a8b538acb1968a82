package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.RelationalQueries

/**
 * Injected bloom runtime filter (q_runtime_filter): plan-shape and
 * result-invariance twins for the contract query's oracle-pinned
 * `bloom_injected` flag. The optimizer must (a) actually inject —
 * bloom_filter_agg over the filtered creation side, might_contain on
 * the application side, and the filter must sit BELOW the join (on the
 * lineitem leg, not above it); and (b) never change results — the
 * bloom filter is one-sided (no false negatives), so filter-on and
 * filter-off plans must agree row for row.
 */
class RuntimeFilterSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark
  private val sf = GraftSpark.sf

  private def joined(bloom: Boolean) = {
    val clone = spark.newSession()
    clone.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled",
      bloom.toString)
    clone.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "0")
    clone.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "512MB")
    clone.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    clone.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    val ord = Tables.orders(clone, sf)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey", "o_orderpriority")
    Tables.lineitem(clone, sf)
      .select("l_orderkey", "l_quantity", "l_linenumber")
      .join(ord, col("l_orderkey") === col("o_orderkey"))
  }

  test("bloom filter is injected below the join on the application side") {
    val opt = joined(bloom = true).queryExecution.optimizedPlan.toString
    assert(opt.contains("bloom_filter_agg"), "creation-side agg missing")
    assert(opt.contains("might_contain"), "application-side probe missing")
    // the probe must be on the lineitem leg: the Filter carrying
    // might_contain references l_orderkey, not o_orderkey
    val probeLine = opt.linesIterator
      .find(l => l.contains("might_contain")).get
    assert(probeLine.contains("l_orderkey"),
      s"probe not on the fact side: $probeLine")
    // and with the feature off, neither shows up
    val off = joined(bloom = false).queryExecution.optimizedPlan.toString
    assert(!off.contains("might_contain") && !off.contains("bloom_filter_agg"))
  }

  test("runtime filter never changes results (no false negatives)") {
    val on = joined(bloom = true)
      .orderBy("l_orderkey", "l_linenumber", "l_quantity").collect()
    val off = joined(bloom = false)
      .orderBy("l_orderkey", "l_linenumber", "l_quantity").collect()
    assert(on.length == off.length && on.sameElements(off))
    assert(on.nonEmpty, "gate vacuous: no urgent-priority lineitems")
  }

  test("contract query reports bloom_injected = true") {
    val rows = RelationalQueries.queries("q_runtime_filter")(spark, sf)
      .collect()
    assert(rows.length == 1 && rows.head.getAs[Boolean]("bloom_injected"))
  }
}
