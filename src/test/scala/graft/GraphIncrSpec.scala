package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.VectorQueries

/** Incremental kNN-graph maintenance (VERDICT r9 #5): folding a delta
  * batch into the base-built graph must reproduce the full rebuild
  * EDGE-FOR-EDGE under the frozen hash width — the differential proof
  * that (a) untouched nodes' out-edges survive verbatim and (b) the
  * bounded merge (base top-4 ∪ delta collisions, never a base
  * re-enumeration) is exact: new candidates only push old ones down,
  * so a base candidate outside the base top-4 can never enter the
  * rebuild top-4. */
class GraphIncrSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark
  private val sf = GraftSpark.sf

  test("incremental fold == full rebuild, edge for edge") {
    val row = SparkEntry.queries("q_graph_incremental")(spark, sf)
      .collect()(0)
    assert(row.getAs[Long]("n_delta") > 0L, "delta batch is empty — vacuous")
    assert(row.getAs[Long]("n_base") > row.getAs[Long]("n_delta"))
    assert(row.getAs[Long]("edge_diff") === 0L)
    assert(row.getAs[Boolean]("incr_equals_rebuild"))
    assert(row.getAs[Long]("fold_overflow_buckets") === 0L,
      "organic delta collisions must not overflow the LshCap")
  }

  test("fold parts: touched set is delta-driven, fold lineage excludes the base build") {
    val (_, edgesIncr, nBase, nDelta, nTouched, _, foldOverflow) =
      VectorQueries.graphIncremental(spark, sf)
    assert(nDelta > 0L && nTouched > 0L)
    assert(foldOverflow === 0L)
    // every touched node shares a bucket with a delta vector; the fold
    // only ever recomputes touched ∪ delta, so its work is bounded by
    // the delta's collision fan-out, not the base size
    assert(nTouched <= nBase)
    // the incremental edge set is symmetric (NSW wants both directions)
    val asym = edgesIncr.as("e1").join(edgesIncr.as("e2"),
        org.apache.spark.sql.functions.col("e1.src") ===
          org.apache.spark.sql.functions.col("e2.dst") &&
        org.apache.spark.sql.functions.col("e1.dst") ===
          org.apache.spark.sql.functions.col("e2.src"), "left_anti")
      .count()
    assert(asym === 0L, "incremental edges lost symmetry")
  }
}
