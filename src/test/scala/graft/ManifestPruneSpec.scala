package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.WarehouseQueries

/**
 * q_manifest_prune: the contract row carries only the boolean pruning
 * verdict (exact file counts depend on the range sampler's boundaries);
 * this spec pins the TIGHT bound — a 3-month window over a ~6.5-year
 * span laid out in 8 range files must overlap at most 2 files — and
 * that the pruned scan equals the full-scan filter row-for-row.
 */
class ManifestPruneSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark
  private val sf = GraftSpark.sf

  test("manifest pruning scans <=2 of 8 range files and loses no rows") {
    val got = WarehouseQueries.queries("q_manifest_prune")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    // re-derive the manifest from the directory the query just wrote
    val manifest = spark.read.parquet(graft.GraftIO.root + "/manifest/data")
      .groupBy(col("_metadata.file_path").as("fp"))
      .agg(min(col("o_orderdate")).cast("date").cast("string").as("lo"),
        max(col("o_orderdate")).cast("date").cast("string").as("hi"))
      .collect()
    assert(manifest.length === 8, "expected 8 range files")
    // ISO date strings compare correctly lexicographically
    val overlapping = manifest.count { r =>
      r.getString(2) >= "1999-06-01" && r.getString(1) <= "1999-08-31"
    }
    assert(overlapping >= 1 && overlapping <= 2,
      s"window should overlap 1-2 of 8 range files, got $overlapping")
    // the pruned result equals the unpruned full-scan filter
    val full = Tables.orders(spark, sf)
      .filter(col("o_orderdate") >= lit("1999-06-01").cast("date") &&
        col("o_orderdate") <= lit("1999-08-31").cast("date"))
      .groupBy(month(col("o_orderdate")).as("m"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice").cast("decimal(30,12)")), 4)
          .cast("double").as("rev"))
      .orderBy("m").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === full.toSeq)
  }
}
