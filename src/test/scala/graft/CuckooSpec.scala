package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions._
import graft.sketches.{CuckooOps, CuckooTable}

/** Properties of the cuckoo filter (the deletable membership sketch). */
class CuckooSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark
  import spark.implicits._

  private val M = 1024 // buckets; 4096 slots

  private def classOf2(k: Long): (Int, Byte) = {
    // an item's (canonical bucket-pair id, fingerprint) — two keys in
    // the same class are indistinguishable to the filter
    val h = CuckooTable.itemHashLong(k)
    val fp = CuckooTable.fingerprint(h)
    val i1 = (h & (M - 1)).toInt
    val i2 = i1 ^ CuckooTable.altDelta(fp, M)
    (math.min(i1, i2), fp)
  }

  test("no false negatives, membership is partition-independent, no drops") {
    val keys = Tables.orders(spark, GraftSpark.sf)
      .filter($"o_orderpriority" === "1-URGENT").select("o_orderkey")
    def build(parts: Int): Array[Byte] = keys.repartition(parts)
      .agg(cuckoo_agg($"o_orderkey", M).as("sk")).head().getAs[Array[Byte]]("sk")
    val sk1 = build(1)
    val sk64 = build(64)
    assert(CuckooTable.deserialize(sk1).nDropped === 0L)
    assert(CuckooTable.deserialize(sk64).nDropped === 0L)
    for (sk <- Seq(sk1, sk64)) {
      val missing = keys
        .filter(!cuckoo_contains(lit(sk), $"o_orderkey")).count()
      assert(missing === 0L, "a cuckoo filter has NO false negatives")
    }
    // layouts may differ across partitionings; probe answers may not
    val mx = keys.agg(max("o_orderkey")).head().getLong(0)
    val probes = spark.range(mx + 1, mx + 2001).select($"id")
    val answers = Seq(sk1, sk64).map { sk =>
      probes.select(cuckoo_contains(lit(sk), $"id").as("c"))
        .collect().map(_.getBoolean(0)).toSeq
    }
    assert(answers(0) === answers(1),
      "membership must not depend on build partitioning")
  }

  test("false-positive rate stays near the 8/255 slot-collision bound") {
    val keys = Tables.orders(spark, GraftSpark.sf)
      .filter($"o_orderpriority" === "1-URGENT").select("o_orderkey")
    val sk = keys.agg(cuckoo_agg($"o_orderkey", M).as("sk"))
      .head().getAs[Array[Byte]]("sk")
    val mx = keys.agg(max("o_orderkey")).head().getLong(0)
    val fps = spark.range(mx + 1, mx + 2001)
      .filter(cuckoo_contains(lit(sk), $"id")).count()
    assert(fps <= 200, s"fpp way above the ~3% design point: $fps/2000")
  }

  test("deletion removes items; survivors are never harmed (exact class model)") {
    val all = (1L to 400L).toSeq
    val t = new CuckooTable(M)
    all.foreach(k => t.insert(CuckooTable.itemHashLong(k)))
    assert(t.nDropped === 0L)
    val deleted = all.take(200)
    val kept = all.drop(200)
    val sk2 = CuckooOps.deleteLongs(t.serialize(), deleted)
    val t2 = CuckooTable.deserialize(sk2)
    // guaranteed: every survivor still answers present — each class
    // keeps exactly one copy per remaining member
    kept.foreach { k =>
      assert(t2.contains(CuckooTable.itemHashLong(k)),
        s"survivor $k lost its entry")
    }
    // a deleted key still answers present IFF a survivor shares its
    // (bucket-pair, fp) class — predict exactly from the hash model
    val keptClasses = kept.map(classOf2).toSet
    deleted.foreach { k =>
      val expectPresent = keptClasses.contains(classOf2(k))
      assert(t2.contains(CuckooTable.itemHashLong(k)) === expectPresent,
        s"deleted key $k: expected present=$expectPresent")
    }
  }

  test("codegen probe == interpreted probe on every member") {
    val t = new CuckooTable(M)
    (1L to 300L).foreach(k => t.insert(CuckooTable.itemHashLong(k)))
    val sk = t.serialize()
    val viaPlan = spark.range(1, 601)
      .select($"id", cuckoo_contains(lit(sk), $"id").as("c"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    (1L to 600L).foreach { k =>
      assert(viaPlan(k) === t.contains(CuckooTable.itemHashLong(k)))
    }
  }

  test("cuckoo_agg rejects bad bucket counts at ANALYSIS time, not on executors") {
    import org.apache.spark.sql.graft.Shims
    val df = spark.range(10)
    // non-power-of-two, non-positive, null, non-numeric: all must fail
    // during analysis with a clean message — not as a mid-job executor
    // NPE/require after tasks have launched
    def agg(bad: org.apache.spark.sql.Column) = Shims.column(
      new graft.sketches.CuckooBuildAgg(
        Shims.expression($"id"), Shims.expression(bad)).toAggregateExpression())
    for (bad <- Seq(lit(1000), lit(0), lit(-4), lit(null), lit("x"))) {
      val ex = intercept[org.apache.spark.sql.AnalysisException] {
        df.agg(agg(bad)).queryExecution.analyzed
      }
      assert(ex.getMessage.toLowerCase.contains("cuckoo"),
        s"expected cuckoo_agg analysis error, got: ${ex.getMessage}")
    }
  }
}
