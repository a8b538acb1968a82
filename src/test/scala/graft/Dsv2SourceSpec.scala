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

  // ---- graftmem: the WRITE half of the connector surface ----

  test("graftmem roundtrips a write and slices the read into partitions") {
    val df = spark.range(100).select(col("id"),
      (col("id") * 2).cast("double").as("v"),
      concat(lit("s"), (col("id") % 3).cast("string")).as("tag"))
    df.write.format("graftmem").option("table", "spec_rt").mode("overwrite").save()
    val back = spark.read.format("graftmem")
      .option("table", "spec_rt").option("parts", 4).load()
    assert(back.count() == 100)
    assert(back.agg(sum("v")).collect()(0).getDouble(0) == (0 until 100).map(_ * 2.0).sum)
    val parts = back.groupBy(spark_partition_id()).count().collect()
    assert(parts.length == 4, s"expected 4 read slices, got ${parts.length}")
  }

  test("graftmem overwrite is an atomic replace — readers never see a blend") {
    spark.range(50).select(col("id"), lit(1.0).as("v"), lit("a").as("tag"))
      .write.format("graftmem").option("table", "spec_ow").mode("overwrite").save()
    spark.range(7).select(col("id"), lit(2.0).as("v"), lit("b").as("tag"))
      .write.format("graftmem").option("table", "spec_ow").mode("overwrite").save()
    val rows = spark.read.format("graftmem").option("table", "spec_ow").load()
      .select("tag").distinct().collect().map(_.getString(0))
    assert(rows.toSeq == Seq("b"))
    assert(spark.read.format("graftmem").option("table", "spec_ow").load()
      .count() == 7)
  }

  test("graftmem append mode accumulates instead of replacing") {
    spark.range(5).select(col("id"), lit(1.0).as("v"), lit("x").as("tag"))
      .write.format("graftmem").option("table", "spec_ap").mode("overwrite").save()
    // post-commit, writes resolve BY NAME against the committed schema
    // (ACCEPT_ANY_SCHEMA applies only to the adopting first write), so
    // computed columns need their committed alias
    spark.range(3).select((col("id") + 100).as("id"), lit(2.0).as("v"),
        lit("y").as("tag"))
      .write.format("graftmem").option("table", "spec_ap").mode("append").save()
    val back = spark.read.format("graftmem").option("table", "spec_ap").load()
    assert(back.count() == 8)
    assert(back.filter(col("tag") === "x").count() == 5)
    assert(back.filter(col("tag") === "y").count() == 3)
  }

  test("graftmem failed job leaves the previous snapshot intact") {
    spark.range(10).select(col("id"), lit(1.0).as("v"), lit("keep").as("tag"))
      .write.format("graftmem").option("table", "spec_ab").mode("overwrite").save()
    // a write whose tasks throw (ANSI division by zero): job fails ->
    // commit() never runs -> the previous snapshot stays installed
    val bad = spark.range(10).select(col("id"),
      (lit(1.0) / (col("id") - col("id"))).as("v"),
      lit("bad").as("tag"))
    intercept[Exception] {
      bad.write.format("graftmem").option("table", "spec_ab").mode("overwrite").save()
    }
    val tags = spark.read.format("graftmem").option("table", "spec_ab").load()
      .select("tag").distinct().collect().map(_.getString(0))
    assert(tags.toSeq == Seq("keep"), "failed job must not replace the snapshot")
  }

  test("graftmem concurrent appends both land (CAS commit, no lost update)") {
    spark.range(0).select(col("id"), lit(0.0).as("v"), lit("z").as("tag"))
      .write.format("graftmem").option("table", "spec_cc").mode("overwrite").save()
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    // two append JOBS racing on the same table: a get-then-put commit
    // loses one of them; the compare-and-swap loop must keep both
    val jobs = (1 to 2).map { i =>
      Future {
        spark.range(100).select((col("id") + i * 1000).as("id"),
            lit(i.toDouble).as("v"), lit(s"t$i").as("tag"))
          .write.format("graftmem").option("table", "spec_cc")
          .mode("append").save()
      }
    }
    jobs.foreach(Await.result(_, 2.minutes))
    val back = spark.read.format("graftmem").option("table", "spec_cc").load()
    assert(back.count() == 200, "a concurrent append was lost")
    assert(back.filter(col("tag") === "t1").count() == 100)
    assert(back.filter(col("tag") === "t2").count() == 100)
  }

  test("graftgen aggregate pushdown: complete, composes with filters, exact") {
    def gen = spark.read.format("graftgen")
      .option("rows", 100000).option("parts", 8).load()
      .filter(col("id") >= 250L && col("id") < 99750L)
    val pushed = gen.groupBy("cat")
      .agg(count(lit(1)).as("n"), min("id").as("min_id"), max("id").as("max_id"))
      .orderBy("cat")
    val plan = pushed.queryExecution.executedPlan.toString
    assert(plan.contains("aggPushed=complete"),
      "COUNT/MIN/MAX GROUP BY cat must push completely into the source")
    assert(!plan.contains("HashAggregate"),
      "complete pushdown must leave NO Spark-side aggregate")
    assert(plan.contains("range=[250,99750)"),
      "filter pushdown must tighten the range BEFORE the aggregation")
    // fallback twin: min(abs(id)) is not a bare column (and, unlike
    // id + 0, is not constant-folded back into one), so the
    // all-or-nothing contract rejects the whole aggregation and the
    // row-generating scan computes it; abs is the identity on this
    // non-negative domain — results must agree exactly
    val fallback = gen.groupBy("cat")
      .agg(count(lit(1)).as("n"), min(abs(col("id"))).as("min_id"),
        max(abs(col("id"))).as("max_id"))
      .orderBy("cat")
    assert(!fallback.queryExecution.executedPlan.toString
      .contains("aggPushed=complete"))
    assert(pushed.collect().toSeq === fallback.collect().toSeq,
      "pushed arithmetic must equal the generated-row aggregation")
  }

  test("graftgen aggregate pushdown: unsupported agg falls back all-or-nothing") {
    // sum(val) is not pushable, so count/min/max must NOT partially push
    val df = spark.read.format("graftgen")
      .option("rows", 1000).option("parts", 2).load()
      .groupBy("cat").agg(count(lit(1)).as("n"), sum("val").as("s"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("GraftGenAggScan"))
    assert(plan.contains("HashAggregate"))
    assert(df.count() === 7)
  }

  test("graftmem SQL catalog: DELETE pushes into the connector, exact rows") {
    spark.conf.set("spark.sql.catalog.gm_spec", "graft.sources.GraftMemCatalog")
    spark.range(100).select(col("id"), (col("id") % 10).cast("double").as("v"),
        concat(lit("t"), (col("id") % 3).cast("string")).as("tag"))
      .write.format("graftmem").option("table", "spec_del")
      .mode("overwrite").save()
    spark.sql("DELETE FROM gm_spec.spec_del WHERE tag = 't0' AND v < 5.0")
    val back = spark.sql("SELECT * FROM gm_spec.spec_del")
    // deleted: id % 3 == 0 && id % 10 < 5  → survivors exactly mirror
    val expected = (0L until 100L)
      .filterNot(id => id % 3 == 0 && (id % 10).toDouble < 5.0)
    assert(back.count() === expected.size.toLong)
    assert(back.select("id").collect().map(_.getLong(0)).sorted.toSeq
      === expected)
  }

  test("graftmem DELETE: untranslatable predicate takes the row-level path, exactly") {
    spark.conf.set("spark.sql.catalog.gm_spec", "graft.sources.GraftMemCatalog")
    spark.range(10).select(col("id"), col("id").cast("double").as("v"),
        lit("x").as("tag"))
      .write.format("graftmem").option("table", "spec_del2")
      .mode("overwrite").save()
    // v * 2 > 5 is not v1-Filter-translatable, so the metadata-only
    // fast path refuses it — but with SupportsRowLevelOperations the
    // command now flows through the group-based ReplaceData rewrite,
    // where SPARK evaluates the full expression: the delete must be
    // EXACT (rows 0..2 survive: 0,2,4 ≤ 5), never an error and never
    // a half-delete
    spark.sql("DELETE FROM gm_spec.spec_del2 WHERE v * 2 > 5.0")
    val back = spark.sql("SELECT id FROM gm_spec.spec_del2")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(back === Seq(0L, 1L, 2L),
      s"row-level delete must apply the exact expression semantics: $back")
  }

  test("graftmem DELETE WHERE a != k keeps NULL rows (three-valued Not)") {
    spark.conf.set("spark.sql.catalog.gm_spec", "graft.sources.GraftMemCatalog")
    // a: 0,1,2 then NULL for ids 3..9
    spark.range(10).select(
        when(col("id") < 3, col("id")).as("a"), col("id").as("id"))
      .write.format("graftmem").option("table", "spec_3vl")
      .mode("overwrite").save()
    spark.sql("DELETE FROM gm_spec.spec_3vl WHERE a != 1")
    // ANSI: NULL != 1 is UNKNOWN → those rows must survive; only the
    // definite-true rows (a=0, a=2) are deleted
    val back = spark.sql("SELECT * FROM gm_spec.spec_3vl")
    assert(back.count() === 8L,
      "NULL rows must be kept under DELETE WHERE a != 1")
    assert(back.where("a = 1").count() === 1L)
    assert(back.where("a IS NULL").count() === 7L)
  }

  test("graftmem DELETE refuses an IN list containing NULL (pushdown honesty)") {
    spark.conf.set("spark.sql.catalog.gm_spec", "graft.sources.GraftMemCatalog")
    spark.range(6).select(col("id"),
        concat(lit("t"), (col("id") % 3).cast("string")).as("tag"))
      .write.format("graftmem").option("table", "spec_innull")
      .mode("overwrite").save()
    // tag IN ('t0', NULL) is never definitely-false for non-matching
    // rows; our cmp() can't represent that, so canDeleteWhere must
    // refuse and Spark must error rather than half-delete
    try {
      spark.sql(
        "DELETE FROM gm_spec.spec_innull WHERE tag IN ('t0', CAST(NULL AS STRING))")
      // if Spark simplified the NULL away pre-pushdown, the delete is
      // exact anyway; either way no NULL-polluted IN reached cmp()
    } catch { case _: Exception => () }
    val n = spark.sql("SELECT count(*) FROM gm_spec.spec_innull").head().getLong(0)
    assert(n === 6L || n === 4L,
      s"expected either a refused delete (6) or an exact t0 delete (4), got $n")
  }

  test("graftmem row-level UPDATE rewrites exactly and atomically") {
    spark.conf.set("spark.sql.catalog.gm_spec", "graft.sources.GraftMemCatalog")
    spark.range(10).select(col("id"), (col("id") * 10).cast("double").as("v"),
        concat(lit("t"), (col("id") % 2).cast("string")).as("tag"))
      .write.format("graftmem").option("table", "spec_upd")
      .mode("overwrite").save()
    spark.sql("UPDATE gm_spec.spec_upd SET v = v + 0.5 WHERE tag = 't0'")
    val got = spark.sql("SELECT id, v FROM gm_spec.spec_upd")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    (0L until 10L).foreach { id =>
      val exp = if (id % 2 == 0) id * 10 + 0.5 else id * 10.0
      assert(got(id) === exp, s"id $id: ${got(id)} != $exp")
    }
  }

  test("graftmem MERGE INTO applies update+insert+delete clauses in one command") {
    spark.conf.set("spark.sql.catalog.gm_spec", "graft.sources.GraftMemCatalog")
    spark.range(6).select(col("id"), (col("id") * 1.0).as("v"))
      .write.format("graftmem").option("table", "spec_merge")
      .mode("overwrite").save()
    spark.range(4, 9).select(col("id"), (col("id") * 100.0).as("v"))
      .createOrReplaceTempView("merge_src")
    spark.sql(
      """MERGE INTO gm_spec.spec_merge t USING merge_src s ON t.id = s.id
        |WHEN MATCHED AND t.id = 5 THEN DELETE
        |WHEN MATCHED THEN UPDATE SET v = s.v
        |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)""".stripMargin)
    val got = spark.sql("SELECT id, v FROM gm_spec.spec_merge")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // 0..3 untouched; 4 updated to 400; 5 deleted; 6..8 inserted
    val exp = (0L to 3L).map(i => i -> i * 1.0).toMap ++
      Map(4L -> 400.0) ++ (6L to 8L).map(i => i -> i * 100.0).toMap
    assert(got === exp, s"merge result $got != $exp")
  }

  test("graftmem rejects a type-divergent append instead of re-labelling old rows") {
    spark.range(5).select(col("id"), lit(1.0).as("v"), lit("x").as("tag"))
      .write.format("graftmem").option("table", "spec_ts").mode("overwrite").save()
    // same arity, different positional type (string where double was
    // committed): accepting it would make every OLD row mis-decode on
    // the next read, so the commit must throw and keep the snapshot
    val ex = intercept[Exception] {
      spark.range(3).select(col("id"), lit("oops").as("v"), lit("y").as("tag"))
        .write.format("graftmem").option("table", "spec_ts").mode("append").save()
    }
    assert(ex.getMessage != null)
    val back = spark.read.format("graftmem").option("table", "spec_ts").load()
    assert(back.count() == 5, "rejected append must leave the snapshot unchanged")
  }
}
