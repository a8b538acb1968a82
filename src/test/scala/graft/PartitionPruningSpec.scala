package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Hive-style partitioned writes + partition pruning (SURVEY.md §2a scale
 * path): at 100 TB the events table would be laid out
 * `events/event_type=click/date=.../part-*.parquet`, and a filter on the
 * partition column must prune directories at PLANNING time — zero I/O for
 * the other partitions — not scan-then-filter.
 */
class PartitionPruningSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark
  import spark.implicits._

  private lazy val partDir: String = {
    val dir = Files.createTempDirectory("graft_part_events").toString
    Tables.events(spark, GraftSpark.sf)
      .write.partitionBy("event_type").mode("overwrite").parquet(dir)
    dir
  }

  /** dim must be parquet-backed: a LocalRelation dim gets constant-folded
   *  (ConvertToLocalRelation eats the Filter) and DPP sees no selective
   *  predicate. */
  private lazy val dimDir: String = {
    val dir = Files.createTempDirectory("graft_part_dim").toString
    Seq(("click", 1), ("purchase", 2), ("view", 2), ("signup", 2), ("error", 2))
      .toDF("et", "grp").write.mode("overwrite").parquet(dir)
    dir
  }

  test("filter on partition column prunes directories at planning time") {
    val df = spark.read.parquet(partDir).filter($"event_type" === "click")

    val scan = df.queryExecution.executedPlan.collectFirst {
      case f: FileSourceScanExec => f
    }.getOrElse(fail("no FileSourceScanExec in plan"))

    // the predicate lands in partitionFilters (planning-time) …
    assert(scan.partitionFilters.exists(_.toString.contains("event_type")),
      s"expected event_type in partitionFilters: ${scan.partitionFilters}")
    // … and exactly ONE of the five event_type directories is read
    assert(scan.selectedPartitions.partitionCount === 1,
      s"expected 1 selected partition, got ${scan.selectedPartitions.partitionCount}")

    val expected = Tables.events(spark, GraftSpark.sf)
      .filter($"event_type" === "click").count()
    assert(df.count() === expected)
  }

  test("write sizing: repartition and maxRecordsPerFile bound output file counts") {
    // the two knobs that prevent the small-files problem (too many tiny
    // files kill the next job's scan planning) and its inverse (one giant
    // file kills read parallelism) at 100 TB
    val ev = Tables.events(spark, GraftSpark.sf)
    val n = ev.count()

    val few = Files.createTempDirectory("graft_write_few").toString
    ev.repartition(4).write.mode("overwrite").parquet(few)
    val fewFiles = new java.io.File(few).listFiles
      .count(f => f.getName.endsWith(".parquet"))
    assert(fewFiles === 4, s"repartition(4) must yield 4 files, got $fewFiles")

    val capped = Files.createTempDirectory("graft_write_capped").toString
    ev.coalesce(1).write.mode("overwrite")
      .option("maxRecordsPerFile", (n / 4).toString)
      .parquet(capped)
    val cappedFiles = new java.io.File(capped).listFiles
      .count(f => f.getName.endsWith(".parquet"))
    assert(cappedFiles >= 4,
      s"maxRecordsPerFile=${n / 4} over $n rows must split into >=4 files, got $cappedFiles")
    assert(spark.read.parquet(capped).count() === n)
  }

  test("dynamic partition overwrite replaces only the written partitions") {
    // the idempotent-backfill primitive: re-running a day's job must
    // replace that day's partition and leave every other partition alone
    // (static mode would wipe the whole table root)
    val dir = Files.createTempDirectory("graft_dpo").toString
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "p")
      .write.partitionBy("p").mode("overwrite").parquet(dir)
    val prior = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      // "re-run" partition b with corrected data; a and c untouched
      Seq((20L, "b")).toDF("id", "p")
        .write.partitionBy("p").mode("overwrite").parquet(dir)
      val got = spark.read.parquet(dir).as[(Long, String)].collect().toSet
      assert(got === Set((1L, "a"), (20L, "b"), (3L, "c")),
        s"only partition b should have been replaced: $got")
    } finally prior match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  test("orc and zstd-parquet roundtrips preserve data exactly") {
    val ev = Tables.events(spark, GraftSpark.sf)
      .select("event_id", "user_id", "event_type", "value")
    val checksum = ev.agg(sum("event_id"), sum("user_id"), sum("value")).head()

    val orcDir = Files.createTempDirectory("graft_orc").toString
    ev.write.mode("overwrite").orc(orcDir)
    val orcBack = spark.read.orc(orcDir)
    assert(orcBack.count() === ev.count())
    assert(orcBack.agg(sum("event_id"), sum("user_id"), sum("value")).head()
      === checksum)

    val zstdDir = Files.createTempDirectory("graft_zstd").toString
    ev.write.mode("overwrite").option("compression", "zstd").parquet(zstdDir)
    val zback = spark.read.parquet(zstdDir)
    assert(zback.count() === ev.count())
    assert(zback.agg(sum("event_id"), sum("user_id"), sum("value")).head()
      === checksum)
  }

  test("dynamic partition pruning: join against a filtered dim prunes the fact scan") {
    // the partition of interest arrives via a join, not a literal — DPP
    // must push the dim's filter result into the fact scan at runtime
    val dim = spark.read.parquet(dimDir).filter($"grp" === 1)
    val fact = spark.read.parquet(partDir)
    val joined = fact.join(dim, fact("event_type") === dim("et"))
      .groupBy("et").agg(count(lit(1)).as("n"))

    val expected = Tables.events(spark, GraftSpark.sf)
      .filter($"event_type" === "click").count()
    val rows = joined.collect()
    assert(rows.length === 1 && rows.head.getLong(1) === expected)

    val planStr = joined.queryExecution.executedPlan.toString
    assert(planStr.toLowerCase.contains("dynamicpruning"),
      s"expected dynamic partition pruning in fact scan:\n$planStr")
  }
}
