package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.{BINARY, DOUBLE, INT64}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingPipelines

/**
 * Ts-unit ingestion contract (VERDICT r6 #1/#2): `events.ts` has shipped
 * as parquet TIMESTAMP(NANOS), TIMESTAMP(MICROS, isAdjustedToUTC=false)
 * (= TIMESTAMP_NTZ), and UTC-adjusted TIMESTAMP(MICROS) across testdata
 * generations. The engine must decode ALL of them — batch loader and
 * streaming source alike — to identical session-zoned microsecond
 * timestamps, and a unit it cannot decode sanely must fail LOUDLY rather
 * than silently collapse every event-time window (the round-6 failure
 * mode: µs longs divided by 1000 squeezed 30 days into 43 minutes).
 *
 * The NANOS fixture is authored with parquet-mr directly (Spark cannot
 * write that physical type); the other two are Spark-written.
 */
class TsUnitSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark
  import spark.implicits._

  /** (event_id, ts-micros, user_id, event_type, value, props) ground truth:
    * timestamps spanning a month of 2024 at odd sub-second offsets. */
  private val rows: Seq[(Long, Long, Long, String, Double, String)] = Seq(
    (1L, 1704067207179575L, 10L, "click", 1.5, "{}"),    // 2024-01-01T00:00:07.179575
    (2L, 1704672012000001L, 11L, "view", 2.5, "{}"),     // 2024-01-08
    (3L, 1705881634999999L, 10L, "purchase", 9.0, "{}"), // 2024-01-22
    (4L, 1706745599000000L, 12L, "click", 0.25, "{}"))   // 2024-01-31T23:59:59

  private def freshDir(): String = {
    val d = Files.createTempDirectory("graft_tsunit").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  /** Author `<dir>/events.parquet/data.parquet` as TIMESTAMP(NANOS) via
    * parquet-mr — the pre-round-6 testdata shape. `baseRows` defaults to
    * the 2024 ground truth; the over-scale guard test substitutes
    * epoch-era rows because 2024-µs × 10⁶ exceeds int64 (≈1.7e21 > 2⁶³)
    * and would wrap rather than produce the intended far-future values. */
  private def writeNanosFixture(microsScale: Long = 1000L,
      baseRows: Seq[(Long, Long, Long, String, Double, String)] = rows): String = {
    val dir = freshDir()
    val evDir = new java.io.File(dir, "events.parquet")
    assert(evDir.mkdirs())
    val schema = Types.buildMessage()
      .required(INT64).named("event_id")
      .required(INT64)
      .as(LogicalTypeAnnotation.timestampType(false, TimeUnit.NANOS)).named("ts")
      .required(INT64).named("user_id")
      .required(BINARY).as(LogicalTypeAnnotation.stringType()).named("event_type")
      .required(DOUBLE).named("value")
      .required(BINARY).as(LogicalTypeAnnotation.stringType()).named("props")
      .named("events")
    val writer = ExampleParquetWriter
      .builder(new Path(s"${evDir.getAbsolutePath}/data.parquet"))
      .withType(schema).build()
    val f = new SimpleGroupFactory(schema)
    baseRows.foreach { case (id, us, uid, et, v, p) =>
      // micros → nanos, overflow-checked: a wrapped product would write
      // garbage that passes or fails the guard by accident, not by design
      val stored = try math.multiplyExact(us, microsScale) catch {
        case _: ArithmeticException =>
          fail(s"fixture value $us × $microsScale overflows int64 — " +
            "the written file would hold wrapped garbage, not a mis-scaled unit")
      }
      val g = f.newGroup()
      g.add("event_id", id)
      g.add("ts", stored)
      g.add("user_id", uid)
      g.add("event_type", et)
      g.add("value", v)
      g.add("props", p)
      writer.write(g)
    }
    writer.close()
    dir
  }

  private def baseDf = rows.toDF("event_id", "us", "user_id", "event_type", "value", "props")

  /** Spark-written fixture with ts as TIMESTAMP_NTZ (micros, unadjusted)
    * — the round-6 regenerated-testdata shape. */
  private def writeNtzFixture(): String = {
    val dir = freshDir()
    baseDf
      .withColumn("ts", timestamp_micros(col("us")).cast("timestamp_ntz"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    dir
  }

  /** Spark-written fixture with ts as UTC-adjusted TIMESTAMP(MICROS). */
  private def writeLtzFixture(): String = {
    val dir = freshDir()
    val prior = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try baseDf
      .withColumn("ts", timestamp_micros(col("us")))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    finally prior match {
      case Some(v) => spark.conf.set("spark.sql.parquet.outputTimestampType", v)
      case None => spark.conf.unset("spark.sql.parquet.outputTimestampType")
    }
    dir
  }

  private val expected = rows.map { case (id, us, _, _, _, _) => (id, us) }.toSet

  private def batchDecoded(dir: String): Set[(Long, Long)] =
    Tables.events(spark, dir)
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
      .as[(Long, Long)].collect().toSet

  test("batch loader decodes NANOS, NTZ-micros, and LTZ-micros identically") {
    for ((label, dir) <- Seq("nanos" -> writeNanosFixture(),
        "ntz" -> writeNtzFixture(), "ltz" -> writeLtzFixture())) {
      val df = Tables.events(spark, dir)
      assert(df.schema("ts").dataType ==
        org.apache.spark.sql.types.TimestampType,
        s"$label: normalized ts must be session-zoned TimestampType")
      assert(batchDecoded(dir) == expected, s"$label: decoded µs values differ")
    }
  }

  test("streaming source decodes all three shapes to the same values as batch") {
    for ((label, dir) <- Seq("nanos" -> writeNanosFixture(),
        "ntz" -> writeNtzFixture(), "ltz" -> writeLtzFixture())) {
      val stream = StreamingPipelines.eventStream(spark, dir)
        .select(col("event_id"), unix_micros(col("ts")).as("us"))
      val got = StreamingPipelines.runToMemory(spark, stream,
          s"tsunit_$label", OutputMode.Append())
        .as[(Long, Long)].collect().toSet
      assert(got == expected, s"$label: stream decode differs from ground truth")
      spark.catalog.dropTempView(s"tsunit_$label")
    }
  }

  test("a mis-scaled unit fails loudly, not with silently collapsed windows") {
    // NANOS logical type but values 1000× too big. 2024-era micros × 10⁶
    // overflows int64 (the writer now rejects that), so the over-scale
    // fixture uses epoch-era bases: true time ≈ 1970-04, stored = µs×10⁶
    // fits in int64, and the decode lands at ≈ year 2223 — the intended
    // 1000×-off magnitude, outside [2000, 2100), so the guard must throw.
    val epochRows = Seq(
      (1L, 8000000000000L, 10L, "click", 1.5, "{}"),   // 1970-04-03
      (2L, 8100000000000L, 11L, "view", 2.5, "{}"))
    val bad = writeNanosFixture(microsScale = 1000000L, baseRows = epochRows)
    val e = intercept[IllegalArgumentException] {
      Tables.assertSaneEventTs(spark, bad)
    }
    assert(e.getMessage.contains("events.ts"), s"unexpected message: ${e.getMessage}")
    // and an under-scaled unit (nanos values that are really micros →
    // decodes to 1970) must throw too
    val bad2 = writeNanosFixture(microsScale = 1L)
    intercept[IllegalArgumentException] {
      Tables.assertSaneEventTs(spark, bad2)
    }
    // sane fixtures pass the same guard
    Tables.assertSaneEventTs(spark, writeNanosFixture())
  }
}
