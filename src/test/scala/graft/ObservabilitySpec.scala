package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Pipeline observability (SURVEY.md §2h/§4 operational surface):
 * `observe()` attaches data-quality metrics to a plan and collects them
 * as a side channel of the SAME pass — at 100 TB the alternative (a
 * second validation scan) doubles the job. Plus the left-outer
 * stream-stream join: unmatched rows must emit (with nulls) only after
 * the watermark proves no match can arrive — the semantics that make
 * outer attribution joins runnable on unbounded streams.
 */
class ObservabilitySpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark
  import spark.implicits._

  test("observe(): validation metrics ride the batch pass, no second scan") {
    val df = Tables.events(spark, GraftSpark.sf)
      .observe("validation",
        count(lit(1)).as("n_rows"),
        count(when(col("user_id").isNull, 1)).as("n_null_user"),
        count(when(col("value") < 0, 1)).as("n_neg_value"),
        max("ts").as("max_ts"))
      .groupBy("event_type").agg(count(lit(1)).as("n"))
    val out = df.collect()
    val m = df.queryExecution.observedMetrics("validation")
    assert(m.getAs[Long]("n_rows") === out.map(_.getLong(1)).sum,
      "metric row count equals the aggregated output total")
    assert(m.getAs[Long]("n_null_user") === 0L)
    assert(m.getAs[Long]("n_neg_value") === 0L)
    assert(m.getAs[Timestamp]("max_ts") != null)
  }

  test("observe() on a stream: per-batch metrics in query progress") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = in.toDF().toDF("user_id", "event_type")
      .observe("stream_validation",
        count(lit(1)).as("n_rows"),
        count(when(col("event_type") === "error", 1)).as("n_errors"))
      .writeStream.format("memory").queryName("obs_stream")
      .outputMode("append").start()
    try {
      in.addData((1L, "click"), (2L, "error"), (3L, "click"))
      q.processAllAvailable()
      val m = q.recentProgress.flatMap(p =>
        Option(p.observedMetrics.get("stream_validation"))).last
      assert(m.getAs[Long]("n_rows") === 3L)
      assert(m.getAs[Long]("n_errors") === 1L)
    } finally {
      q.stop()
      spark.catalog.dropTempView("obs_stream")
    }
  }

  private def ts(m: Int): Timestamp = new Timestamp(m * 60000L)

  test("left-outer stream-stream join: unmatched rows emit nulls after watermark") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Timestamp, Long)]
    val buys = MemoryStream[(Timestamp, Long)]
    val c = clicks.toDF().toDF("c_ts", "c_user").withWatermark("c_ts", "5 minutes")
    val b = buys.toDF().toDF("b_ts", "b_user").withWatermark("b_ts", "5 minutes")
    val joined = c.join(b,
      expr("""c_user = b_user AND
              b_ts >= c_ts AND b_ts <= c_ts + interval 10 minutes"""),
      "left_outer")
      .select($"c_user", $"c_ts".cast("long").as("click_s"),
        $"b_ts".cast("long").as("buy_s"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ss_outer").start()
    try {
      clicks.addData((ts(1), 1L), (ts(1), 2L))
      buys.addData((ts(5), 1L)) // match for user 1; user 2 never buys
      q.processAllAvailable()
      // inner match emits immediately; user 2's null row must NOT emit
      // yet (a matching buy could still arrive)
      val early = spark.table("ss_outer").collect()
        .map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
      assert(early === Set((1L, 60L, 300L)), s"early rows: $early")
      // advance both watermarks far past click+10min+delay → the outer
      // null row for user 2 is now provably unmatched and must emit
      clicks.addData((ts(60), 9L))
      buys.addData((ts(60), 9L))
      q.processAllAvailable()
      val late = spark.table("ss_outer").collect()
        .map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
      assert(late.contains((2L, 60L, -1L)),
        s"outer null row for the unmatched click must emit after watermark: $late")
    } finally {
      q.stop()
      spark.catalog.dropTempView("ss_outer")
    }
  }
}
