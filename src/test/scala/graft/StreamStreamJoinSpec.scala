package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Stream-stream event-time interval join (SURVEY.md §2e extension): both
 * sides unbounded, matches constrained to a time range, watermarks
 * bounding the buffered state. The DStream-era reference could only join
 * a stream against static data; this is the Structured Streaming
 * capability that replaces that limitation — and the state-cleanup
 * semantics (watermark evicts buffered rows) is what makes it runnable
 * indefinitely at scale.
 */
class StreamStreamJoinSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark
  import spark.implicits._

  private def ts(m: Int): Timestamp = new Timestamp(m * 60000L)

  test("interval join: purchase within 15 minutes after click, per user") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Timestamp, Long)]
    val buys = MemoryStream[(Timestamp, Long)]

    val c = clicks.toDF().toDF("c_ts", "c_user").withWatermark("c_ts", "10 minutes")
    val b = buys.toDF().toDF("b_ts", "b_user").withWatermark("b_ts", "10 minutes")
    val joined = c.join(b,
      expr("""c_user = b_user AND
              b_ts >= c_ts AND b_ts <= c_ts + interval 15 minutes"""))
      .select($"c_user".as("user"),
        $"c_ts".cast("long").as("click_min"),
        $"b_ts".cast("long").as("buy_min"))

    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ss_join").start()
    try {
      clicks.addData((ts(1), 1L), (ts(2), 2L))
      buys.addData((ts(5), 1L))   // in range for user 1
      q.processAllAvailable()
      buys.addData((ts(30), 2L))  // 28 min after user 2's click: out of range
      buys.addData((ts(10), 1L))  // second in-range purchase for user 1
      q.processAllAvailable()

      val rows = spark.table("ss_join")
        .as[(Long, Long, Long)].collect().toSet
      assert(rows === Set(
        (1L, 60L, 300L),   // click@1min -> buy@5min
        (1L, 60L, 600L)),  // click@1min -> buy@10min
        s"unexpected join output: $rows")
    } finally q.stop()
  }
}
