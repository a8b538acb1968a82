package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Watermark / late-data semantics (SURVEY.md §2h): in append mode a
 * windowed aggregate only emits a window once the watermark passes its
 * end, and drops events arriving later than the watermark delay.
 * (The DStream-era reference had no late-data story — processing-time
 * only; this is the Structured Streaming semantics that replaces it.)
 */
class WatermarkSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark
  import spark.implicits._

  private def ts(m: Int): Timestamp = new Timestamp(m * 60000L)

  test("dropDuplicatesWithinWatermark: dedup state is bounded by the watermark") {
    // plain streaming dropDuplicates keeps EVERY key forever (unbounded
    // state at 100 TB); the watermark variant evicts keys once they age
    // out, trading re-admission of very-late duplicates for bounded state
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val deduped = input.toDF().toDF("ts", "k")
      .withWatermark("ts", "5 minutes")
      .dropDuplicatesWithinWatermark("k")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("ddww").start()
    try {
      input.addData((ts(1), "a"), (ts(2), "a"))  // duplicate within window
      q.processAllAvailable()
      input.addData((ts(30), "b"))               // advances watermark to 25
      q.processAllAvailable()
      // "a" expired from state (1, 2 < 25): a very late duplicate is
      // re-admitted — exactly the documented bounded-state trade-off;
      // it lands because append passes rows through on arrival here
      input.addData((ts(31), "a"))
      q.processAllAvailable()
      val ks = spark.table("ddww").select($"k").as[String]
        .collect().toSeq.sorted
      assert(ks === Seq("a", "a", "b"),
        s"expected one admitted dup after expiry, got $ks")
    } finally q.stop()
  }

  test("append-mode window emits on watermark passage and drops late rows") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val agg = input.toDF().toDF("ts", "k")
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "5 minutes"), $"k")
      .agg(count(lit(1)).as("cnt"))
      .select($"window.start".as("wstart"), $"k", $"cnt")
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("wm_test").start()
    try {
      // batch 1: two events in window [0,5), one in [20,25)
      input.addData((ts(1), "a"), (ts(2), "a"), (ts(21), "a"))
      q.processAllAvailable()
      // watermark after batch 1 = 21 - 10 = 11min → window [0,5) is final
      input.addData((ts(22), "a"))
      q.processAllAvailable()
      val emitted = spark.table("wm_test")
        .select($"wstart".cast("long").as("w"), $"cnt").as[(Long, Long)]
        .collect().toMap
      assert(emitted.get(0L).contains(2L), s"window [0,5) should have emitted: $emitted")
      assert(!emitted.contains(20 * 60L), "unfinalized window must not emit in append mode")

      // a LATE event for the already-finalized window [0,5) must be dropped
      input.addData((ts(3), "a"))
      // and advance the watermark far enough to finalize [20,25)
      input.addData((ts(40), "a"))
      q.processAllAvailable()
      val after = spark.table("wm_test")
        .select($"wstart".cast("long").as("w"), $"cnt").as[(Long, Long)]
        .collect().groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      assert(after.get(0L).contains(2L),
        s"late event must not reopen/recount the finalized window: $after")
      assert(after.get(20 * 60L).contains(2L),
        s"window [20,25) should finalize with exactly its 2 on-time events: $after")
    } finally q.stop()
  }
}
