package graft

import java.io.PrintWriter
import java.net.ServerSocket
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingPipelines

/**
 * Streaming source/sink coverage (SURVEY.md §2a): the reference's socket
 * text intake, the rate source, and the parquet streaming sink. These are
 * inherently wall-clock-driven, so they are tests (bounded, with
 * timeouts) rather than deterministic contract queries.
 */
class StreamingSourcesSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark

  test("socket text source: lines stream in and tokenize (reference intake)") {
    val lines = Seq("hello world hello", "spark streams words", "hello spark")
    val server = new ServerSocket(0)
    val port = server.getLocalPort
    val writer = new Thread(() => {
      val sock = server.accept()
      val out = new PrintWriter(sock.getOutputStream, true)
      lines.foreach(out.println)
      out.flush()
      // keep the connection open until the test closes the server —
      // closing early can race the receiver's first poll
      Thread.sleep(30000)
    })
    writer.setDaemon(true)
    writer.start()
    try {
      val counts = spark.readStream
        .format("socket")
        .option("host", "localhost").option("port", port)
        .load()
        .select(explode(functions.tokens(col("value"))).as("word"))
        .groupBy("word").count()
      val q = counts.writeStream.outputMode("complete")
        .format("memory").queryName("socket_wordcount")
        .trigger(Trigger.ProcessingTime("500 milliseconds"))
        .start()
      try {
        val deadline = System.currentTimeMillis() + 60000
        def total(): Long =
          spark.table("socket_wordcount").agg(sum("count")).head().getLong(0)
        def rows(): Long = spark.table("socket_wordcount").count()
        while (System.currentTimeMillis() < deadline &&
               (rows() == 0 || total() < 8)) Thread.sleep(250)
        val got = spark.table("socket_wordcount").collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        assert(got("hello") === 3L)
        assert(got("spark") === 2L)
        assert(got.values.sum === 8L)
      } finally q.stop()
    } finally server.close()
  }

  test("rate source: deterministic schema, rows flow") {
    val q = spark.readStream.format("rate")
      .option("rowsPerSecond", "50")
      .load()
      .writeStream.format("memory").queryName("rate_rows")
      .trigger(Trigger.ProcessingTime("250 milliseconds"))
      .start()
    try {
      val deadline = System.currentTimeMillis() + 30000
      while (System.currentTimeMillis() < deadline &&
             spark.table("rate_rows").count() == 0) Thread.sleep(200)
      assert(spark.table("rate_rows").count() > 0)
      assert(spark.table("rate_rows").schema.fieldNames.toSeq ===
        Seq("timestamp", "value"))
    } finally q.stop()
  }

  test("parquet streaming sink: file stream -> parquet out == table contents") {
    val outDir = Files.createTempDirectory("graft_sink_parquet").toString
    val ckpt = Files.createTempDirectory("graft_sink_ckpt").toString
    val q = StreamingPipelines.eventStream(spark, GraftSpark.sf)
      .select("event_id", "user_id", "event_type")
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val written = spark.read.parquet(outDir)
    val expected = Tables.events(spark, GraftSpark.sf)
    assert(written.count() === expected.count())
    assert(written.agg(sum("event_id")).head().getLong(0) ===
      expected.agg(sum("event_id")).head().getLong(0))
  }

  test("checkpoint recovery: restart resumes exactly-once from the offset log") {
    import spark.implicits._
    val src = Files.createTempDirectory("graft_ckpt_src").toString
    val out = Files.createTempDirectory("graft_ckpt_out").toString
    val ckpt = Files.createTempDirectory("graft_ckpt_log").toString
    val schema = new org.apache.spark.sql.types.StructType().add("id", "long")

    def runOnce(): Unit = {
      val q = spark.readStream.schema(schema).parquet(src)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      assert(q.exception.isEmpty, s"query failed: ${q.exception}")
    }

    spark.range(0, 5).toDF("id").write.mode("append").parquet(src)
    runOnce()
    assert(spark.read.parquet(out).count() === 5)

    // second chunk lands, query restarts from the SAME checkpoint: the
    // offset log must skip the already-committed files — 12 rows total,
    // each id exactly once (no reprocessing, no loss)
    spark.range(5, 12).toDF("id").write.mode("append").parquet(src)
    runOnce()
    val ids = spark.read.parquet(out).select("id").as[Long].collect().sorted
    assert(ids.toSeq === (0L until 12L), s"expected exactly-once 0..11, got ${ids.toSeq}")
  }

  test("stateful restart: aggregation state survives via the state store") {
    import spark.implicits._
    val src = Files.createTempDirectory("graft_state_src").toString
    val ckpt = Files.createTempDirectory("graft_state_log").toString
    val schema = new org.apache.spark.sql.types.StructType().add("u", "string")
    val seen = new java.util.concurrent.ConcurrentHashMap[String, Long]()

    def runOnce(): Unit = {
      val q = spark.readStream.schema(schema).json(src)
        .groupBy("u").agg(count(lit(1)).as("n"))
        .writeStream
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.collect().foreach(r => seen.put(r.getString(0), r.getLong(1)))
          ()
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      assert(q.exception.isEmpty, s"query failed: ${q.exception}")
    }

    Files.write(java.nio.file.Paths.get(src, "c1.json"),
      """{"u":"a"}
        |{"u":"a"}
        |{"u":"a"}""".stripMargin.getBytes)
    runOnce()
    assert(seen.get("a") === 3L)

    // restart with more data: the count for "a" must CONTINUE from the
    // persisted state (5), not restart from the new chunk alone (2)
    Files.write(java.nio.file.Paths.get(src, "c2.json"),
      """{"u":"a"}
        |{"u":"a"}
        |{"u":"b"}""".stripMargin.getBytes)
    runOnce()
    assert(seen.get("a") === 5L, s"state not restored: ${seen}")
    assert(seen.get("b") === 1L)
  }

  test("foreach sink: row-level ForeachWriter with open/process/close lifecycle") {
    // the per-ROW cousin of foreachBatch (per-partition writer lifecycle —
    // how custom sinks without a DataSource implementation are built).
    // The writer is SERIALIZED per task, so captured locals would mutate
    // task-local copies — state goes through a static holder instead
    // (same trap a real sink avoids by writing to an external system).
    import org.apache.spark.sql.{ForeachWriter, Row}
    ForeachSinkProbe.reset()
    val q = StreamingPipelines.eventStream(spark, GraftSpark.sf)
      .select("event_id")
      .writeStream
      .foreach(new ForeachWriter[Row] {
        def open(partitionId: Long, epochId: Long): Boolean = {
          ForeachSinkProbe.opened.incrementAndGet(); true
        }
        def process(r: Row): Unit = { ForeachSinkProbe.seen.add(r.getLong(0)); () }
        def close(errorOrNull: Throwable): Unit = {
          ForeachSinkProbe.closed.incrementAndGet(); ()
        }
      })
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    assert(q.exception.isEmpty, s"foreach sink failed: ${q.exception}")
    val expected = Tables.events(spark, GraftSpark.sf).count()
    assert(ForeachSinkProbe.seen.size.toLong === expected)
    assert(ForeachSinkProbe.opened.get() > 0 &&
      ForeachSinkProbe.opened.get() === ForeachSinkProbe.closed.get(),
      s"writer lifecycle unbalanced: opened=${ForeachSinkProbe.opened}" +
        s" closed=${ForeachSinkProbe.closed}")
  }

  test("console sink: the reference's print() output path runs to completion") {
    // the reference demo prints each micro-batch to stdout; the Structured
    // Streaming equivalent is the console sink. Demo-only (not a data
    // path) — assert it drains a bounded stream without error.
    val q = StreamingPipelines.eventStream(spark, GraftSpark.sf)
      .groupBy("event_type").agg(count(lit(1)).as("cnt"))
      .writeStream
      .format("console")
      .outputMode("complete")
      .option("numRows", "5")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    assert(q.exception.isEmpty, s"console sink failed: ${q.exception}")
  }
}

/** JVM-static accumulation point for the ForeachWriter test (the writer
  * is serialized per task; captured locals would be task-local copies). */
object ForeachSinkProbe {
  val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
  val opened = new java.util.concurrent.atomic.AtomicInteger()
  val closed = new java.util.concurrent.atomic.AtomicInteger()
  def reset(): Unit = { seen.clear(); opened.set(0); closed.set(0) }
}
