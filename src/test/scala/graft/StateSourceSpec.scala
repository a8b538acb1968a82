package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite

/**
 * Streaming operability at scale (SURVEY.md §2h): checkpoint-based
 * restart (exactly-once across job restarts — the property a
 * 1000-executor deployment leans on every deploy) and the Spark 4
 * `statestore` batch data source (offline inspection of a live query's
 * state — the debugging/backfill path for stateful pipelines).
 */
class StateSourceSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark
  import spark.implicits._

  test("checkpointed restart: second run reads only new files, state carries over") {
    val in = Files.createTempDirectory("graft_restart_in").toString
    val ckpt = Files.createTempDirectory("graft_restart_ckpt").toString

    def runOnce(name: String): org.apache.spark.sql.streaming.StreamingQuery = {
      val agg = spark.readStream
        .schema("k STRING, v LONG")
        .parquet(in)
        .groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("sum_v"))
      agg.writeStream.outputMode(OutputMode.Complete())
        .format("memory").queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
    }

    // batch 1 → first run
    Seq(("a", 1L), ("a", 2L), ("b", 10L)).toDF("k", "v")
      .write.mode("append").parquet(in)
    val q1 = runOnce("restart_run1")
    q1.awaitTermination()
    val r1 = spark.table("restart_run1").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(r1 === Set(("a", 2L, 3L), ("b", 1L, 10L)))

    // batch 2 appended AFTER the first run committed → restart from the
    // same checkpoint must process ONLY the new files, yet produce the
    // cumulative aggregate (state recovered from the store)
    Seq(("a", 100L), ("c", 5L)).toDF("k", "v")
      .write.mode("append").parquet(in)
    val q2 = runOnce("restart_run2")
    q2.awaitTermination()
    val r2 = spark.table("restart_run2").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(r2 === Set(("a", 3L, 103L), ("b", 1L, 10L), ("c", 1L, 5L)),
      "restart yields the cumulative aggregate")
    val rowsRead = q2.recentProgress.map(_.numInputRows).sum
    assert(rowsRead === 2, s"restart re-read data (numInputRows=$rowsRead, want 2)")
    spark.catalog.dropTempView("restart_run1")
    spark.catalog.dropTempView("restart_run2")
  }

  test("statestore data source reads a checkpointed query's live state") {
    val in = Files.createTempDirectory("graft_sss_in").toString
    val ckpt = Files.createTempDirectory("graft_sss_ckpt").toString
    Seq(("x", 1L), ("x", 2L), ("y", 7L)).toDF("k", "v")
      .write.mode("append").parquet(in)
    val q = spark.readStream.schema("k STRING, v LONG").parquet(in)
      .groupBy("k").agg(count(lit(1)).as("n"))
      .writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("sss_q")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    // offline read of the aggregation operator's state store; the value
    // struct carries the INTERNAL aggregation buffer (field `count`),
    // not the query's output aliases — state is physical, not logical
    val state = spark.read.format("statestore").load(ckpt)
    val kv = state.select(col("key.k").as("k"), col("value.count").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(kv === Set(("x", 2L), ("y", 1L)),
      "state rows equal the aggregation state the query committed")
    spark.catalog.dropTempView("sss_q")
  }
}
