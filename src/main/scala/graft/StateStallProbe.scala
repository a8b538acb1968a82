package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.apache.spark.sql.types._

/** Dev probe (round 17): isolate the ~700 ms/task zero-CPU stall seen in
  * every stateful micro-batch stage (q_stream_observe: 24 s run / 1.1 s
  * CPU over 32 tasks). Runs the same tiny stateful stream under one
  * varied knob per case and prints wall time. */
object StateStallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    Bench.tmpfsScratch().foreach(p => b.config("spark.local.dir", s"$p/local"))
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val io = graft.GraftIO.root + "/stall_probe"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(io), true)
    val ev = graft.Tables.events(spark, sfDir)
      .select("event_id", "event_type", "value")
    (0 until 3).foreach { bi =>
      val tmp = s"$io/tmp_b$bi"
      ev.filter(pmod(col("event_id"), lit(3)) === bi)
        .coalesce(1).write.parquet(tmp)
      val part = fs.globStatus(
        new org.apache.hadoop.fs.Path(s"$tmp/part-*.parquet")).head.getPath
      fs.rename(part, new org.apache.hadoop.fs.Path(s"$io/in/b$bi.parquet"))
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
    }
    val schema = StructType(Seq(StructField("event_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType)))

    def run(tag: String, parts: Option[Int], confs: Map[String, String],
        withObserve: Boolean = true): Unit = {
      val priorParts = spark.conf.get("spark.sql.shuffle.partitions")
      val priors = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
      parts.foreach(p => spark.conf.set("spark.sql.shuffle.partitions", p))
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      try {
        val t0 = System.nanoTime()
        var src: DataFrame = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(s"$io/in/b*.parquet")
        if (withObserve)
          src = src.observe("qa", count(lit(1)).as("rows"),
            sum(col("value").cast("decimal(30,12)")).as("val_sum"))
        val q = src.groupBy("event_type").agg(count(lit(1)).as("cnt"))
          .writeStream.outputMode(OutputMode.Complete())
          .foreachBatch { (batch: DataFrame, _: Long) => batch.collect(); () }
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        println(f"[stall] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      } finally {
        spark.conf.set("spark.sql.shuffle.partitions", priorParts)
        priors.foreach { case (k, vOpt) => vOpt match {
          case Some(v) => spark.conf.set(k, v)
          case None => spark.conf.unset(k) } }
      }
    }

    run("warm-up (discard)", None, Map.empty)
    run("default-32parts", None, Map.empty)
    run("4parts", Some(4), Map.empty)
    run("no-observe", None, Map.empty, withObserve = false)
    run("rocksdb", None, Map(
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" ->
        "true"))
    run("no-commit-validation", None, Map(
      "spark.sql.streaming.stateStore.commitValidation.enabled" -> "false"))
    run("maintenance-off", None, Map(
      "spark.sql.streaming.stateStore.maintenanceInterval" -> "600s"))
    run("default-again", None, Map.empty)
    spark.stop()
  }
}
