package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/**
 * Benchmark main: times every driver-contract query at
 * `SPARK_GRAFT_SF_DIR` and emits ONE total-only JSON line as the final
 * stdout line (the full per-query map goes to BENCH_LOCAL.json — a
 * 100-query map overflows the driver's stdout tail, which is why rounds
 * 1–2 came back `parsed: null`).
 *
 * Ordering: all batch queries first (sorted), the 9 streaming pipelines
 * LAST (sorted) with a state cleanup after each — streaming runs leave
 * per-query residue in the shared JVM (memory-sink tables, RocksDB
 * instances, checkpoint dirs) that round 2 measured bleeding 2–4× into
 * whatever batch queries ran after them.
 */
object Bench {

  /** Point scratch I/O (stream checkpoints + commit logs, RocksDB state,
    * shuffle/spill files, staged stream inputs) at tmpfs when a writable
    * /dev/shm exists: measured ~5-12% off every streaming pipeline vs
    * disk-backed /tmp. Returns the scratch root if enabled. */
  def tmpfsScratch(): Option[String] = {
    val shm = new java.io.File("/dev/shm")
    if (shm.isDirectory && shm.canWrite) {
      val p = "/dev/shm/graft_scratch"
      if (new java.io.File(p).mkdirs() || new java.io.File(p).isDirectory) {
        System.setProperty("java.io.tmpdir", p)
        Some(p)
      } else None
    } else None
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val scratch = Bench.tmpfsScratch()
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // 100+ queries in one JVM: broadcasts/shuffle state are only reclaimed
      // by the ContextCleaner on GC, so force one periodically or late
      // queries pay for the whole run's accumulation
      .config("spark.cleaner.periodicGC.interval", "15s")
    scratch.foreach(p => builder.config("spark.local.dir", s"$p/local"))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JVM/codegen/parquet-footer caches, so the first
    // timed query isn't +5-8s of one-time cost
    try { SparkEntry.queries("q_exact_counts")(spark, sfDir).count() }
    catch { case _: Throwable => () }

    /** drop the memory-sink temp views a streaming pipeline registered so
      * their buffered rows become collectable (the DF that counted them
      * is dead by now), untimed; the periodic ContextCleaner GC then
      * reclaims broadcasts/shuffle state. */
    def cleanupStreamingResidue(): Unit =
      spark.catalog.listTables().collect()
        .filter(_.isTemporary)
        .foreach(t => spark.catalog.dropTempView(t.name))

    // deterministic order, batch before streaming → per-query numbers
    // comparable across runs AND batch numbers unpolluted by stream state
    val (streamQ, batchQ) = SparkEntry.queries.toSeq.sortBy(_._1)
      .partition(_._1.startsWith("q_stream_"))
    val results = (batchQ ++ streamQ).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          -1L
      }
      val dt = (System.nanoTime() - t0) / 1e9
      if (name.startsWith("q_stream_")) cleanupStreamingResidue()
      name -> dt
    }
    def fmtMap(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
        .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val fullLine =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","n_queries":${results.size},"queries":${fmtMap(results.sortBy(_._1))},"sf":"$sfDir"}"""
    Files.writeString(Paths.get("BENCH_LOCAL.json"), fullLine + "\n")
    spark.stop()
    // total-only (~110 chars) as the ABSOLUTE last stdout line
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","n_queries":${results.size},"sf":"$sfDir"}""")
  }
}
