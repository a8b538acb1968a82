package graft

import org.apache.spark.sql.SparkSession

/** Local perf iteration: time the named queries (comma-separated in
  * args(0)) against args(1) (default sf0.1), N repeats via args(2). */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "15s")
    Bench.tmpfsScratch().foreach(p => b.config("spark.local.dir", s"$p/local"))
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // NonFatal only: swallowing an OOM/linkage error here would leave a
    // corrupted JVM whose failures get misattributed to the timed queries
    try SparkEntry.queries("q_exact_counts")(spark, sfDir).count()
    catch { case scala.util.control.NonFatal(_) => () }
    names.foreach { name =>
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(name)(spark, sfDir).count()
        println(f"[timeq] $name rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      }
    }
    spark.stop()
  }
}
