package graft

import org.apache.spark.sql.SparkSession

/** Dev timing scratchpad (numbers end up in BASELINE.md). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    time("warmup")(SparkEntry.queries("q_exact_counts")(spark, d).count())
    args.foreach { q =>
      time(s"$q run1")(SparkEntry.queries(q)(spark, d).count())
      time(s"$q run2")(SparkEntry.queries(q)(spark, d).count())
    }
    spark.stop()
  }
}
