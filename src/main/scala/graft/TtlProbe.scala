package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic: time the TTL'd transformWithState twin vs the plain one. */
object TtlProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    for (q <- Seq("q_stream_tws", "q_stream_tws_ttl", "q_stream_tws")) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, d).count()
      println(f"[ttlprobe] $q: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
