package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic: measured quality-classifier training metrics per scale
  * (pins the q_quality_classifier floors — BASELINE.md r8). */
object QcProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
    for (d <- sfs) {
      val r = queries.CurationQueries.qcMetrics(spark, d).head()
      println(s"=== $d === n=${r.getLong(0)} acc=${r.getDouble(1)} " +
        s"keep_en=${r.getDouble(2)} keep_other=${r.getDouble(3)} loss=${r.getDouble(4)}")
    }
    spark.stop()
  }
}
