package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of named contract queries
  * (`runMain graft.Explain q_agg_pricing q_join_smj ...`; no args = all
  * batch queries). Used to audit pushdown / broadcast / codegen spans. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names =
      if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.filterNot(_.startsWith("q_stream")).toSeq.sorted
    names.foreach { n =>
      println(s"\n================= $n =================")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
