package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: measure BloomSemiPrefilterRule on a shuffle semi join at
  * the given sf (`runMain graft.RuleBench`). Broadcast is disabled so the
  * semi join actually shuffles — the regime the rule targets (a broadcast
  * semi join already probes a hash map; the bloom adds nothing there). */
object RuleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    def q(): Long = {
      val urgent = Tables.orders(spark, sfDir)
        .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
      Tables.lineitem(spark, sfDir)
        .join(urgent, col("l_orderkey") === col("o_orderkey"), "left_semi")
        .groupBy("l_returnflag").agg(count(lit(1)))
        .count()
    }
    q() // warm
    Seq(false, true).foreach { on =>
      spark.conf.set("spark.graft.bloomPrefilter.enabled", on.toString)
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        q()
        println(f"[rule] prefilter=$on rep$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    spark.stop()
  }
}
