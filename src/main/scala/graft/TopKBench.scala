package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions._
object TopKBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val li = Tables.lineitem(spark, sfDir)
      .select($"l_returnflag", $"l_extendedprice",
        ($"l_orderkey" * 10 + $"l_linenumber").as("id"))
    li.count() // warm
    def time(tag: String)(f: => Long): Unit = (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val n = f
      println(f"[topk] $tag rep$i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }
    time("heap-agg") {
      li.groupBy("l_returnflag")
        .agg(topk_agg($"l_extendedprice", $"id", 3).as("tk")).count()
    }
    val w = Window.partitionBy("l_returnflag").orderBy($"l_extendedprice".desc, $"id")
    time("window-rank") {
      li.withColumn("rn", row_number().over(w)).filter($"rn" <= 3).count()
    }
    spark.stop()
  }
}
