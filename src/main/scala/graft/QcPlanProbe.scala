package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (round 17): print the executed plan of one qc SGD step and
  * time its pieces, to verify the exchange-elimination claims. */
object QcPlanProbe {
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
    import spark.implicits._

    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[qcplan] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val feats = time("feats build+checkpoint") {
      graft.queries.CurationQueries.qcFeatures(spark, sfDir).localCheckpoint()
    }
    println("[qcplan] feats rows=" + feats.count() +
      " parts=" + feats.rdd.getNumPartitions)
    val wDf = time("w init collect") {
      feats.select(col("b")).distinct()
        .collect().map(r => (r.getLong(0), 0.0)).toSeq.toDF("b", "wv")
    }
    // one step's gradient query, exactly as qcTrain builds it
    val rs = feats.join(broadcast(wDf), Seq("b"))
      .select(col("doc_id"), col("y"),
        (round(col("wv") * 1e9).cast("long").cast("decimal(19,0)")
          * col("xs").cast("decimal(19,0)")).as("t"))
      .groupBy("doc_id")
      .agg(max("y").as("y"), (sum("t").cast("double") / 1e15).as("m"))
      .select(col("doc_id"),
        round((lit(1.0) / (lit(1.0) + exp(-col("m"))) - col("y")) * 1e8)
          .cast("long").cast("decimal(19,0)").as("rs"))
    val grads = feats.join(rs, "doc_id")
      .select(col("b"), (col("rs") * col("xs").cast("decimal(19,0)")).as("term"))
      .groupBy("b")
      .agg((sum(col("term")).cast("double") / 1e14 / count(lit(1))).as("g"))
    time("step1 collect")(grads.collect())
    time("step2 collect")(grads.collect())
    println(grads.queryExecution.executedPlan.toString.take(6000))
    spark.stop()
  }
}
