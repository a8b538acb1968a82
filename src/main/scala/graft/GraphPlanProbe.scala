package graft

import org.apache.spark.sql.SparkSession

/** Dev probe (round 17): print the formatted plan of the kNN-graph BUILD
  * (buildKnnOut4) — the shared-cache builds run eagerly inside
  * knnGraphShared/graphIncrBaseShared, so `graft.Explain` on the consumer
  * queries only shows the checkpointed-edge scans, not the build the
  * round-17 pair-scoring change rewrote. */
object GraphPlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, sfDir).localCheckpoint()
    val p = graft.queries.VectorQueries.knnGraphP(emb.count())
    val (out4, _) = graft.queries.VectorQueries.buildKnnOut4(emb, p)
    println("================= knn_graph_build_out4 =================")
    out4.explain("formatted")
    spark.stop()
  }
}
