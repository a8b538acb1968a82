package graft.queries

import org.apache.spark.sql.SparkSession

/** Scratch timing probe (round 10): separates the incremental fold's
  * cost from the base build and the full rebuild, for the BASELINE
  * cost-scales-with-delta row. graphIncremental checkpoints every
  * fold input (base out-edges, bucket tables, collision pairs), so
  * timing the returned edge set's action measures the FOLD lineage
  * alone. Run: runMain graft.queries.GraphIncrProbe <sfDir> */
object GraphIncrProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val (emb, edgesIncr, nBase, nDelta, nTouched, p, foldOverflow) =
      time("base_build_plus_fold_prep")(VectorQueries.graphIncremental(s, d))
    println(s"PROBE n_base=$nBase n_delta=$nDelta n_touched=$nTouched p=$p" +
      s" fold_overflow=$foldOverflow")
    time("fold_only")(edgesIncr.count())
    time("full_rebuild") {
      val (out4, _) = VectorQueries.buildKnnOut4(emb, p)
      out4.unionByName(out4.selectExpr("dst as src", "src as dst"))
        .distinct().count()
    }
    s.stop()
  }
}
