package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables

/** Dev probe (round 16): ablation timing of the IVF-PQ pipeline pieces,
  * to localize the dominant stage the ProfileQ listener attributes only
  * to an anonymous broadcast-exchange future. Each piece is timed twice
  * (rep2 = JIT/codegen warm). */
object PiecesProbe {
  def main(args: Array[String]): Unit = {
    val d = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Long): Unit =
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[pieces] $label rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n)")
      }
    def noop(df: org.apache.spark.sql.DataFrame): Long = {
      df.write.format("noop").mode("overwrite").save(); 0L
    }
    // old ivfpqCells formulation, for the round-16 A/B record
    def cellsOld(emb: org.apache.spark.sql.DataFrame) =
      emb.select(col("label").as("cell"),
          posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy("cell", "pos")
        .agg((sum(col("v").cast("double").cast("decimal(20,10)")).cast("double")
          / count(lit(1))).as("c"), count(lit(1)).as("occ"))
        .groupBy("cell")
        .agg(array_sort(collect_list(struct(col("pos"), col("c")))).as("pc"),
          max("occ").as("occ"))
        .select(col("cell"),
          transform(col("pc"), x => x.getField("c")).as("centroid"), col("occ"))
    val emb = VectorQueries.plantedEmb(spark, d)
    time("emb.noop")(noop(emb))
    time("cells_new")(noop(VectorQueries.ivfpqCells(emb)))
    time("cells_old")(noop(cellsOld(emb)))
    time("cells")(VectorQueries.ivfpqCells(emb).count())
    val cells = VectorQueries.ivfpqCells(emb).localCheckpoint()
    time("rsubs")(VectorQueries.ivfpqResidualSubs(emb, cells).count())
    val rsubs = VectorQueries.ivfpqResidualSubs(emb, cells).localCheckpoint()
    time("codebook16")(VectorQueries.ivfpqCodebook(rsubs).count())
    time("codebook256")(VectorQueries.ivfpqCodebookK(rsubs, 256).count())
    time("pqsubs")(VectorQueries.pqSubs(spark, d).count())
    val subs = VectorQueries.pqSubs(spark, d).localCheckpoint()
    time("pqcb16")(VectorQueries.pqCodebook(subs).count())
    time("pqcb256")(VectorQueries.pqCodebookK(subs, 256).count())
    spark.stop()
  }
}
