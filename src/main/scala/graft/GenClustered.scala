package graft

import org.apache.spark.sql.SparkSession

/** Dev tool (VERDICT r9→r12 carried stretch): generate an ORGANICALLY
  * CLUSTERED variant of the sf0.01 testdata — same tables, same
  * embeddings schema (vec_id BIGINT, embedding FLOAT[64], label INT),
  * but the 500 vectors are drawn from 10 genuine Gaussian clusters
  * instead of the shipped near-uniform sphere (max background cosine
  * ≈ 0.37, which made RAW ANN recall near-vacuous at 1–3/10: there was
  * no cluster for an index to find). On this set raw recall@10 numbers
  * are meaningful alongside the pigeonhole gates, which stay pinned on
  * the planted cluster and are NOT changed by this tool.
  *
  * Geometry: 10 unit-normalized Gaussian centers (near-orthogonal in
  * 64-d: |cos| ~ 1/√64), 50 members each as center + σ·N(0,1) with
  * σ = 0.045 → member↔member cosine ≈ 1/(1+64σ²) ≈ 0.89, far above
  * the ≈ 0.12 inter-cluster background — the geometry a real embedding
  * corpus has. `label` = the generating cluster, so IVF-family coarse
  * cells see genuine geometric structure. vec_id 0 (the fixed query
  * vector of the ANN family) is a member of cluster 0, so its exact
  * top-10 is entirely in-cluster and recall measures cluster recovery.
  *
  * Determinism: every normal comes from Box–Muller over two
  * xxhash64-derived uniforms (the planeComponent technique — no RNG
  * state, reproducible on any machine/cluster).
  *
  * Usage: `runMain graft.GenClustered [outDir]` (default /tmp/sfc0.01);
  * then `runMain graft.queries.AnnRecallProbe [outDir]` prints the
  * raw-recall table (committed to BASELINE.md §clustered-recall).
  */
object GenClustered {
  private def uniform(seed: Int, a: Int, b: Int): Double = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    val h = XxHash64(Seq(Literal(seed), Literal(a), Literal(b)), 4242L)
      .eval(null).asInstanceOf[Long]
    (Math.floorMod(h, 1000000L) + 0.5) / 1000000.0
  }

  /** Deterministic standard normal via Box–Muller. */
  private def gauss(seed: Int, a: Int, b: Int): Double = {
    val u1 = uniform(seed, a, 2 * b)
    val u2 = uniform(seed, a, 2 * b + 1)
    math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)
  }

  val K = 10          // clusters (matches the shipped label count)
  val PerCluster = 50 // 500 vectors total = the sf0.01 corpus size
  val Dim = 64
  val Sigma = 0.045

  /** The clustered rows, driver-side (they are tiny — the SCALE
    * subject is the index queries, not the generator). `perCluster`
    * scales the cluster SIZE (round 13: measuring the rerank-depth
    * recall curve needs clusters larger than the ADC shortlist). */
  private[graft] def rows(perCluster: Int = PerCluster): Seq[(Long, Array[Float], Int)] = {
    val centers = (0 until K).map { k =>
      val raw = (0 until Dim).map(j => gauss(1000 + k, j, 0))
      val n = math.sqrt(raw.map(x => x * x).sum)
      raw.map(_ / n).toArray
    }
    for (k <- 0 until K; i <- 0 until perCluster) yield {
      val id = (k * perCluster + i).toLong
      val v = (0 until Dim).map(j =>
        (centers(k)(j) + Sigma * gauss(2000 + k, i, j)).toFloat).toArray
      (id, v, k)
    }
  }

  def main(args: Array[String]): Unit = {
    val src = "/root/testdata/sf0.01"
    val out = if (args.length > 0) args(0) else "/tmp/sfc0.01"
    val perCluster = if (args.length > 1) args(1).toInt else PerCluster
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // non-embedding tables copied verbatim so every loader works
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    rows(perCluster).toDF("vec_id", "embedding", "label")
      .repartition(4)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    println(s"[genclustered] done: $out (${K}x$perCluster vectors, sigma=$Sigma)")
    spark.stop()
  }
}
