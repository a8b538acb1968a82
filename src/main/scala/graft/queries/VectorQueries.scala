package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions._

/**
 * Similarity search over embeddings (SURVEY.md §2j).
 *
 * Brute-force cosine top-k is the exact baseline (✦, DuckDB-checkable
 * with identical double arithmetic). The IVF variant is the scale path:
 * centroids are computed distributedly (posexplode + per-dimension avg),
 * the query probes only its nearest cell — at 100 TB the full scan
 * becomes a cell-pruned scan, the same plan shape as a real IVF index.
 */
object VectorQueries {

  type Q = (SparkSession, String) => DataFrame

  /** The fixed query vector: embedding of vec_id 0 (1-row broadcast). */
  private def queryVec(s: SparkSession, d: String) =
    Tables.embeddings(s, d).filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"))

  val queries: Map[String, Q] = Map(

    "q_knn_brute" -> ((s, d) => {
      val emb = Tables.embeddings(s, d).filter(col("vec_id") =!= 0)
      emb.crossJoin(broadcast(queryVec(s, d)))
        .select(col("vec_id"),
          round(cosine_sim(col("embedding"), col("qv")), 4).as("cos_sim"))
        .orderBy(col("cos_sim").desc, col("vec_id"))
        .limit(10)
    }),

    // IVF-style ANN: 1) per-label centroids via posexplode + avg,
    // 2) the nProbe centroids nearest the query, 3) brute-force inside
    // those cells only (multiprobe — the standard recall dial: nProbe=1
    // misses neighbors that fall just across a cell boundary)
    "q_knn_ivf" -> ((s, d) => {
      val nProbe = 2
      val emb = Tables.embeddings(s, d)
      val centroids = emb
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy("label", "pos").agg(avg("v").as("c"))
        .groupBy("label")
        .agg(array_sort(collect_list(struct(col("pos"), col("c")))).as("pc"))
        .select(col("label"), transform(col("pc"), x => x.getField("c")).as("centroid"))
      val best = centroids.crossJoin(broadcast(queryVec(s, d)))
        .select(col("label"), cosine_sim(col("centroid"), col("qv")).as("csim"))
        .orderBy(col("csim").desc, col("label")).limit(nProbe)
        .select(col("label").as("best_label"))
      emb.filter(col("vec_id") =!= 0)
        .join(broadcast(best), col("label") === col("best_label"))
        .crossJoin(broadcast(queryVec(s, d)))
        .select(col("vec_id"),
          round(cosine_sim(col("embedding"), col("qv")), 4).as("cos_sim"))
        .orderBy(col("cos_sim").desc, col("vec_id"))
        .limit(10)
    }),

    // embedding-space near-dup detection, label-blocked (the blocking
    // replaces all-pairs: at scale this is a shuffle join on the cell key).
    // Pairwise dot products run as a posexplode + equi-join + hash
    // aggregate — codegen'd and shuffle-parallel on (label, pos) — instead
    // of an interpreted per-pair zip_with; per-vector norms (cheap, one
    // per vector) keep the exact cosine arithmetic of cosine_sim().
    "q_embed_neardup" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"), col("label"), col("embedding"))
      val norms = emb.select(col("vec_id"), vec_norm(col("embedding")).as("nrm"))
      val dims = emb.select(col("vec_id"), col("label"),
        posexplode(col("embedding")).as(Seq("pos", "v")))
      val a = dims.toDF("id_a", "label", "pos", "v_a")
      val b = dims.toDF("id_b", "label", "pos", "v_b")
      val dots = a.join(b, Seq("label", "pos"))
        .filter(col("id_a") < col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(sum(col("v_a").cast("double") * col("v_b").cast("double")).as("dot"))
      dots
        .join(norms.toDF("id_a", "n_a"), "id_a")
        .join(norms.toDF("id_b", "n_b"), "id_b")
        .select(col("id_a"), col("id_b"),
          round(col("dot") / (col("n_a") * col("n_b")), 4).as("cos_sim"))
        .filter(col("cos_sim") >= 0.9)
        .orderBy("id_a", "id_b")
    }),

    // Random-hyperplane LSH ANN (multi-table): L=12 tables × P=4 sign bits
    // (tuned for the demo corpus where true neighbors are only moderately
    // similar — m^P per table must stay high enough; P and L are THE
    // recall/cost dials of LSH).
    // Hyperplane components are derived deterministically from xxhash64
    // (plane id, dimension) — no stored model, reproducible everywhere.
    // Candidates = vectors sharing the query's bucket in ANY table
    // (P[captured] ≈ 1-(1-m^P)^L for per-bit match m), then exact cosine
    // on candidates only. At 100 TB: the bucket join is a shuffle
    // equi-join on (table, bucket); nothing is all-pairs.
    "q_knn_lsh" -> ((s, d) => {
      val L = 12; val P = 4
      val emb = Tables.embeddings(s, d)
      // per (vec, plane) dot product: posexplode + per-dim pseudo-random
      // hyperplane component in [-1,1), codegen'd end-to-end
      val planeIds = (0 until L * P).map(lit(_))
      val dims = emb.select(col("vec_id"),
        posexplode(col("embedding")).as(Seq("pos", "v")))
      val proj = dims
        .select(col("vec_id"), col("v"), col("pos"),
          explode(array(planeIds: _*)).as("plane"))
        .withColumn("h",
          pmod(xxhash64(col("plane"), col("pos")), lit(1000000L)) / 500000.0 - 1.0)
        .groupBy("vec_id", "plane")
        .agg(sum(col("v") * col("h")).as("dot"))
      // per (vec, table) bucket: P sign bits packed into one long
      val buckets = proj
        .withColumn("t", (col("plane") / P).cast("int"))
        .withColumn("bit", (col("plane") % P).cast("int"))
        .groupBy("vec_id", "t")
        .agg(sum(when(col("dot") > 0,
          expr("shiftleft(1L, bit)")).otherwise(lit(0L))).as("bucket"))
      val qb = buckets.filter(col("vec_id") === 0)
        .select(col("t").as("qt"), col("bucket").as("qbucket"))
      val candidates = buckets.filter(col("vec_id") =!= 0)
        .join(broadcast(qb),
          col("t") === col("qt") && col("bucket") === col("qbucket"))
        .select("vec_id").distinct()
      emb.filter(col("vec_id") =!= 0)
        .join(candidates, "vec_id")
        .crossJoin(broadcast(queryVec(s, d)))
        .select(col("vec_id"),
          round(cosine_sim(col("embedding"), col("qv")), 4).as("cos_sim"))
        .orderBy(col("cos_sim").desc, col("vec_id"))
        .limit(10)
    }),

    // int8-quantized brute force: the memory-bandwidth variant. Codes are
    // 4× smaller than float32 (BinaryType, 1 B/dim), the probe loop is a
    // codegen'd integer dot product, and with a shared scale the quantized
    // cosine ranks without dequantizing. ◇ (quantization isn't DuckDB-
    // expressible); recall vs the exact top-k is pinned in FunctionsSpec.
    "q_knn_quantized" -> ((s, d) => {
      val scale = lit(200.0)
      val emb = Tables.embeddings(s, d).filter(col("vec_id") =!= 0)
        .select(col("vec_id"), vec_quantize_i8(col("embedding"), scale).as("code"))
      val qv = Tables.embeddings(s, d).filter(col("vec_id") === 0)
        .select(vec_quantize_i8(col("embedding"), scale).as("qcode"))
      emb.crossJoin(broadcast(qv))
        .select(col("vec_id"),
          round(cosine_sim_i8(col("code"), col("qcode")), 4).as("qcos"))
        .orderBy(col("qcos").desc, col("vec_id"))
        .limit(10)
    }),

    "q_vector_stats" -> ((s, d) => Tables.embeddings(s, d)
      .groupBy("label")
      .agg(count(lit(1)).as("n"),
        round(avg(vec_norm(col("embedding"))), 4).as("avg_norm"),
        round(avg(element_at(col("embedding"), 1)), 4).as("avg_c0"))
      .orderBy("label")))

  val oracleSql: Map[String, String] = Map(
    "q_knn_brute" ->
      """SELECT e.vec_id,
        |  round(list_dot_product(e.embedding::DOUBLE[], q.qv::DOUBLE[]) /
        |    (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
        |     sqrt(list_dot_product(q.qv::DOUBLE[], q.qv::DOUBLE[]))), 4) AS cos_sim
        |FROM embeddings e,
        |     (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) q
        |WHERE e.vec_id <> 0
        |ORDER BY cos_sim DESC, e.vec_id LIMIT 10""".stripMargin,

    "q_embed_neardup" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
        |    (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
        |     sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 4) AS cos_sim
        |FROM embeddings a JOIN embeddings b
        |  ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
        |    (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
        |     sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 4) >= 0.9
        |ORDER BY 1, 2""".stripMargin,

    "q_vector_stats" ->
      """SELECT label, count(*) AS n,
        |  round(avg(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))), 4)
        |    AS avg_norm,
        |  round(avg(embedding[1]), 4) AS avg_c0
        |FROM embeddings GROUP BY 1 ORDER BY 1""".stripMargin)
}
