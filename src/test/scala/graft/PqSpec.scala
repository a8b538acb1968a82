package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.VectorQueries

/**
 * Product-Quantization ANN (q_knn_pq): codebook shape, assignment
 * determinism, and the measured recall the pinned floor documents.
 */
class PqSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark
  private val sf = GraftSpark.sf

  test("pq top-10 recall@10 vs brute force clears the pinned floor") {
    val approx = VectorQueries.pqTop10(spark, sf).select("vec_id")
    val brute = VectorQueries.bruteTop10(spark, sf)
    val recall = approx.join(brute, "vec_id").count()
    info(s"pq recall@10 = $recall/10 at $sf")
    assert(recall >= 2, s"recall $recall under the pinned floor")
  }

  test("pq gate row is deterministic and true") {
    val rows = SparkEntry.queries("q_knn_pq")(spark, sf).collect()
    assert(rows.length == 1 && rows(0).getBoolean(2),
      s"recall_ok must hold: ${rows.toSeq}")
  }

  test("per-subspace assignment distances are tie-free (argmin well-defined)") {
    import org.apache.spark.sql.expressions.Window
    // rebuild the assignment relation the way pqCodebook/encode see it:
    // seed centroids from vec_ids 1..16, check no (vec_id, sub) group has
    // two centroids at the exact same squared distance minimum
    val emb = Tables.embeddings(spark, sf)
    val subs = emb.select(col("vec_id"),
        explode(expr("transform(sequence(0, 7), s -> struct(s AS sub, " +
          "transform(slice(embedding, s*8+1, 8), x -> CAST(x AS DOUBLE)) AS sv))")).as("e"))
      .select(col("vec_id"), col("e.sub").as("sub"), col("e.sv").as("sv"))
    val seed = subs.filter(col("vec_id").between(1, 16))
      .select(col("sub"), (col("vec_id") - 1).cast("int").as("cid"), col("sv").as("cv"))
    val d2 = vec_dot_sql(col("sv"), col("sv")) +
      vec_dot_sql(col("cv"), col("cv")) - lit(2.0) * vec_dot_sql(col("sv"), col("cv"))
    val w = Window.partitionBy("vec_id", "sub")
    val ties = subs.join(broadcast(seed), "sub")
      .select(col("vec_id"), col("sub"), d2.as("d2"))
      .withColumn("mind2", min("d2").over(w))
      .filter(col("d2") === col("mind2"))
      .groupBy("vec_id", "sub").agg(count(lit(1)).as("n_min"))
      .filter(col("n_min") > 1)
    assert(ties.count() == 0, "duplicate argmin distance found — assignment ambiguous")
  }

  private def vec_dot_sql(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    graft.functions.vec_dot(a, b)
}
