package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.VectorQueries

/**
 * Adaptive-k floor of the 8-bit PQ path (round 13): a corpus SMALLER
 * than the k=256 codebook must still train (k = min(256, n−1) binds)
 * and, when the rerank shortlist covers the whole corpus, reproduce
 * the exact brute-force ranking — PQ + full-depth exact rerank degrades
 * to exact search, never to an error or an empty result. This is the
 * regime the gate corpora (500 vectors) never exercise.
 */
class Pq8TinyCorpusSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark

  private def writeTiny(n: Int): String = {
    import spark.implicits._
    // under target/ (ADVICE r13: createTempDirectory leaked a /tmp dir
    // per run) — sbt clean owns the lifecycle, overwrite makes reruns safe
    val dir = s"target/pq8tiny-scratch/n$n"
    // deterministic, tie-free float vectors (sin over distinct phases)
    val rows = (0L until n.toLong).map { id =>
      val emb = (0 until 64).map(j => math.sin(id * 64.0 + j + 1.0).toFloat).toArray
      (id, emb, (id % 3).toInt)
    }
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("pq8 on a 7-vector corpus: k binds at n-1, result == brute force") {
    val dir = writeTiny(7)
    val got = VectorQueries.pq8Top10(spark, dir)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val exact = VectorQueries.bruteTop10(spark, dir)
      .collect().map(_.getLong(0)).toSeq
    assert(got == exact,
      s"full-coverage shortlist must reproduce the exact ranking: $got vs $exact")
    assert(got.size == 6, s"6 non-query vectors expected in the top-10: $got")
  }

  test("pq8 on a 2-vector corpus (k=1): degenerate codebook still ranks") {
    val dir = writeTiny(2)
    val got = VectorQueries.pq8Top10(spark, dir)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L), s"the single candidate must survive: $got")
  }
}
