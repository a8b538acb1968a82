package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.VectorQueries

/**
 * q_retrieval_ndcg: the in-plan NDCG@10 of the matryoshka two-stage
 * retrieval recomputed entirely on the driver from the raw embedding
 * table — prefix shortlist, exact rerank, both DCG sums — with none of
 * the distributed plan's machinery. Also pins the metric's invariants:
 * 0 < ndcg <= 1, dcg <= idcg, and idcg equals the ideal-ranking DCG.
 */
class RetrievalEvalSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark
  private val sf = GraftSpark.sf

  private def round4(x: Double): Double =
    new java.math.BigDecimal(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

  test("q_retrieval_ndcg matches a full driver recomputation") {
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "embedding")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    val q = vecs.find(_._1 == 0L).get._2
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val corpus = vecs.filter(_._1 != 0L)
    val shortlist = corpus
      .map { case (id, v) => (id, v, round4(cos(v.take(16), q.take(16)))) }
      .sortBy { case (id, _, hc) => (-hc, id) }.take(32)
    val approx = shortlist
      .map { case (id, v, _) => (id, round4(cos(v, q))) }
      .sortBy { case (id, g) => (-g, id) }.take(10)
    val ideal = corpus
      .map { case (id, v) => (id, round4(cos(v, q))) }
      .sortBy { case (id, g) => (-g, id) }.take(10)
    def dcg(ranked: Seq[(Long, Double)]): Double = ranked.zipWithIndex
      .map { case ((_, g), i) =>
        BigDecimal(g * VectorQueries.ndcgDiscounts(i))
          .setScale(12, BigDecimal.RoundingMode.HALF_UP)
      }.sum.toDouble

    val row = VectorQueries.queries("q_retrieval_ndcg")(spark, sf)
      .collect().head
    val (gotDcg, gotIdcg, gotNdcg) =
      (row.getDouble(2), row.getDouble(3), row.getDouble(4))
    val (expDcg, expIdcg) = (dcg(approx), dcg(ideal))
    assert(gotDcg === round4(expDcg), "dcg mismatch")
    assert(gotIdcg === round4(expIdcg), "idcg mismatch")
    assert(gotNdcg === round4(expDcg / expIdcg), "ndcg mismatch")
    assert(gotNdcg > 0.0 && gotNdcg <= 1.0, s"ndcg out of range: $gotNdcg")
    assert(gotDcg <= gotIdcg, "approximate DCG exceeded the ideal")
  }
}
