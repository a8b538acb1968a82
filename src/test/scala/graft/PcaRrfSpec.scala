package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.VectorQueries

/**
 * q_pca_power: full driver-side recompute of the two exact-arithmetic
 * power-iteration steps (BigInt Gram, matrix-vector products, and
 * projections — the same integer-scaled design as the query, so the
 * comparison is exact, not approximate), plus the Rayleigh-quotient
 * growth every power iteration must show.
 *
 * q_hybrid_retrieval: the RRF arithmetic re-derived from the reported
 * ranks, leg-membership sanity, and rerun determinism.
 */
class PcaRrfSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark
  private val sf = GraftSpark.sf

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sf)

  test("q_pca_power matches an exact BigInt driver-side recompute") {
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(e => BigInt(math.round(e.toDouble * 1000))).toArray))
    val dim = 64
    // G = X'X, exact
    val g = Array.fill(dim, dim)(BigInt(0))
    vecs.foreach { case (_, x) =>
      var i = 0
      while (i < dim) {
        var j = 0
        while (j < dim) { g(i)(j) += x(i) * x(j); j += 1 }
        i += 1
      }
    }
    val v1 = (0 until dim).map(i => g(i).sum).toArray
    val v2 = (0 until dim).map(i =>
      (0 until dim).map(j => g(i)(j) * v1(j)).sum).toArray
    val proj = vecs.map { case (id, x) =>
      (id, (0 until dim).map(i => x(i) * v2(i)).sum)
    }
    val m = proj.map(_._2.abs).max
    assert(m > 0)
    val expected = proj
      .map { case (id, p) =>
        val rel = BigDecimal(BigDecimal(p).toDouble / BigDecimal(m).toDouble)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        (id, rel)
      }
      .sortBy { case (id, rel) => (-math.abs(rel), id) }
      .take(10).toSeq
    val got = run("q_pca_power").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got === expected)
    // power iteration moves the Rayleigh quotient up: r(v2) >= r(v1)
    // (exact rational comparison via cross-multiplication)
    def rayleighNumDen(v: Array[BigInt]): (BigInt, BigInt) = {
      val gv = (0 until dim).map(i => (0 until dim).map(j => g(i)(j) * v(j)).sum)
      val num = (0 until dim).map(i => v(i) * gv(i)).sum
      val den = v.map(x => x * x).sum
      (num, den)
    }
    val (n1, d1) = rayleighNumDen(v1.map(identity))
    val (n2, d2) = rayleighNumDen(v2)
    assert(n2 * d1 >= n1 * d2, "Rayleigh quotient must not decrease")
  }

  test("q_hybrid_retrieval: RRF arithmetic, leg membership, determinism") {
    val rows = run("q_hybrid_retrieval").collect()
    assert(rows.length === 10)
    rows.foreach { r =>
      val rs = if (r.isNullAt(2)) None else Some(r.getLong(2))
      val rd = if (r.isNullAt(3)) None else Some(r.getLong(3))
      assert(rs.nonEmpty || rd.nonEmpty)
      (rs ++ rd).foreach(rank => assert(rank >= 1 && rank <= 20))
      val expect = (rs ++ rd).map(rank => math.round(1e9 / (60 + rank))).sum
      assert(r.getLong(1) === expect, s"rrf_e9 mismatch for doc ${r.getLong(0)}")
    }
    // the dense leg's #1 (exact brute-force top cosine) must be fused in
    val brute1 = run("q_knn_brute").collect().head.getLong(0)
    val fusedDense = rows.filter(!_.isNullAt(3)).map(r => (r.getLong(0), r.getLong(3)))
    assert(fusedDense.contains((brute1, 1L)),
      s"dense rank-1 $brute1 missing from fusion: ${fusedDense.toSeq}")
    // descending fused order with id tie-break
    val scores = rows.map(r => (r.getLong(1), r.getLong(0)))
    assert(scores.sortBy { case (s2, id) => (-s2, id) }.toSeq === scores.toSeq)
    val rerun = run("q_hybrid_retrieval").collect().map(_.toSeq).toSeq
    assert(rerun === rows.map(_.toSeq).toSeq)
  }
}
