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
    // the gate corpus (planted cluster): floor 8 must hold, and the
    // pigeonhole precondition — BOTH top-10s drawn entirely from the 12
    // plants — must hold too, which is what makes 8 a guarantee rather
    // than a measurement
    val approx = VectorQueries.pqTop10(spark, sf, planted = true)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val brute = VectorQueries.bruteTop10(spark, sf, planted = true)
      .collect().map(_.getLong(0)).toSet
    val recall = (approx & brute).size
    info(s"pq PLANTED recall@10 = $recall/10 at $sf")
    assert(approx.forall(_ > 9200000L), s"approx top-10 not all-planted: $approx")
    assert(brute.forall(_ > 9200000L), s"exact top-10 not all-planted: $brute")
    assert(recall >= 8, s"recall $recall under the pinned floor 8")
    // raw corpus: the honest no-cluster-structure number stays measured
    val rawApprox = VectorQueries.pqTop10(spark, sf).select("vec_id")
    val rawRecall = rawApprox.join(VectorQueries.bruteTop10(spark, sf), "vec_id").count()
    info(s"pq RAW recall@10 = $rawRecall/10 at $sf")
    assert(rawRecall >= 2, s"raw recall $rawRecall collapsed below the documented 2")
  }

  test("pq gate row is deterministic and true") {
    val rows = SparkEntry.queries("q_knn_pq")(spark, sf).collect()
    assert(rows.length == 1 && rows(0).getBoolean(3),
      s"recall_ok must hold: ${rows.toSeq}")
  }

  test("per-subspace assignment distances are tie-free (argmin well-defined)") {
    import org.apache.spark.sql.expressions.Window
    // rebuild the assignment relation the way pqCodebook/encode see it,
    // against BOTH codebooks that argmin anywhere in the pipeline: the
    // SEED (vec_ids 1..16 — drives the Lloyd-step assignment) and the
    // post-Lloyd REFINED codebook (drives the production encode that
    // pqTop10 joins) — a tie in either would leave min_by free to pick an
    // arbitrary code and make the gate/differential plan-dependent
    val subs = VectorQueries.pqSubs(spark, sf, planted = true)
    val seed = subs.filter(col("vec_id").between(1, 16))
      .select(col("sub"), (col("vec_id") - 1).cast("int").as("cid"), col("sv").as("cv"))
    val refined = VectorQueries.pqCodebook(subs)
    val d2 = vec_dot_sql(col("sv"), col("sv")) +
      vec_dot_sql(col("cv"), col("cv")) - lit(2.0) * vec_dot_sql(col("sv"), col("cv"))
    val w = Window.partitionBy("vec_id", "sub")
    for ((label, cb) <- Seq("seed" -> seed, "refined" -> refined)) {
      val ties = subs.join(broadcast(cb), "sub")
        .select(col("vec_id"), col("sub"), d2.as("d2"))
        .withColumn("mind2", min("d2").over(w))
        .filter(col("d2") === col("mind2"))
        .groupBy("vec_id", "sub").agg(count(lit(1)).as("n_min"))
        .filter(col("n_min") > 1)
      assert(ties.count() == 0,
        s"$label codebook: duplicate argmin distance found — assignment ambiguous")
    }
  }

  private def vec_dot_sql(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    graft.functions.vec_dot(a, b)

  test("pq top-10 matches a full driver-side recomputation") {
    // independent reimplementation: subvectors → seeded assignment →
    // decimal-exact re-estimation → encode → ADC cosine → ranked top-10.
    // Mirrors the plan's arithmetic step for step (per-dim HALF_UP
    // decimal(20,10) rounding before the centroid sum, in-order dot
    // products, 4-decimal HALF_UP rounding before the rank).
    // the gate corpus: raw scan ∪ planted cluster, collected from the
    // same relation the plan reads so the float-cast plants are
    // bit-identical on both sides
    val emb = VectorQueries.plantedEmb(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def sub(v: Array[Double], s: Int): Array[Double] = v.slice(s * 8, s * 8 + 8)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def d2(a: Array[Double], c: Array[Double]): Double =
      dot(a, a) + dot(c, c) - 2.0 * dot(a, c)
    def argmin(sv: Array[Double], cb: Map[Int, Array[Double]]): Int =
      cb.toSeq.map { case (cid, cv) => (d2(sv, cv), cid) }.min._2
    // seed: subvectors of vec_ids 1..16
    var codebook: Map[Int, Map[Int, Array[Double]]] = (0 until 8).map { s =>
      s -> (1 to 16).map(id => (id - 1) -> sub(emb(id), s)).toMap
    }.toMap
    // one Lloyd step with decimal(20,10)-rounded per-dim sums
    val assigned = emb.toSeq.flatMap { case (id, v) =>
      (0 until 8).map(s => (s, argmin(sub(v, s), codebook(s)), sub(v, s)))
    }
    codebook = assigned.groupBy(t => (t._1, t._2)).map { case ((s, cid), rows) =>
      val n = rows.size
      val cv = (0 until 8).map { pos =>
        rows.map(r => java.math.BigDecimal.valueOf(r._3(pos))
            .setScale(10, java.math.RoundingMode.HALF_UP))
          .reduce(_ add _).doubleValue / n
      }.toArray
      (s, cid, cv)
    }.groupBy(_._1).map { case (s, m) => s -> m.map(t => t._2 -> t._3).toMap }
    // encode + ADC against the query vector (vec_id 0)
    val q = emb(0L)
    val qn2 = dot(q, q)
    def r4(x: Double): Double =
      java.math.BigDecimal.valueOf(x).setScale(4, java.math.RoundingMode.HALF_UP).doubleValue
    val scored = emb.toSeq.filter(_._1 != 0L).map { case (id, v) =>
      val adot = (0 until 8).map { s =>
        dot(sub(q, s), codebook(s)(argmin(sub(v, s), codebook(s))))
      }.sum
      (id, r4(adot / math.sqrt(dot(v, v) * qn2)))
    }
    // stage 1: ADC shortlist at the ADAPTIVE depth — mirror the shipped
    // flat-PQ rule (round 15, error-calibrated observed ambiguity):
    // eps = max |cos_exact − cos_adc| over the ADC-top-64 sample,
    // champion = the sample's 10th-best exact cosine (both UNrounded
    // exact, like cosine_sim in-plan), depth = clamp(64, 512,
    // #candidates with rounded cos_adc ≥ champion − eps); stage 2
    // (round 13): exact-cosine rerank — mirrors pqTop10's plan
    def exactCos(id: Long): Double = {
      val v = emb(id)
      dot(v, q) / (math.sqrt(dot(v, v)) * math.sqrt(qn2))
    }
    val top64 = scored.sortBy { case (id, cs) => (-cs, id) }.take(64)
    val eps = top64.map { case (id, cs) => math.abs(exactCos(id) - cs) }.max
    val exDesc = top64.map { case (id, _) => exactCos(id) }
      .sorted(Ordering[Double].reverse)
    val champion = exDesc(math.min(9, exDesc.size - 1))
    val depth = math.max(64, math.min(512,
      scored.count { case (_, cs) => cs >= champion - eps }))
    val shortlist = scored.sortBy { case (id, cs) => (-cs, id) }.take(depth).map(_._1)
    val reranked = shortlist.map { id =>
      val v = emb(id)
      // cosine_sim divides by sqrt(n2)*sqrt(qn2), not sqrt(n2*qn2)
      (id, r4(dot(v, q) / (math.sqrt(dot(v, v)) * math.sqrt(qn2))))
    }
    val expected = reranked.sortBy { case (id, cs) => (-cs, id) }.take(10).map(_._1)
    val got = VectorQueries.pqTop10(spark, sf, planted = true).select("vec_id")
      .collect().map(_.getLong(0)).toSeq
    assert(got == expected, s"driver-side PQ differential mismatch:\n got=$got\n exp=$expected")
  }
}
