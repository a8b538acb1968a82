package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.VectorQueries

/**
 * 8-bit Product-Quantization ANN (q_knn_pq8, round 13): the k=256
 * production codebook. Pins the planted-cluster floor, the adaptive
 * codebook size, the hash-order seed sample's determinism, and the
 * gate row itself.
 */
class Pq8Spec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark
  private val sf = GraftSpark.sf

  test("pq8 top-10 recall@10 vs brute force clears the pinned floor") {
    // same pigeonhole contract as q_knn_pq: both top-10s all-planted,
    // so |approx ∩ exact| ≥ 8 is a guarantee, not a measurement
    val approx = VectorQueries.pq8Top10(spark, sf, planted = true)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val brute = VectorQueries.bruteTop10(spark, sf, planted = true)
      .collect().map(_.getLong(0)).toSet
    val recall = (approx & brute).size
    info(s"pq8 PLANTED recall@10 = $recall/10 at $sf")
    assert(approx.forall(_ > 9200000L), s"approx top-10 not all-planted: $approx")
    assert(recall >= 8, s"recall $recall under the pinned floor 8")
  }

  test("pq8 gate row is deterministic and true") {
    val rows = SparkEntry.queries("q_knn_pq8")(spark, sf).collect()
    assert(rows.length == 1 && rows(0).getBoolean(3),
      s"recall_ok must hold: ${rows.toSeq}")
    val again = SparkEntry.queries("q_knn_pq8")(spark, sf).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("codebook size adapts to min(256, n-1) and every centroid is 8-dim") {
    val subs = VectorQueries.pqSubs(spark, sf, planted = true).localCheckpoint()
    val n = subs.count() / 8 - 1 // vectors excluding the query
    val k = math.min(256L, n).toInt
    val cb = VectorQueries.pqCodebookK(subs, k)
    val perSub = cb.groupBy("sub").agg(
        countDistinct("cid").as("n_codes"), max("cid").as("max_cid"))
      .collect()
    assert(perSub.length == 8, s"expected 8 subspaces, got ${perSub.length}")
    perSub.foreach { r =>
      // the Lloyd step can only drop EMPTY codes, never invent ids
      assert(r.getLong(1) <= k && r.getLong(1) >= k / 2,
        s"sub ${r.get(0)}: ${r.getLong(1)} codes vs k=$k — seed sample degenerate")
      assert(r.getInt(2) < k, s"cid ${r.getInt(2)} out of the seed-rank range")
    }
    val badDims = cb.filter(size(col("cv")) =!= 8).count()
    assert(badDims == 0, s"$badDims centroids not 8-dim")
  }

  test("hash-order seed sample is id-layout-independent (same ids, any insert order)") {
    // the seed RELATION (vec_id, cid) must be a pure function of the id
    // SET — rebuilding the codebook from a reshuffled subs relation
    // yields the identical codebook, which is what makes the trained
    // index reproducible on any cluster/partitioning (the kmRun rule)
    val subs = VectorQueries.pqSubs(spark, sf, planted = true).localCheckpoint()
    val k = math.min(256L, subs.count() / 8 - 1).toInt
    val a = VectorQueries.pqCodebookK(subs, k)
      .orderBy("sub", "cid").collect().map(_.toString).toSeq
    val b = VectorQueries.pqCodebookK(subs.repartition(7, col("sub")), k)
      .orderBy("sub", "cid").collect().map(_.toString).toSeq
    assert(a == b, "codebook depends on the physical layout of its input")
  }

  test("k=256 assignment distances are tie-free (argmin well-defined)") {
    // same contract as PqSpec's tie-free test: min_by(cid, d2) stays a
    // HashAggregate only with a DOUBLE ordering key (a struct key
    // demotes the encode to SortAggregate — measured round 13), so
    // determinism rests on no subvector being equidistant to two codes
    // of either codebook that argmins in the pq8 pipeline
    import org.apache.spark.sql.expressions.Window
    val subs = VectorQueries.pqSubs(spark, sf, planted = true).localCheckpoint()
    val k = math.min(256L, subs.count() / 8 - 1).toInt
    // the SHIPPED seed builder (not a reimplementation): the assertion
    // must cover the codebook the pipeline actually argmins against
    val literalSeed = subs.join(broadcast(VectorQueries.pqSeedIds(subs, k)), "vec_id")
      .select(col("sub"), col("cid"), col("sv").as("cv"))
    val d2 = graft.functions.vec_dot(col("sv"), col("sv")) +
      graft.functions.vec_dot(col("cv"), col("cv")) -
      lit(2.0) * graft.functions.vec_dot(col("sv"), col("cv"))
    val w = Window.partitionBy("vec_id", "sub")
    // every codebook ANY pq8 path argmins against (ADVICE r13): Lloyd
    // step r assigns against the step r−1 codebook and the probe's
    // pq8_s3 row runs steps = 3, so the guarantee must hold for the
    // seed and each of steps 1..3 — not just the shipped 1-step default
    val refinedSteps = (1 to 3).map(st =>
      s"refined_s$st" -> VectorQueries.pqCodebookK(subs, k, steps = st))
    for ((label, cb) <- ("seed" -> literalSeed) +: refinedSteps) {
      val ties = subs.join(broadcast(cb), "sub")
        .select(col("vec_id"), col("sub"), d2.as("d2"))
        .withColumn("mind2", min("d2").over(w))
        .filter(col("d2") === col("mind2"))
        .groupBy("vec_id", "sub").agg(count(lit(1)).as("n_min"))
        .filter(col("n_min") > 1)
      assert(ties.count() == 0,
        s"$label k=$k codebook: duplicate argmin distance — assignment ambiguous")
    }
  }

  test("pq8 top-10 matches a full driver-side recomputation") {
    // independent reimplementation of the 8-bit pipeline: hash-order
    // seed sample -> one decimal-exact Lloyd step -> encode -> ADC
    // shortlist(64) -> exact rerank -> top-10. Mirrors the plan's
    // arithmetic step for step (the PqSpec differential applied to the
    // k=256 codebook; argmin ties broken (d2, cid) — the shipped
    // corpora are tie-free so this equals the plan's min_by).
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
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
    def r4(x: Double): Double =
      java.math.BigDecimal.valueOf(x).setScale(4, java.math.RoundingMode.HALF_UP).doubleValue
    // seed = the k smallest non-query ids under (xxhash64, vec_id) —
    // the exact order Column xxhash64(lit("pq8seed"), vec_id) computes
    // (Spark's default seed 42)
    val k = math.min(256, emb.size - 1)
    def h(id: Long): Long =
      XxHash64(Seq(Literal("pq8seed"), Literal(id)), 42L).eval(null).asInstanceOf[Long]
    val seedIds = emb.keys.filter(_ != 0L).toSeq
      .sortBy(id => (h(id), id)).take(k)
    var codebook: Map[Int, Map[Int, Array[Double]]] = (0 until 8).map { s =>
      s -> seedIds.zipWithIndex.map { case (id, i) => i -> sub(emb(id), s) }.toMap
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
    val scored = emb.toSeq.filter(_._1 != 0L).map { case (id, v) =>
      val adot = (0 until 8).map { s =>
        dot(sub(q, s), codebook(s)(argmin(sub(v, s), codebook(s))))
      }.sum
      (id, r4(adot / math.sqrt(dot(v, v) * qn2)))
    }
    // adaptive shortlist depth — mirror the shipped round-15
    // error-calibrated rule (see PqSpec's differential for the recipe)
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
      (id, r4(dot(v, q) / (math.sqrt(dot(v, v)) * math.sqrt(qn2))))
    }
    val expected = reranked.sortBy { case (id, cs) => (-cs, id) }.take(10).map(_._1)
    val got = VectorQueries.pq8Top10(spark, sf, planted = true).select("vec_id")
      .collect().map(_.getLong(0)).toSeq
    assert(got == expected, s"driver-side PQ8 differential mismatch:\n got=$got\n exp=$expected")
  }

  test("8-bit codes quantize strictly tighter than 4-bit on the gate corpus") {
    // the reason q_knn_pq8 exists: mean squared reconstruction error of
    // the k=min(256,n-1) codebook must undercut the k=16 one. On the
    // gate corpus the 8-bit codebook has ~a code per vector, so this is
    // a sanity floor rather than the clustered-corpus measurement
    // (BASELINE §rerank-depth carries that one).
    val subs = VectorQueries.pqSubs(spark, sf, planted = true).localCheckpoint()
    val k = math.min(256L, subs.count() / 8 - 1).toInt
    def mse(cb: org.apache.spark.sql.DataFrame): Double = {
      val d2 = graft.functions.vec_dot(col("sv"), col("sv")) +
        graft.functions.vec_dot(col("cv"), col("cv")) -
        lit(2.0) * graft.functions.vec_dot(col("sv"), col("cv"))
      subs.join(broadcast(cb), "sub")
        .groupBy("vec_id", "sub").agg(min(d2).as("mind2"))
        .agg(avg("mind2")).head().getDouble(0)
    }
    val mse16 = mse(VectorQueries.pqCodebook(subs))
    val mse256 = mse(VectorQueries.pqCodebookK(subs, k))
    info(f"reconstruction MSE: k=16 $mse16%.6f  k=$k $mse256%.6f")
    assert(mse256 < mse16,
      f"8-bit codebook no tighter than 4-bit ($mse256%.6f >= $mse16%.6f)")
  }
}
