package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.VectorQueries

/**
 * IVF-PQ ANN (q_knn_ivfpq): the IVFADC composition — coarse cells,
 * per-cell residual PQ codebooks, nProbe-bounded ADC probe. Pins the
 * measured recall the floor documents, argmin well-definedness for both
 * per-cell codebooks, and a full driver-side recomputation of the
 * pipeline (the PqSpec differential applied to the composed index).
 */
class IvfPqSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark
  private val sf = GraftSpark.sf

  test("ivfpq top-10 recall@10 vs brute force clears the pinned floor") {
    // gate corpus (planted cluster): floor 8 + the pigeonhole
    // precondition that BOTH top-10s are all-planted (what upgrades the
    // floor from a measurement to a guarantee)
    val approx = VectorQueries.ivfpqTop10(spark, sf, planted = true)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val brute = VectorQueries.bruteTop10(spark, sf, planted = true)
      .collect().map(_.getLong(0)).toSet
    val recall = (approx & brute).size
    info(s"ivfpq PLANTED recall@10 = $recall/10 at $sf")
    assert(approx.forall(_ > 9200000L), s"approx top-10 not all-planted: $approx")
    assert(brute.forall(_ > 9200000L), s"exact top-10 not all-planted: $brute")
    assert(recall >= 8, s"recall $recall under the pinned floor 8")
    // raw corpus: the honest clusterless-data number stays measured
    val rawRecall = VectorQueries.ivfpqTop10(spark, sf).select("vec_id")
      .join(VectorQueries.bruteTop10(spark, sf), "vec_id").count()
    info(s"ivfpq RAW recall@10 = $rawRecall/10 at $sf")
    assert(rawRecall >= 1, s"raw recall $rawRecall collapsed below the documented 1")
  }

  test("ivfpq gate row is deterministic and true") {
    val rows = SparkEntry.queries("q_knn_ivfpq")(spark, sf).collect()
    assert(rows.length == 1 && rows(0).getBoolean(3),
      s"recall_ok must hold: ${rows.toSeq}")
  }

  test("ivfpq8 (k=256 residual codebooks) clears the same planted floor") {
    // the production IVFADC setting (round 13): unbiased ADC + per-cell
    // 8-bit residual codes — the §rerank-depth matrix winner
    val approx = VectorQueries.ivfpqTop10(spark, sf, planted = true, kCodes = 256)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val brute = VectorQueries.bruteTop10(spark, sf, planted = true)
      .collect().map(_.getLong(0)).toSet
    val recall = (approx & brute).size
    info(s"ivfpq8 PLANTED recall@10 = $recall/10 at $sf")
    assert(approx.forall(_ > 9200000L), s"approx top-10 not all-planted: $approx")
    assert(recall >= 8, s"recall $recall under the pinned floor 8")
    val rows = SparkEntry.queries("q_knn_ivfpq8")(spark, sf).collect()
    assert(rows.length == 1 && rows(0).getBoolean(3),
      s"recall_ok must hold: ${rows.toSeq}")
  }

  test("the probe honors the nProbe cell prune, and nProbe dials coverage") {
    // pruning correctness: every returned candidate must live in one of
    // the nProbe probed cells (the partition-prune property the 100 TB
    // probe cost model rests on) — checked by recomputing the probed
    // cells from the same centroid relation the plan ranks; run over the
    // gate corpus (planted cluster), whose label-999 cell should win
    val emb = VectorQueries.plantedEmb(spark, sf)
    val cells = VectorQueries.ivfpqCells(emb)
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val ranked = cells.crossJoin(broadcast(q))
      .select(col("cell"), graft.functions.cosine_sim(col("centroid"), col("qv")).as("cs"))
      .orderBy(col("cs").desc, col("cell"))
      .collect().map(_.getInt(0)).toSeq
    assert(ranked.head === 999,
      s"the planted cell must rank first for the query, got $ranked")
    val cellOf = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    for (np <- Seq(1, 2)) {
      val ids = VectorQueries.ivfpqTop10(spark, sf, nProbe = np, planted = true)
        .select("vec_id").collect().map(_.getLong(0)).toSeq
      val allowed = ranked.take(np).toSet
      assert(ids.nonEmpty && ids.forall(id => allowed.contains(cellOf(id))),
        s"nProbe=$np returned a candidate outside the probed cells $allowed")
    }
  }

  test("per-cell assignment distances are tie-free against seed and refined codebooks") {
    import org.apache.spark.sql.expressions.Window
    val emb = VectorQueries.plantedEmb(spark, sf)
    val cells = VectorQueries.ivfpqCells(emb).localCheckpoint()
    val rsubs = VectorQueries.ivfpqResidualSubs(emb, cells).localCheckpoint()
    val w = Window.partitionBy("cell", "sub").orderBy("vec_id")
    val seed = rsubs
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 16)
      .select(col("cell"), col("sub"), (col("rk") - 1).cast("int").as("cid"),
        col("sv").as("cv"))
    val refined = VectorQueries.ivfpqCodebook(rsubs)
    val d2 = graft.functions.vec_dot(col("sv"), col("sv")) +
      graft.functions.vec_dot(col("cv"), col("cv")) -
      lit(2.0) * graft.functions.vec_dot(col("sv"), col("cv"))
    val wv = Window.partitionBy("vec_id", "cell", "sub")
    for ((label, cb) <- Seq("seed" -> seed, "refined" -> refined)) {
      val ties = rsubs.join(broadcast(cb), Seq("cell", "sub"))
        .select(col("vec_id"), col("cell"), col("sub"), d2.as("d2"))
        .withColumn("mind2", min("d2").over(wv))
        .filter(col("d2") === col("mind2"))
        .groupBy("vec_id", "cell", "sub").agg(count(lit(1)).as("n_min"))
        .filter(col("n_min") > 1)
      assert(ties.count() == 0,
        s"$label codebook: duplicate argmin distance — assignment ambiguous")
    }
  }

  test("ivfpq top-10 matches a full driver-side recomputation") {
    // independent reimplementation of the whole composed pipeline:
    // decimal-exact coarse centroids → residual subvectors → 16-lowest-id
    // seed per cell → one decimal-exact Lloyd step → encode → nProbe cell
    // selection → dot(q,c) + residual ADC → cosine with stored norms →
    // ranked top-10. Mirrors the plan's arithmetic step for step
    // (HALF_UP decimal(20,10) per-dim sums, in-order dot products,
    // 4-decimal HALF_UP rounding before the rank).
    // gate corpus: raw scan ∪ planted cluster, collected from the same
    // relation the plan reads (float-cast plants bit-identical)
    val rows = VectorQueries.plantedEmb(spark, sf)
      .select("vec_id", "label", "embedding").collect()
    val emb = rows.map(r => r.getLong(0) ->
      r.getSeq[Float](2).map(_.toDouble).toArray).toMap
    val cellOf = rows.map(r => r.getLong(0) -> r.getInt(1)).toMap
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def d2(a: Array[Double], c: Array[Double]): Double =
      dot(a, a) + dot(c, c) - 2.0 * dot(a, c)
    def decMean(vs: Seq[Double]): Double =
      vs.map(java.math.BigDecimal.valueOf(_)
          .setScale(10, java.math.RoundingMode.HALF_UP))
        .reduce(_ add _).doubleValue / vs.size
    def r4(x: Double): Double =
      java.math.BigDecimal.valueOf(x).setScale(4, java.math.RoundingMode.HALF_UP).doubleValue
    // coarse centroids (decimal-exact per-dim means over each cell)
    val byCell = emb.keys.groupBy(cellOf)
    val centroid: Map[Int, Array[Double]] = byCell.map { case (c, ids) =>
      c -> (0 until 64).map(p => decMean(ids.toSeq.map(emb(_)(p)))).toArray
    }
    // residual subvectors
    def rsub(id: Long, s: Int): Array[Double] = {
      val v = emb(id); val c = centroid(cellOf(id))
      (s * 8 until s * 8 + 8).map(i => v(i) - c(i)).toArray
    }
    // seed = 16 lowest-id members per cell; one decimal-exact Lloyd step
    def argmin(sv: Array[Double], cb: Map[Int, Array[Double]]): Int =
      cb.toSeq.map { case (cid, cv) => (d2(sv, cv), cid) }.min._2
    var codebook: Map[(Int, Int), Map[Int, Array[Double]]] = byCell.flatMap {
      case (c, ids) =>
        val seeds = ids.toSeq.sorted.take(16)
        (0 until 8).map(s =>
          (c, s) -> seeds.zipWithIndex.map { case (id, k) => k -> rsub(id, s) }.toMap)
    }.toMap
    val assigned = emb.keys.toSeq.flatMap { id =>
      val c = cellOf(id)
      (0 until 8).map(s => (c, s, argmin(rsub(id, s), codebook((c, s))), rsub(id, s)))
    }
    codebook = assigned.groupBy(t => (t._1, t._2, t._3)).map { case ((c, s, cid), g) =>
      (c, s, cid, (0 until 8).map(p => decMean(g.map(_._4(p)))).toArray)
    }.groupBy(t => (t._1, t._2))
      .map { case (k, m) => k -> m.map(t => t._3 -> t._4).toMap }
    // probe: nProbe best cells by exact cosine of centroid vs query
    val q = emb(0L)
    val qn2 = dot(q, q)
    val probed = centroid.toSeq.map { case (c, cv) =>
      (dot(cv, q) / (math.sqrt(dot(cv, cv)) * math.sqrt(qn2)), c)
    }.sortBy { case (cs, c) => (-cs, c) }.take(2).map(_._2)
    // score candidates in probed cells: dot(q, c) + residual ADC
    val scored = emb.keys.toSeq
      .filter(id => id != 0L && probed.contains(cellOf(id)))
      .map { id =>
        val c = cellOf(id)
        val qcDot = dot(q, centroid(c))
        // unbiased IP-ADC (round 13): the QUERY's subvectors against the
        // residual codewords — q·c + Σ q_s·cv = q·recon(v)
        val radot = (0 until 8).map { s =>
          val cv = codebook((c, s))(argmin(rsub(id, s), codebook((c, s))))
          dot(q.slice(s * 8, s * 8 + 8), cv)
        }.sum
        val v = emb(id)
        (id, r4((qcDot + radot) / math.sqrt(dot(v, v) * qn2)))
      }
    // stage 1: ADC shortlist at the ADAPTIVE depth (round 14 — mirror
    // the shipped IVFPQ rule clamp(64, 512, Σ probed-cell occupancy),
    // which resolves to the 64 floor on the gate corpus: 50 + 12 = 62);
    // stage 2 (round 13): exact rerank — mirrors ivfpqTop10's plan
    val probedOcc = emb.keys.count(id => probed.contains(cellOf(id)))
    val depth = math.max(64, math.min(512, probedOcc))
    val shortlist = scored.sortBy { case (id, cs) => (-cs, id) }.take(depth).map(_._1)
    val reranked = shortlist.map { id =>
      val v = emb(id)
      // cosine_sim divides by sqrt(n2)*sqrt(qn2), not sqrt(n2*qn2)
      (id, r4(dot(v, q) / (math.sqrt(dot(v, v)) * math.sqrt(qn2))))
    }
    val expected = reranked.sortBy { case (id, cs) => (-cs, id) }.take(10).map(_._1)
    val got = VectorQueries.ivfpqTop10(spark, sf, planted = true).select("vec_id")
      .collect().map(_.getLong(0)).toSeq
    assert(got == expected,
      s"driver-side IVF-PQ differential mismatch:\n got=$got\n exp=$expected")
  }

  test("ivfpq8 top-10 matches a full driver-side recomputation") {
    // the k=256 twin of the differential above: per-cell HASH-ORDER
    // seed sample (xxhash64("ivfpq8seed", vec_id), Spark default seed
    // 42), k binding at cell size, and the unbiased q_s·cv ADC. At gate
    // scale every member of a cell seeds its own code, so this also
    // pins that the degenerate all-seeds regime ranks exactly.
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    val rows = VectorQueries.plantedEmb(spark, sf)
      .select("vec_id", "label", "embedding").collect()
    val emb = rows.map(r => r.getLong(0) ->
      r.getSeq[Float](2).map(_.toDouble).toArray).toMap
    val cellOf = rows.map(r => r.getLong(0) -> r.getInt(1)).toMap
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def d2(a: Array[Double], c: Array[Double]): Double =
      dot(a, a) + dot(c, c) - 2.0 * dot(a, c)
    def decMean(vs: Seq[Double]): Double =
      vs.map(java.math.BigDecimal.valueOf(_)
          .setScale(10, java.math.RoundingMode.HALF_UP))
        .reduce(_ add _).doubleValue / vs.size
    def r4(x: Double): Double =
      java.math.BigDecimal.valueOf(x).setScale(4, java.math.RoundingMode.HALF_UP).doubleValue
    val byCell = emb.keys.groupBy(cellOf)
    val centroid: Map[Int, Array[Double]] = byCell.map { case (c, ids) =>
      c -> (0 until 64).map(p => decMean(ids.toSeq.map(emb(_)(p)))).toArray
    }
    def rsub(id: Long, s: Int): Array[Double] = {
      val v = emb(id); val c = centroid(cellOf(id))
      (s * 8 until s * 8 + 8).map(i => v(i) - c(i)).toArray
    }
    def argmin(sv: Array[Double], cb: Map[Int, Array[Double]]): Int =
      cb.toSeq.map { case (cid, cv) => (d2(sv, cv), cid) }.min._2
    def h(id: Long): Long =
      XxHash64(Seq(Literal("ivfpq8seed"), Literal(id)), 42L).eval(null).asInstanceOf[Long]
    var codebook: Map[(Int, Int), Map[Int, Array[Double]]] = byCell.flatMap {
      case (c, ids) =>
        // query excluded from seeds (mirrors ivfpqCodebookK's
        // vec_id =!= 0 filter — the index must be query-independent)
        val seeds = ids.toSeq.filter(_ != 0L).sortBy(id => (h(id), id)).take(256)
        (0 until 8).map(s =>
          (c, s) -> seeds.zipWithIndex.map { case (id, k) => k -> rsub(id, s) }.toMap)
    }.toMap
    val assigned = emb.keys.toSeq.flatMap { id =>
      val c = cellOf(id)
      (0 until 8).map(s => (c, s, argmin(rsub(id, s), codebook((c, s))), rsub(id, s)))
    }
    codebook = assigned.groupBy(t => (t._1, t._2, t._3)).map { case ((c, s, cid), g) =>
      (c, s, cid, (0 until 8).map(p => decMean(g.map(_._4(p)))).toArray)
    }.groupBy(t => (t._1, t._2))
      .map { case (k, m) => k -> m.map(t => t._3 -> t._4).toMap }
    val q = emb(0L)
    val qn2 = dot(q, q)
    val probed = centroid.toSeq.map { case (c, cv) =>
      (dot(cv, q) / (math.sqrt(dot(cv, cv)) * math.sqrt(qn2)), c)
    }.sortBy { case (cs, c) => (-cs, c) }.take(2).map(_._2)
    val scored = emb.keys.toSeq
      .filter(id => id != 0L && probed.contains(cellOf(id)))
      .map { id =>
        val c = cellOf(id)
        val qcDot = dot(q, centroid(c))
        val radot = (0 until 8).map { s =>
          val cv = codebook((c, s))(argmin(rsub(id, s), codebook((c, s))))
          dot(q.slice(s * 8, s * 8 + 8), cv)
        }.sum
        val v = emb(id)
        (id, r4((qcDot + radot) / math.sqrt(dot(v, v) * qn2)))
      }
    // adaptive shortlist depth (round 14): mirror the shipped rule
    val probedOcc = emb.keys.count(id => probed.contains(cellOf(id)))
    val depth = math.max(64, math.min(512, probedOcc))
    val shortlist = scored.sortBy { case (id, cs) => (-cs, id) }.take(depth).map(_._1)
    val reranked = shortlist.map { id =>
      val v = emb(id)
      (id, r4(dot(v, q) / (math.sqrt(dot(v, v)) * math.sqrt(qn2))))
    }
    val expected = reranked.sortBy { case (id, cs) => (-cs, id) }.take(10).map(_._1)
    val got = VectorQueries.ivfpqTop10(spark, sf, planted = true, kCodes = 256)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(got == expected,
      s"driver-side IVF-PQ8 differential mismatch:\n got=$got\n exp=$expected")
  }
}
