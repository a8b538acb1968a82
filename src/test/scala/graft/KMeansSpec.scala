package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.VectorQueries

/**
 * q_kmeans: full driver-side Lloyd recompute (BigDecimal centroid sums,
 * the same exact-arithmetic design as the query) and the monotone-
 * inertia property every correct Lloyd implementation has.
 */
class KMeansSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark
  private val sf = GraftSpark.sf
  private val D = 8

  /** Returns (final centroids c_N, inertias per iteration, final
    * assignment a_N — the one computed from c_{N-1}, like the query). */
  private def lloyd(vecs: Array[(Long, Int, Array[Double])], iters: Int)
      : (Map[Int, (Long, Array[Double])], Seq[Double], Map[Long, Int]) = {
    def centroids(groups: Map[Int, Array[Array[Double]]]) =
      groups.map { case (cid, xs) =>
        val sums = Array.fill(D)(BigDecimal(0))
        xs.foreach { x =>
          (0 until D).foreach { i =>
            sums(i) += BigDecimal(x(i)).setScale(10, BigDecimal.RoundingMode.HALF_UP)
          }
        }
        cid -> (xs.length.toLong, sums.map(s => s.toDouble / xs.length))
      }
    var cent = centroids(vecs.groupBy(_._2).view.mapValues(_.map(_._3)).toMap)
    val inertias = scala.collection.mutable.ArrayBuffer.empty[Double]
    var lastAssign = Map.empty[Long, Int]
    (1 to iters).foreach { _ =>
      val assigned = vecs.map { case (id, _, x) =>
        val best = cent.toSeq.map { case (cid, (_, c)) =>
          val d = (0 until D).map(i => (x(i) - c(i)) * (x(i) - c(i))).sum
          (d, cid)
        }.min
        (id, best._2, x, best._1)
      }
      inertias += assigned.map(_._4).sum
      lastAssign = assigned.map(a => a._1 -> a._2).toMap
      cent = centroids(assigned.groupBy(_._2).view.mapValues(_.map(_._3)).toMap)
    }
    (cent, inertias.toSeq, lastAssign)
  }

  private lazy val vecs: Array[(Long, Int, Array[Double])] =
    Tables.embeddings(spark, sf)
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).take(D).map(_.toDouble).toArray))

  test("q_kmeans matches a driver-side exact-arithmetic Lloyd run") {
    val got = VectorQueries.queries("q_kmeans")(spark, sf).collect()
      .map(r => r.getInt(0) -> (r.getLong(1),
        Array(r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    val (want, _, _) = lloyd(vecs, 3)
    assert(got.keySet == want.keySet)
    got.foreach { case (cid, (n, cs)) =>
      val (wn, wc) = want(cid)
      assert(n == wn, s"cluster $cid size $n vs $wn")
      (0 until 4).foreach { i =>
        assert(math.abs(cs(i) - wc(i)) < 5e-4,
          s"cluster $cid dim $i: ${cs(i)} vs ${wc(i)}")
      }
    }
  }

  test("q_semantic_dedup: reps are medoids of their own cluster, counts partition") {
    val rows = VectorQueries.queries("q_semantic_dedup")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._3).sum == vecs.length)
    // driver-side: the query's reps minimize (dist-to-FINAL-centroid,
    // vec_id) within the FINAL assignment's clusters
    val (cent, _, assign) = lloyd(vecs, 3)
    val byId = vecs.map(v => v._1 -> v._3).toMap
    rows.foreach { case (cid, repId, n, dups) =>
      assert(n >= 1 && dups >= 0 && dups < n)
      val c = cent(cid)._2
      val members = vecs.filter(v => assign(v._1) == cid)
      assert(members.length.toLong == n)
      val medoid = members.map { case (id, _, x) =>
        ((0 until D).map(i => (x(i) - c(i)) * (x(i) - c(i))).sum, id)
      }.min._2
      assert(repId == medoid, s"cluster $cid rep $repId vs driver medoid $medoid")
      assert(byId.contains(repId))
    }
  }

  test("distances are tie-free at EVERY iteration (min_by argmin is deterministic)") {
    // the query's argmin uses min_by, which has no tie-break; this pins
    // the property that makes it deterministic on this data — checked
    // against the centroid set of EACH iteration the assignments
    // actually use (c0..c2) plus the final c3 the medoid selection uses
    (1 to 4).foreach { iters =>
      val (cent, _, _) = lloyd(vecs, iters - 1) match {
        case r if iters == 1 => r // lloyd(_, 0) returns the seed centroids
        case r => r
      }
      vecs.foreach { case (id, _, x) =>
        val ds = cent.values.map { case (_, c) =>
          (0 until D).map(i => (x(i) - c(i)) * (x(i) - c(i))).sum
        }.toSeq
        assert(ds.distinct.size == ds.size,
          s"distance tie at vec $id against c${iters - 1}")
      }
    }
    // medoid ties: within each final cluster, member distances to the
    // final centroid must also be distinct
    val (cent3, _, assign) = lloyd(vecs, 3)
    vecs.groupBy(v => assign(v._1)).foreach { case (cid, members) =>
      val c = cent3(cid)._2
      val ds = members.map { case (_, _, x) =>
        (0 until D).map(i => (x(i) - c(i)) * (x(i) - c(i))).sum
      }.toSeq
      assert(ds.distinct.size == ds.size, s"medoid distance tie in cluster $cid")
    }
  }

  test("q_ivf_incremental: counts partition base/delta; frozen-centroid argmin tie-free") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q_ivf_incremental")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val emb = Tables.embeddings(spark, sf)
    val nBase = emb.filter(col("vec_id") % 10 =!= 3).count()
    val nDelta = emb.filter(col("vec_id") % 10 === 3).count()
    assert(rows.map(_._2).sum === nBase, "base lists must partition the base set")
    assert(rows.map(_._3).sum === nDelta, "delta lists must partition the delta")
    rows.foreach { case (_, nb, nd, nt) => assert(nt === nb + nd) }
    // tie-free: every vector's distances to the frozen base centroids
    // are pairwise distinct, so min_by/arg_min agree in both engines
    val baseVecs = emb.filter(col("vec_id") % 10 =!= 3)
      .select(col("label"), col("embedding")).collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).take(8).map(_.toDouble).toArray))
    val cents = baseVecs.groupBy(_._1).map { case (l, xs) =>
      l -> (0 until 8).map { i =>
        val s = xs.map(v => BigDecimal(v._2(i)).setScale(10, BigDecimal.RoundingMode.HALF_UP)).sum
        s.toDouble / xs.length
      }.toArray
    }
    emb.select(col("vec_id"), col("embedding")).collect().foreach { r =>
      val x = r.getSeq[Float](1).take(8).map(_.toDouble).toArray
      val ds = cents.values.map(c =>
        (0 until 8).map(i => (x(i) - c(i)) * (x(i) - c(i))).sum).toSeq
      assert(ds.distinct.size == ds.size, s"tie at vec ${r.getLong(0)}")
    }
  }

  test("q_embed_drift: cosines in [-1,1], snapshots partition each label") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q_embed_drift")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    val perLabel = Tables.embeddings(spark, sf).groupBy("label").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    rows.foreach { case (l, na, nb, c) =>
      assert(na + nb === perLabel(l), s"label $l snapshots don't partition")
      assert(c >= -1.0 && c <= 1.0)
    }
  }

  test("Lloyd inertia is non-increasing across the unrolled iterations") {
    val (_, inertias, _) = lloyd(vecs, 3)
    inertias.sliding(2).foreach {
      case Seq(a, b) => assert(b <= a + 1e-9, s"inertia rose: $a -> $b")
      case _ =>
    }
  }
}
