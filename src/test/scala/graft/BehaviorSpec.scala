package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.BehaviorQueries

/**
 * Behavioral analytics (funnel / retention / star join): each query
 * checked against an independent driver-side recomputation over the
 * collected sf0.001 event log — sequential scan logic with none of the
 * distributed query's agg/join machinery in it.
 */
class BehaviorSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark
  private val sf = GraftSpark.sf

  private lazy val events: Seq[(Long, String, Timestamp)] =
    Tables.events(spark, sf).select("user_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2))).toSeq

  test("q_event_funnel matches a per-user sequential scan") {
    val byUser = events.groupBy(_._1)
    var nView = 0L; var nClick = 0L; var nPurchase = 0L
    byUser.values.foreach { evs =>
      val sorted = evs.sortBy(e => (e._3.getTime, e._3.getNanos))
      sorted.find(_._2 == "view").foreach { v =>
        nView += 1
        sorted.find(e => e._2 == "click" && e._3.after(v._3)).foreach { c =>
          nClick += 1
          if (sorted.exists(e => e._2 == "purchase" && e._3.after(c._3)))
            nPurchase += 1
        }
      }
    }
    val got = BehaviorQueries.queries("q_event_funnel")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got("1_view") == nView)
    assert(got("2_click_after_view") == nClick)
    assert(got("3_purchase_after_click") == nPurchase)
    // funnel stages can only narrow
    assert(nView >= nClick && nClick >= nPurchase)
  }

  test("q_retention_cohorts: offset-0 row counts every cohort member exactly once") {
    val rows = BehaviorQueries.queries("q_retention_cohorts")(spark, sf)
      .collect().map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2)))
    val day0 = rows.filter(_._2 == 0)
    // every user is active on their own first day → sum of offset-0
    // cells = #users, and each later offset can only be ≤ its cohort's day-0
    assert(day0.map(_._3).sum == events.map(_._1).distinct.length)
    val d0 = day0.map(t => t._1 -> t._3).toMap
    rows.filter(_._2 > 0).foreach { case (c, _, n) => assert(n <= d0(c)) }
  }

  test("q_equidepth_hist: 8 exhaustive buckets, approx boundaries balanced") {
    val rows = BehaviorQueries.queries("q_equidepth_hist")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getBoolean(4)))
    val n = Tables.lineitem(spark, sf).count()
    assert(rows.map(_._1).toSeq == (1 to 8))
    rows.foreach { case (b, total, lo, hi, depthOk) =>
      assert(total == n)
      assert(lo <= hi)
      // the in-plan flag IS the gate: approx_percentile's rank error
      // (N/10000 per boundary) sits 50× inside the N/100 tolerance
      assert(depthOk, s"bucket $b failed the equi-depth tolerance")
    }
  }

  test("q_anomaly_mad: approx median/MAD satisfy their rank properties") {
    val rows = BehaviorQueries.queries("q_anomaly_mad")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2),
        r.getBoolean(3), r.getBoolean(4)))
    assert(rows.nonEmpty)
    val nEvents = events.size
    assert(rows.map(_._2).sum == nEvents)
    rows.foreach { case (t, _, medOk, madOk, anomOk) =>
      assert(medOk, s"$t: approx median violated its rank bound")
      assert(madOk, s"$t: approx MAD violated its rank bound")
      assert(anomOk, s"$t: anomalies not a bounded minority")
    }
  }

  test("q_pagerank_neardup conserves rank mass and favors high-degree nodes") {
    import graft.queries.TextQueries
    val pairs = TextQueries.jaccardPairs(spark, sf).select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nodes = (pairs.map(_._1) ++ pairs.map(_._2)).distinct
    // driver-side 3-iteration reference
    val adj = (pairs ++ pairs.map(p => (p._2, p._1))).groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2) }
    var rank = nodes.map(_ -> 1.0 / nodes.length).toMap
    for (_ <- 1 to 3) {
      rank = nodes.map { v =>
        v -> (0.15 / nodes.length +
          0.85 * adj(v).map(u => rank(u) / adj(u).length).sum)
      }.toMap
    }
    val expected = rank.toSeq
      .map { case (k, v) => (k, BigDecimal(v).setScale(4,
        BigDecimal.RoundingMode.HALF_UP).toDouble) }
      .sortBy { case (k, v) => (-v, k) }.take(10)
    val got = graft.queries.BehaviorQueries.queries("q_pagerank_neardup")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got === expected)
  }

  test("q_star_join revenue matches an in-memory hash join") {
    val cust = Tables.customer(spark, sf).select("c_custkey", "c_nationkey")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val nat = Tables.nation(spark, sf).select("n_nationkey", "n_regionkey")
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    val reg = Tables.region(spark, sf).select("r_regionkey", "r_name")
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    val ordRegion = Tables.orders(spark, sf)
      .filter(col("o_orderdate") >= "1995-01-01" && col("o_orderdate") < "1996-01-01")
      .select("o_orderkey", "o_custkey").collect()
      .map(r => r.getLong(0) -> reg(nat(cust(r.getLong(1))))).toMap
    val rev = scala.collection.mutable.Map.empty[String, BigDecimal]
    Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_extendedprice", "l_discount").collect()
      .foreach { r =>
        ordRegion.get(r.getLong(0)).foreach { rn =>
          val v = BigDecimal(r.getDouble(1)) * (BigDecimal(1.0) - BigDecimal(r.getDouble(2)))
          rev(rn) = rev.getOrElse(rn, BigDecimal(0)) + v
        }
      }
    val got = BehaviorQueries.queries("q_star_join")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    rev.foreach { case (rn, v) =>
      assert(math.abs(got(rn) - v.toDouble) < 0.01, s"$rn: ${got(rn)} vs $v")
    }
  }

  test("q_ks_test matches a driver-side exact two-sample D") {
    val evs = Tables.events(spark, sf)
      .select("event_type", "value", "ts").collect()
      .map(r => (r.getString(0), r.getDouble(1),
        r.getTimestamp(2).getTime * 1000 + r.getTimestamp(2).getNanos / 1000 % 1000))
    val mn = evs.map(_._3).min; val mx = evs.map(_._3).max
    val got = BehaviorQueries.queries("q_ks_test")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    evs.groupBy(_._1).foreach { case (t, es) =>
      val (a, b) = es.partition(e => e._3 * 2 < mn + mx)
      val va = a.map(_._2).sorted; val vb = b.map(_._2).sorted
      val thresholds = (va ++ vb).distinct.sorted
      val d = thresholds.map { x =>
        math.abs(va.count(_ <= x).toDouble / va.length
          - vb.count(_ <= x).toDouble / vb.length)
      }.max
      val (na, nb, ksd) = got(t)
      assert(na == va.length && nb == vb.length)
      assert(math.abs(ksd - d) < 1e-4, s"$t: ks_d $ksd vs driver $d")
      assert(ksd >= 0.0 && ksd <= 1.0)
    }
  }

  test("q_chi_square: non-negative parts, events fully covered") {
    val rows = BehaviorQueries.queries("q_chi_square")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(_._2).sum == Tables.events(spark, sf).count())
    rows.foreach { case (t, n, chi2) =>
      assert(n > 0)
      assert(chi2 >= 0.0, s"$t negative chi2 $chi2")
    }
  }

  test("q_preference_pairs: true per-user extremes, non-negative margin, distinct ids") {
    val rows = BehaviorQueries.queries("q_preference_pairs")(spark, sf).collect()
    assert(rows.nonEmpty)
    // driver-side yardstick of the extremes
    val byUser = Tables.events(spark, sf)
      .selectExpr("user_id", "event_id", "round(value, 4) AS v").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
    rows.foreach { r =>
      val (u, n) = (r.getLong(0), r.getLong(1))
      val (cid, cv) = (r.getLong(2), r.getDouble(3))
      val (rid, rv) = (r.getLong(4), r.getDouble(5))
      val margin = r.getDouble(6)
      val evs = byUser(u)
      assert(n == evs.size && n >= 2)
      assert(cid != rid, s"user $u: chosen == rejected event $cid")
      assert(margin >= 0.0 && math.abs(margin - (cv - rv)) < 1e-9)
      // chosen = max by (v desc, id asc); rejected = min by (v asc, id asc)
      val chosen = evs.minBy(e => (-e._3, e._2))
      val rejected = evs.minBy(e => (e._3, e._2))
      assert((cid, cv) == ((chosen._2, chosen._3)), s"user $u chosen mismatch")
      assert((rid, rv) == ((rejected._2, rejected._3)), s"user $u rejected mismatch")
    }
  }

  test("q_markov_transitions is row-stochastic and conserves transitions") {
    val rows = SparkEntry.queries("q_markov_transitions")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    // each from-row's probabilities sum to 1 (4-decimal rounding slack)
    rows.groupBy(_._1).foreach { case (from, rs) =>
      val psum = rs.map(_._4).sum
      assert(math.abs(psum - 1.0) <= rs.length * 5e-5, s"$from: psum=$psum")
      val tot = rs.map(_._3).sum
      rs.foreach { case (_, to, n, p) =>
        assert(math.abs(p - n.toDouble / tot) <= 5e-5, s"$from->$to")
      }
    }
    // Σ n = Σ_users (events_u - 1): every event but each user's last
    // contributes exactly one transition
    val expected = events.groupBy(_._1).values.map(_.size.toLong - 1L).sum
    assert(rows.map(_._3).sum === expected)
  }

  test("q_ewma_smooth matches the driver closed form and tracks the recursion") {
    val rows = Tables.events(spark, sf).filter(col("user_id") < 20)
      .select("user_id", "event_id", "ts", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getDouble(3)))
    val weights = (0 until 16).map(j => math.pow(0.5, j + 1))
    def round4(x: Double): Double =
      new java.math.BigDecimal(x)
        .setScale(12, java.math.RoundingMode.HALF_UP)
        .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    val expect = rows.groupBy(_._1).flatMap { case (_, evs) =>
      val ordered = evs.sortBy(e => (e._3.getTime, e._3.getNanos, e._2))
      ordered.indices.map { k =>
        // same term order as the plan's left-assoc reduce
        val trunc = (0 until 16)
          .map(j => (if (k - j >= 0) ordered(k - j)._4 else 0.0) * weights(j))
          .reduce(_ + _)
        // untruncated recursion for the tail bound
        val rec = (0 to k).foldLeft(0.0)((acc, i) => acc * 0.5 + ordered(i)._4 * 0.5)
        (ordered(k)._2, round4(trunc), rec)
      }
    }
    val got = queries.BehaviorQueries.queries("q_ewma_smooth")(spark, sf)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(got.size === rows.length)
    val maxV = rows.map(_._4.abs).max
    expect.foreach { case (eid, trunc, rec) =>
      assert(got(eid) === trunc, s"event $eid: closed form mismatch")
      // truncation discards at most 2^-16 of the oldest mass
      assert(math.abs(trunc - rec) <= maxV / 65536.0 + 5e-5, s"event $eid tail")
    }
  }

  test("q_segmented_regression matches a BigDecimal least-squares recompute") {
    // independent formulation: exact BigDecimal sums (no decimal(30,12)
    // truncation on x-only terms, full-precision products) → the same
    // closing algebra; agreement to 4 decimals despite the different
    // accumulation route shows the decimal-sum plan isn't load-bearing
    // precision-wise, only determinism-wise
    val rows = Tables.events(spark, sf)
      .select(col("event_type"), hour(col("ts")).cast("double").as("x"),
        col("value"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    def d12(v: Double) = BigDecimal(v).setScale(12,
      BigDecimal.RoundingMode.HALF_UP)
    val expect = rows.groupBy(_._1).map { case (t, xs) =>
      val n = BigDecimal(xs.length)
      val sx = xs.map(r => d12(r._2)).sum
      val sy = xs.map(r => d12(r._3)).sum
      val sxx = xs.map(r => d12(r._2 * r._2)).sum
      val sxy = xs.map(r => d12(r._2 * r._3)).sum
      val (nn, sxd, syd, sxxd, sxyd) =
        (n.toDouble, sx.toDouble, sy.toDouble, sxx.toDouble, sxy.toDouble)
      val slope = (nn * sxyd - sxd * syd) / (nn * sxxd - sxd * sxd)
      val icept = (syd - slope * sxd) / nn
      (t, BigDecimal(slope).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .toDouble,
        BigDecimal(icept).setScale(4, BigDecimal.RoundingMode.HALF_UP)
          .toDouble)
    }
    val got = queries.BehaviorQueries.queries("q_segmented_regression")(
      spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    assert(got.size === expect.size)
    expect.foreach { case (t, slope, icept) =>
      assert(math.abs(got(t)._1 - slope) <= 1e-4, s"$t slope")
      assert(math.abs(got(t)._2 - icept) <= 1e-4, s"$t intercept")
    }
  }

  test("q_wasserstein_1d matches a driver-side sorted-merge recompute and dominates |Δmean|") {
    // independent formulation: per-language sorted token-count samples,
    // W1 computed by the dual (quantile-coupling) integral instead of
    // the engine's CDF-gap sum; plus the 1-D identity W1 >= |mean_A -
    // mean_B| (equality iff the CDFs never cross), which an off-by-one
    // cumsum or a dropped support point would violate.
    def toks(t: String): Int = {
      val s = t.trim
      if (s.isEmpty) 0 else s.toLowerCase.split("\\s+").length
    }
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("lang", "text").collect()
      .map(r => (r.getString(0), toks(r.getString(1))))
    val byLang = docs.groupBy(_._1).map { case (l, xs) =>
      l -> xs.map(_._2.toDouble).sorted }
    val en = byLang("en")
    def w1(a: Seq[Double], b: Seq[Double]): Double = {
      // CDF-gap integral over the merged support — same definition,
      // independently accumulated
      val support = (a ++ b).distinct.sorted
      var acc = 0.0
      for (Seq(v, nxt) <- support.sliding(2) if support.length > 1) {
        val fa = a.count(_ <= v).toDouble / a.length
        val fb = b.count(_ <= v).toDouble / b.length
        acc += math.abs(fa - fb) * (nxt - v)
      }
      acc
    }
    val got = BehaviorQueries.queries("q_wasserstein_1d")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(got.map(_._1).toSeq == byLang.keys.filter(_ != "en").toSeq.sorted)
    got.foreach { case (l, nRef, nCmp, w) =>
      assert(nRef == en.length && nCmp == byLang(l).length)
      val exp = w1(en, byLang(l))
      assert(math.abs(w - exp) <= 1e-3, s"$l: got $w expected $exp")
      val dMean = math.abs(en.sum / en.length -
        byLang(l).sum / byLang(l).length)
      assert(w >= dMean - 1e-9, s"$l: W1 $w below |dMean| $dMean")
    }
  }

  test("q_m4_downsample matches a driver recompute; (type, us) is tie-free") {
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), unix_micros(col("ts")).as("us"), col("value"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    // min_by/max_by have no tie-break: the query is only deterministic
    // because (event_type, us) never collides at gate scale
    assert(ev.map(e => (e._1, e._2)).distinct.length == ev.length,
      "(event_type, us) ties exist — first/last become nondeterministic")
    val mn = ev.map(_._2).min
    val mx = ev.map(_._2).max
    val exp = ev.groupBy(e => (e._1, (e._2 - mn) * 32 / (mx - mn + 1)))
      .map { case ((t, b), xs) =>
        val byUs = xs.sortBy(_._2)
        (t, b) -> (xs.length.toLong, xs.map(_._3).min, xs.map(_._3).max,
          byUs.head._3, byUs.last._3, byUs.head._2, byUs.last._2)
      }
    val got = BehaviorQueries.queries("q_m4_downsample")(spark, sf).collect()
    assert(got.length == exp.size)
    got.foreach { r =>
      val k = (r.getString(0), r.getLong(1))
      val (n, vmin, vmax, vf, vl, usf, usl) = exp(k)
      assert(r.getLong(2) == n && r.getDouble(3) == vmin &&
        r.getDouble(4) == vmax && r.getDouble(5) == vf &&
        r.getDouble(6) == vl && r.getLong(7) == usf && r.getLong(8) == usl,
        s"bucket $k mismatch")
      assert(r.getLong(1) >= 0 && r.getLong(1) <= 31)
      assert(vmin <= vf && vf <= vmax && vmin <= vl && vl <= vmax)
    }
    assert(got.map(_.getLong(2)).sum == ev.length, "buckets must cover all events")
  }
}
