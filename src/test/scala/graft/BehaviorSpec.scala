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
}
