package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/**
 * Behavioral / BI analytics over the event log and the star schema
 * (SURVEY.md §2 round-5 continuation): ordered conversion funnels,
 * cohort retention, and the classic multi-dimension star join — the
 * read-side queries a product team runs against the same warehouse the
 * training pipeline feeds.
 *
 * Scale shapes: funnels and cohorts are user-keyed hash aggregates
 * joined on the user key (shuffle on user_id, never a per-user window
 * sort of raw events); the star join broadcasts every dimension small
 * enough and leaves one fact-sized shuffle join.
 */
object BehaviorQueries {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(

    // --- ordered conversion funnel: view → first click AFTER that view
    // → first purchase AFTER that click, per user. Sequential stages =
    // chained conditional-min aggregates joined on user_id (each stage
    // is one hash agg over events + one user-keyed join), NOT a per-user
    // event-sort window — at 100 TB the agg/join shape shuffles each
    // event once and keeps per-user state at O(1).
    "q_event_funnel" -> ((s, d) => {
      val ev = Tables.events(s, d).select("user_id", "event_type", "ts")
      val v = ev.groupBy("user_id")
        .agg(min(when(col("event_type") === "view", col("ts"))).as("t_view"))
        .filter(col("t_view").isNotNull)
      val c = ev.join(v, "user_id")
        .groupBy("user_id", "t_view")
        .agg(min(when(col("event_type") === "click" && col("ts") > col("t_view"),
          col("ts"))).as("t_click"))
      val p = ev.join(c.filter(col("t_click").isNotNull), "user_id")
        .groupBy("user_id", "t_click")
        .agg(min(when(col("event_type") === "purchase" && col("ts") > col("t_click"),
          col("ts"))).as("t_purchase"))
      val stage = (n: String, df: DataFrame) =>
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(n).as("stage"), col("n_users"))
      stage("1_view", v)
        .unionAll(stage("2_click_after_view", c.filter(col("t_click").isNotNull)))
        .unionAll(stage("3_purchase_after_click",
          p.filter(col("t_purchase").isNotNull)))
        .orderBy("stage")
    }),

    // --- cohort retention: users grouped by the DAY OF THEIR FIRST
    // EVENT (cohort), counted as retained on each later day they were
    // active, offsets 0–7. Two bounded aggregates (per-user first day;
    // per-user-per-day activity) joined on user_id — (cohorts × 8)
    // output cells. The classic retention triangle.
    "q_retention_cohorts" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day"))
      val first = ev.groupBy("user_id").agg(min("day").as("cohort_day"))
      val active = ev.distinct()
      active.join(first, "user_id")
        .withColumn("day_offset", datediff(col("day"), col("cohort_day")))
        .filter(col("day_offset") <= 7)
        .groupBy("cohort_day", "day_offset")
        .agg(countDistinct(col("user_id")).as("n_active"))
        .orderBy("cohort_day", "day_offset")
    }),

    // --- star join (TPC-H Q5 flavor): per-region revenue in a date
    // window across region⋈nation⋈customer⋈orders⋈lineitem. The three
    // dimension tables broadcast (they stay KB–MB at any TPC-H scale
    // for region/nation; customer broadcasts at gate scale and
    // becomes one shuffle join at 100 TB — the plan degrades to
    // exactly one extra exchange, nothing else changes); the
    // orders⋈lineitem fact-fact join shuffles on the order key with
    // the date filter PUSHED to the orders scan so the big side is
    // pre-pruned. Decimal-stable revenue sum.
    "q_star_join" -> ((s, d) => {
      val region = Tables.region(s, d)
      val nation = Tables.nation(s, d)
      val customer = Tables.customer(s, d)
      val orders = Tables.orders(s, d)
        .filter(col("o_orderdate") >= "1995-01-01" && col("o_orderdate") < "1996-01-01")
      val lineitem = Tables.lineitem(s, d)
      lineitem
        .join(orders.select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(customer.select("c_custkey", "c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_items"),
          round(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(30,12)")), 4).cast("double").as("revenue"))
        .orderBy("r_name")
    }))

  val oracleSql: Map[String, String] = Map(
    "q_event_funnel" ->
      """WITH v AS (
        |  SELECT user_id, min(ts) FILTER (event_type = 'view') AS t_view
        |  FROM events GROUP BY 1 HAVING t_view IS NOT NULL),
        |c AS (
        |  SELECT e.user_id,
        |    min(e.ts) FILTER (e.event_type = 'click' AND e.ts > v.t_view) AS t_click
        |  FROM events e JOIN v USING (user_id) GROUP BY 1, v.t_view),
        |p AS (
        |  SELECT e.user_id,
        |    min(e.ts) FILTER (e.event_type = 'purchase' AND e.ts > c.t_click)
        |      AS t_purchase
        |  FROM events e JOIN c USING (user_id)
        |  WHERE c.t_click IS NOT NULL GROUP BY 1, c.t_click)
        |SELECT '1_view' AS stage, count(*) AS n_users FROM v
        |UNION ALL
        |SELECT '2_click_after_view', count(*) FROM c WHERE t_click IS NOT NULL
        |UNION ALL
        |SELECT '3_purchase_after_click', count(*) FROM p
        |  WHERE t_purchase IS NOT NULL
        |ORDER BY stage""".stripMargin,

    "q_retention_cohorts" ->
      """WITH ev AS (SELECT DISTINCT user_id, ts::DATE AS day FROM events),
        |first AS (SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY 1)
        |SELECT cohort_day, (day - cohort_day)::INT AS day_offset,
        |  count(DISTINCT user_id) AS n_active
        |FROM ev JOIN first USING (user_id)
        |WHERE day - cohort_day <= 7
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_star_join" ->
      """SELECT r_name, count(*) AS n_items,
        |  round(sum(((l_extendedprice * (1.0 - l_discount))::DECIMAL(30,12))), 4)::DOUBLE
        |    AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE o_orderdate >= '1995-01-01' AND o_orderdate < '1996-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin)
}
