package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions._

/**
 * Driver contract — the engine's named query surface (SURVEY.md §2).
 *
 * Every entry in [[queries]] with a matching [[oracleSql]] is
 * hash-compared by the driver against DuckDB executing that SQL on the
 * same parquet; entries without oracle SQL (sketches and other
 * non-SQL-expressible ops) get a rows-only check and are property-tested
 * in the ScalaTest suite instead.
 *
 * Determinism rules (FIXTURES.md): explicit ORDER BY on every output,
 * doubles rounded to fixed decimals, seeds pinned to 42, UTC everywhere.
 */
object SparkEntry {

  /**
   * Flagship (smoke) query — the reference's signature computation,
   * batch form: per-event-type exact count vs Count-Min-Sketch estimate.
   * The sketch is built distributed (partial+final agg), stays a
   * one-row BinaryType relation, and is broadcast to the probe side —
   * no driver round-trip (SURVEY.md §3.3).
   */
  def entry(spark: SparkSession): DataFrame =
    cmsVsExact(spark, "/root/testdata/sf0.001")

  private def cmsVsExact(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val exact = ev.groupBy("event_type").agg(count(lit(1)).as("exact"))
    val sk = ev.agg(cms_agg(col("event_type"), 0.01, 0.99, 42).as("sk"))
    exact.join(broadcast(sk))
      .select(col("event_type"), col("exact"),
        cms_estimate(col("sk"), col("event_type")).as("estimate"))
      .orderBy("event_type")
  }

  /** Per-partkey Bloom membership of shipped parts: build on lineitem
    * (fact side), probe every part — zero false negatives by construction. */
  private def bloomProbe(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val pt = Tables.part(spark, dir)
    val sk = li.agg(bloom_agg(col("l_partkey"), 300000L, 0.01).as("bf"))
    pt.join(broadcast(sk))
      .select(col("p_partkey"),
        bloom_might_contain(col("bf"), col("p_partkey")).as("might_contain"))
      .orderBy("p_partkey")
  }

  private def r4(c: Column): Column = round(c, 4)

  type Q = (SparkSession, String) => DataFrame

  def queries: Map[String, Q] = Map(
    // --- probabilistic core (sketches; rows-only for the driver,
    //     property-tested in SketchSpec) --------------------------------
    "q_cms_event_counts" -> ((s, d) => cmsVsExact(s, d)),
    "q_bloom_probe" -> ((s, d) => bloomProbe(s, d)),

    // --- aggregation ---------------------------------------------------
    "q_agg_pricing" -> ((s, d) => Tables.lineitem(s, d)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        r4(sum("l_quantity")).as("sum_qty"),
        r4(sum("l_extendedprice")).as("sum_base_price"),
        r4(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc_price"),
        r4(avg("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")),

    "q_exact_counts" -> ((s, d) => Tables.events(s, d)
      .groupBy("event_type").agg(count(lit(1)).as("cnt"))
      .orderBy("event_type")),

    "q_count_distinct" -> ((s, d) => Tables.events(s, d)
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_users"),
        r4(sum("value")).as("sum_value"))
      .orderBy("event_type")),

    // --- scan / filter / projection ------------------------------------
    "q_filter_scan" -> ((s, d) => Tables.events(s, d)
      .filter(col("event_type") === "click" && col("value") > 100.0)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), r4(sum("value")).as("sum_value"))
      .orderBy("user_id")),

    "q_distinct" -> ((s, d) => Tables.orders(s, d)
      .select("o_orderstatus", "o_orderpriority").distinct()
      .orderBy("o_orderstatus", "o_orderpriority")),

    // --- tokenize / flatMap (the reference's word-count shape) ---------
    "q_tokenize_wordcount" -> ((s, d) => Tables.documents(s, d)
      .select(explode(tokens(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word"))
      .limit(50)),

    // --- joins ----------------------------------------------------------
    "q_join_broadcast" -> ((s, d) => Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_cust"), r4(sum("c_acctbal")).as("sum_bal"))
      .orderBy("r_name")),

    "q_join_smj" -> ((s, d) => Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(r4(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("o_orderpriority")),

    "q_semi_join" -> ((s, d) => Tables.part(s, d)
      .join(Tables.lineitem(s, d).filter(col("l_quantity") >= 45.0)
        .select(col("l_partkey")), col("p_partkey") === col("l_partkey"), "left_semi")
      .groupBy("p_brand").agg(count(lit(1)).as("n_parts"))
      .orderBy("p_brand")),

    "q_anti_join" -> ((s, d) => Tables.part(s, d)
      .join(Tables.lineitem(s, d).filter(col("l_quantity") >= 45.0)
        .select(col("l_partkey")), col("p_partkey") === col("l_partkey"), "left_anti")
      .groupBy("p_brand").agg(count(lit(1)).as("n_parts"))
      .orderBy("p_brand")),

    // --- sort / top-k ----------------------------------------------------
    "q_topk_orders" -> ((s, d) => Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), r4(col("o_totalprice")).as("price"))
      .orderBy(col("price").desc, col("o_orderkey"))
      .limit(10)))

  /**
   * DuckDB oracle SQL — one per ✦ query above, same column names, same
   * ORDER BY. Sketch queries are intentionally omitted (not
   * SQL-expressible; see SketchSpec for their property tests).
   */
  def oracleSql: Map[String, String] = Map(
    "q_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 4) AS sum_qty,
        |  round(sum(l_extendedprice), 4) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_exact_counts" ->
      "SELECT event_type, count(*) AS cnt FROM events GROUP BY 1 ORDER BY 1",

    "q_count_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users,
        |  round(sum(value), 4) AS sum_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_filter_scan" ->
      """SELECT user_id, count(*) AS n, round(sum(value), 4) AS sum_value
        |FROM events WHERE event_type = 'click' AND value > 100.0
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_distinct" ->
      """SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
        |ORDER BY 1, 2""".stripMargin,

    "q_tokenize_wordcount" ->
      """SELECT word, count(*) AS cnt FROM (
        |  SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents
        |) WHERE word <> '' GROUP BY 1 ORDER BY cnt DESC, word LIMIT 50""".stripMargin,

    "q_join_broadcast" ->
      """SELECT r_name, count(*) AS n_cust, round(sum(c_acctbal), 4) AS sum_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_join_smj" ->
      """SELECT o_orderpriority,
        |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_semi_join" ->
      """SELECT p_brand, count(*) AS n_parts FROM part
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_partkey = p_partkey AND l_quantity >= 45.0)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_anti_join" ->
      """SELECT p_brand, count(*) AS n_parts FROM part
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_partkey = p_partkey AND l_quantity >= 45.0)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_topk_orders" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 4) AS price
        |FROM orders ORDER BY price DESC, o_orderkey LIMIT 10""".stripMargin)
}
