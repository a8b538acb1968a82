package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

    // --- per-user modal event type: argmax over the per-(user, type)
    // count histogram as two bounded HASH aggs (max count, then min
    // type over the tie set) — never max_by/struct-min, whose immutable
    // agg buffer silently plans a SortAggregate and whose tie choice is
    // plan-dependent (the q_cluster_canonical rule). At 100 TB this is
    // two shuffles on user_id over a histogram ≤ |users|×|types|.
    "q_mode_per_group" -> ((s, d) => {
      val counts = Tables.events(s, d)
        .groupBy("user_id", "event_type").agg(count(lit(1)).as("c"))
      val mx = counts.groupBy("user_id").agg(max("c").as("mode_n"))
        .withColumnRenamed("user_id", "mu")
      counts.join(mx,
          col("user_id") === col("mu") && col("c") === col("mode_n"))
        .groupBy("user_id", "mode_n")
        .agg(min("event_type").as("mode_type"))
        .select(col("user_id"), col("mode_type"), col("mode_n"))
        .orderBy("user_id")
    }),

    // --- item-item co-occurrence (the market-basket/recommender
    // primitive): part pairs appearing in the same order, ranked by
    // lift-free co-count with per-item totals for downstream
    // similarity. The scalable shape is per-basket pair generation —
    // a self-join WITHIN each order key, so work is Σ|basket|² with
    // baskets bounded (≤7 lineitems here; a real pipeline caps or
    // samples megabaskets first — the q_skew_diagnostics pre-pass),
    // never an items×items matrix. Top-20 cut on (count desc, pair)
    // keeps the output deterministic.
    "q_itemitem_cooc" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_orderkey").as("ok"),
        col("l_partkey").as("pk")).distinct()
      val pairs = li.as("a").join(li.as("b"),
          col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
        .select(col("a.pk").as("p1"), col("b.pk").as("p2"))
        .groupBy("p1", "p2").agg(count(lit(1)).as("n_cooc"))
      val totals = li.groupBy("pk").agg(count(lit(1)).as("n"))
      pairs
        .join(totals.select(col("pk").as("p1"), col("n").as("n1")), "p1")
        .join(totals.select(col("pk").as("p2"), col("n").as("n2")), "p2")
        .orderBy(col("n_cooc").desc, col("p1"), col("p2"))
        .limit(20)
        .select("p1", "p2", "n_cooc", "n1", "n2")
    }),

    // --- week-over-week growth (the ops-dashboard staple): weekly
    // event counts per type with the previous week's count and the
    // growth ratio — a bounded weekly agg then a lag window over
    // ≤ |types|×|weeks| rows, never a window over raw events. Ratio
    // guarded (ANSI divide-by-zero) and rounded identically.
    "q_wow_growth" -> ((s, d) => {
      val weekly = Tables.events(s, d)
        .groupBy(date_trunc("week", col("ts")).cast("date").as("week"),
          col("event_type"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("event_type").orderBy("week")
      weekly.withColumn("prev_n", lag("n", 1).over(w))
        .withColumn("wow", when(col("prev_n") > 0,
          round(col("n") / col("prev_n"), 4)))
        .orderBy("event_type", "week")
    }),

    // --- last-touch attribution: each purchase credits the user's most
    // recent PRIOR non-purchase event within a 7-day lookback, else
    // 'direct'. The scalable shape is the union-merge as-of
    // (q_scd2_lookup's): candidates (tag 0) and purchases (tag 1)
    // union into ONE stream, one shuffle+sort per user, and
    // last(ignoreNulls) carries the in-effect (type, ts) forward — no
    // per-purchase range join, no per-row subquery. The lookback is
    // enforced AFTER the merge on the carried candidate ts. Equal-ts
    // ties: candidates sort before purchases (tag), event_id breaks the
    // rest, mirrored exactly in the oracle's window order.
    "q_attribution" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val cands = ev.filter(col("event_type") =!= "purchase")
        .select(col("user_id"), col("ts"), col("event_id"), lit(0).as("tag"),
          col("event_type").as("ctype"), col("ts").as("cts"),
          lit(null).cast("double").as("value"))
      val buys = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"), lit(1).as("tag"),
          lit(null).cast("string").as("ctype"),
          lit(null).cast("timestamp").as("cts"), col("value"))
      val merge = Window.partitionBy("user_id")
        .orderBy("ts", "tag", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      cands.unionAll(buys)
        .withColumn("last_type", last("ctype", ignoreNulls = true).over(merge))
        .withColumn("last_ts", last("cts", ignoreNulls = true).over(merge))
        .filter(col("tag") === 1)
        .select(
          when(col("last_ts").isNotNull &&
              col("last_ts") > col("ts") - expr("INTERVAL 7 DAYS"),
            col("last_type")).otherwise(lit("direct")).as("channel"),
          col("value"))
        .groupBy("channel")
        .agg(count(lit(1)).as("n_purchases"),
          round(sum(col("value").cast("decimal(30,12)")), 4)
            .cast("double").as("sum_value"))
        .orderBy("channel")
    }),

    // --- first-order Markov transition matrix over user event streams:
    // P(next event type | current) — the journey model behind
    // next-action prediction and anomalous-flow detection. Per-user
    // ordering is a lead() window PARTITIONED on user_id (bounded
    // per-user sorts that scale out with the keyspace; ties broken by
    // the unique event_id so the successor is engine-exact), then all
    // cross-user work is two bounded aggs on the (from, to) type pairs
    // — |types|² rows — with the row-normalizing totals broadcast back.
    "q_markov_transitions" -> ((s, d) => {
      val ev = Tables.events(s, d).select("user_id", "event_type", "ts", "event_id")
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val cnt = ev.withColumn("to_type", lead("event_type", 1).over(w))
        .filter(col("to_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n"))
      val tot = cnt.groupBy("from_type").agg(sum("n").as("tot"))
      cnt.join(broadcast(tot), "from_type")
        .select(col("from_type"), col("to_type"), col("n"),
          round(col("n").cast("double") / col("tot").cast("double"), 4).as("p"))
        .orderBy("from_type", "to_type")
    }),

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

    // --- per-segment closed-form OLS (the "grouped model fit" pattern:
    // one regression per key, arbitrarily many keys, NO driver loop —
    // the shape a feature-drift or trend monitor runs per segment at
    // 100 TB): value regressed on hour-of-day per event_type via the
    // normal equations. Only the FIVE SUMS need distributed exactness —
    // each is a decimal sum (partition-order independent, map-side
    // combined); the closing algebra runs on 1-row-per-group scalars in
    // plain doubles written IDENTICALLY in both engines (same
    // expression tree, same association, round 4), so the division
    // never sees a nondeterministic operand. Denominators ANSI-guarded
    // (a constant-x or constant-y group yields NULL, not a throw).
    "q_segmented_regression" -> ((s, d) => {
      def dsum(c: org.apache.spark.sql.Column) =
        sum(c.cast("decimal(30,12)"))
      val g = Tables.events(s, d)
        .select(col("event_type"),
          hour(col("ts")).cast("double").as("x"), col("value").as("y"))
        .groupBy("event_type").agg(
          count(lit(1)).cast("double").as("n"),
          dsum(col("x")).cast("double").as("sx"),
          dsum(col("y")).cast("double").as("sy"),
          dsum(col("x") * col("x")).cast("double").as("sxx"),
          dsum(col("x") * col("y")).cast("double").as("sxy"),
          dsum(col("y") * col("y")).cast("double").as("syy"))
      val num = col("n") * col("sxy") - col("sx") * col("sy")
      val den = col("n") * col("sxx") - col("sx") * col("sx")
      val deny = col("n") * col("syy") - col("sy") * col("sy")
      g.select(col("event_type"), col("n").cast("long").as("n_events"),
          round(when(den > 0, num / den), 4).as("slope"),
          round(when(den > 0,
            (col("sy") - (num / den) * col("sx")) / col("n")), 4)
            .as("intercept"),
          round(when(den > 0 && deny > 0,
            (num * num) / (den * deny)), 4).as("r2"))
        .orderBy("event_type")
    }),

    // --- equi-depth histogram (range-partition planning): 8-bucket
    // boundaries over l_extendedprice + per-bucket balance audit — what
    // a range partitioner / sort-merge planner computes before a global
    // sort. The boundary pass is approx_percentile (GK sketch, state
    // bounded by the accuracy parameter — NOT the exact percentile's
    // ObjectHashAggregate value list, which grows with the corpus and
    // is the one plan shape that cannot survive 100 TB), then a
    // broadcast of the 1-row boundary vector and a hash agg. No global
    // sort anywhere. Correctness gate: the output carries only
    // engine-independent facts (exact n_total, global min/max) plus a
    // per-bucket depth flag |n_b − N/8| ≤ N/100 + 1 — the GK guarantee
    // bounds each boundary's rank error by N/accuracy = N/10000, so two
    // boundaries bound the bucket-count error by N/5000, 50× inside the
    // tolerance; the DuckDB oracle computes the same flags from EXACT
    // quantile_cont boundaries (trivially true), so the hash matches iff
    // the sketch actually achieved equi-depth.
    "q_equidepth_hist" -> ((s, d) => {
      val v = Tables.lineitem(s, d).select(col("l_extendedprice").as("v"))
      val qs = v.agg(
        expr("approx_percentile(v, array(0.125,0.25,0.375,0.5,0.625,0.75,0.875), 10000)")
          .as("q"),
        count(lit(1)).as("n_total"),
        round(min("v"), 4).as("v_lo"), round(max("v"), 4).as("v_hi"))
      v.crossJoin(broadcast(qs))
        .withColumn("bucket",
          (0 until 7).map(i => when(col("v") > element_at(col("q"), i + 1), 1)
            .otherwise(0)).reduce(_ + _) + lit(1))
        .groupBy("bucket", "n_total", "v_lo", "v_hi")
        .agg(count(lit(1)).as("n"))
        .select(col("bucket"), col("n_total"), col("v_lo"), col("v_hi"),
          (abs(col("n") - col("n_total") / lit(8.0))
            <= col("n_total") * lit(0.01) + lit(1)).as("depth_ok"))
        .orderBy("bucket")
    }),

    // --- robust anomaly detection (median/MAD): per event type, flag
    // values above median + 1.5·MAD — the outlier rule that survives
    // skewed data where mean/stddev break. Three bounded aggregates
    // chained by broadcast joins (median → MAD needs the median → flag
    // pass needs both); every pass is a hash agg over the events scan.
    // Median and MAD are approx_percentile (GK sketch, bounded state —
    // the exact percentile's per-type value lists scale with the corpus
    // and OOM at 100 TB). Correctness gate: the output carries exact
    // n_total plus rank flags checked two-sided so ties can never flip
    // them — count(v < med) ≤ N/2 + tol AND count(v ≤ med) ≥ N/2 − tol
    // (the defining rank property of a median; GK bounds the error by
    // N/10000, tol = N/100 + 1 is 100× that), the same pair for the MAD
    // over |v − med|, and the anomaly count bounded by N/2 + tol (cannot
    // exceed the mass above the median). The DuckDB oracle computes the
    // same flags from EXACT quantile_cont — true by definition — so the
    // hash matches iff the sketch medians are rank-correct.
    "q_anomaly_mad" -> ((s, d) => {
      val ev = Tables.events(s, d).select("event_type", "value")
      val tol = col("n_total") * lit(0.01) + lit(1)
      val med = ev.groupBy("event_type")
        .agg(expr("approx_percentile(value, 0.5, 10000)").as("med"),
          count(lit(1)).as("n_total"))
      val stats = ev.join(broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(expr("approx_percentile(abs(value - med), 0.5, 10000)").as("mad"),
          max("med").as("med"), max("n_total").as("n_total"),
          sum(when(col("value") < col("med"), 1L).otherwise(0L)).as("n_lt_med"),
          sum(when(col("value") <= col("med"), 1L).otherwise(0L)).as("n_le_med"))
      ev.join(broadcast(stats), "event_type")
        .groupBy("event_type")
        .agg(max("n_total").as("n_total"),
          max("n_lt_med").as("n_lt_med"), max("n_le_med").as("n_le_med"),
          sum(when(abs(col("value") - col("med")) < col("mad"), 1L).otherwise(0L))
            .as("n_dev_lt"),
          sum(when(abs(col("value") - col("med")) <= col("mad"), 1L).otherwise(0L))
            .as("n_dev_le"),
          sum(when(col("value") > col("med") + lit(1.5) * col("mad"), 1L)
            .otherwise(0L)).as("n_anom"))
        .select(col("event_type"), col("n_total"),
          (col("n_lt_med") <= col("n_total") / lit(2.0) + tol
            && col("n_le_med") >= col("n_total") / lit(2.0) - tol).as("med_rank_ok"),
          (col("n_dev_lt") <= col("n_total") / lit(2.0) + tol
            && col("n_dev_le") >= col("n_total") / lit(2.0) - tol).as("mad_rank_ok"),
          (col("n_anom") <= col("n_total") / lit(2.0) + tol).as("anom_frac_ok"))
        .orderBy("event_type")
    }),

    // --- PageRank over the near-dup similarity graph (3 unrolled
    // iterations, damping 0.85): ranks the "most central" documents of
    // each duplicate neighborhood — the centrality complement to
    // q_dedup_clusters' membership. Each iteration is one edge⋈rank
    // shuffle join + one hash agg (the textbook distributed PageRank
    // step); the node table rides a broadcast 1-row count. The pair
    // graph is undirected (edges mirrored), so there are no dangling
    // nodes and rank mass is conserved per component. The pair graph
    // comes pre-materialized from [[TextQueries.jaccardPairsShared]] —
    // one build per session serves all three consumers.
    "q_pagerank_neardup" -> ((s, d) => {
      val pairs = TextQueries.jaccardPairsShared(s, d).select("id_a", "id_b")
      val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
        .unionAll(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      val n1 = deg.agg(count(lit(1)).as("n"))
      val nodes = deg.crossJoin(broadcast(n1))
      var ranks = nodes.select(col("src").as("node"), col("deg"), col("n"),
        (lit(1.0) / col("n")).as("rank"))
      for (_ <- 1 to 3) {
        val contrib = edges.join(ranks, col("src") === col("node"))
          .select(col("dst"), (col("rank") / col("deg")).as("c"))
          .groupBy("dst").agg(sum("c").as("csum"))
        ranks = nodes.join(contrib, col("src") === col("dst"), "left")
          .select(col("src").as("node"), col("deg"), col("n"),
            (lit(0.15) / col("n")
              + lit(0.85) * coalesce(col("csum"), lit(0.0))).as("rank"))
      }
      ranks.select(col("node"), round(col("rank"), 4).as("rank"))
        .orderBy(col("rank").desc, col("node")).limit(10)
    }),

    // --- two-sample Kolmogorov–Smirnov: exact D statistic between the
    // value distributions of the stream's temporal halves, per event
    // type — the "did this feature's distribution move" test that backs
    // q_drift_psi with an exact nonparametric statistic. Distributed
    // shape: one (type, value)-keyed hash agg, then windows PARTITIONED
    // BY TYPE (cumulative CDFs sort each type's distinct values, never
    // the raw events), max-abs-diff per type.
    "q_ks_test" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_type"), col("value"), unix_micros(col("ts")).as("us"))
      val bounds = ev.agg(min("us").as("mn"), max("us").as("mx"))
      val cells = ev.crossJoin(broadcast(bounds))
        .groupBy("event_type", "value")
        .agg(sum(when(col("us") * 2 < col("mn") + col("mx"), 1L).otherwise(0L)).as("n_a"),
          sum(when(col("us") * 2 < col("mn") + col("mx"), 0L).otherwise(1L)).as("n_b"))
      val byVal = Window.partitionBy("event_type").orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val whole = Window.partitionBy("event_type")
      cells
        .withColumn("ca", sum("n_a").over(byVal))
        .withColumn("cb", sum("n_b").over(byVal))
        .withColumn("ta", sum("n_a").over(whole))
        .withColumn("tb", sum("n_b").over(whole))
        .groupBy(col("event_type"), col("ta").as("n_a"), col("tb").as("n_b"))
        // a type entirely absent from one half has no two-sample D;
        // NULL instead of an ANSI divide-by-zero
        .agg(round(max(when(col("ta") > 0 && col("tb") > 0,
          abs(col("ca") / col("ta") - col("cb") / col("tb")))), 6)
          .as("ks_d"))
        .select("event_type", "n_a", "n_b", "ks_d")
        .orderBy("event_type")
    }),

    // --- exact 1-D Wasserstein (earth-mover) distance: how much work
    // moves each language's token-length distribution onto the
    // reference language's — the magnitude-aware complement of the KS
    // max-gap above and of q_drift_psi's binned divergence (W1 sees
    // HOW FAR mass must travel, not just that it differs; Ramdas et
    // al. 2017 for the CDF identity W1 = ∫|F_A−F_B|). Computed
    // EXACTLY, no binning: the support is integer token counts, so
    // W1 = Σ_v |F_en(v) − F_ℓ(v)|·(next(v)−v) over the merged support.
    // Scale shape: ONE corpus scan into the bounded (lang, n_tok)
    // count relation (≤ langs × max doc length rows); the en side is
    // replicated per comparison language via an explicit bounded
    // crossJoin (4-row broadcast); CDFs and the gap-sum are windows
    // over that bounded relation — the corpus is never sorted.
    "q_wasserstein_1d" -> ((s, d) => {
      import graft.functions.token_count
      val cnt = Tables.documents(s, d)
        .select(col("lang"), token_count(col("text")).cast("long").as("v"))
        .groupBy("lang", "v").agg(count(lit(1)).as("c"))
      val langs = cnt.filter(col("lang") =!= "en")
        .select(col("lang").as("cmp_lang")).distinct()
      val cells = cnt.filter(col("lang") === "en")
        .crossJoin(broadcast(langs))
        .select(col("cmp_lang"), col("v"), col("c").as("a"), lit(0L).as("b"))
        .unionAll(cnt.filter(col("lang") =!= "en")
          .select(col("lang").as("cmp_lang"), col("v"),
            lit(0L).as("a"), col("c").as("b")))
        .groupBy("cmp_lang", "v").agg(sum("a").as("a"), sum("b").as("b"))
      val byV = Window.partitionBy("cmp_lang").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val whole = Window.partitionBy("cmp_lang")
      cells
        .withColumn("ca", sum("a").over(byV))
        .withColumn("cb", sum("b").over(byV))
        .withColumn("ta", sum("a").over(whole))
        .withColumn("tb", sum("b").over(whole))
        .withColumn("dv",
          coalesce(lead("v", 1).over(Window.partitionBy("cmp_lang")
            .orderBy("v")) - col("v"), lit(0L)))
        .groupBy(col("cmp_lang"), col("ta").as("n_ref"), col("tb").as("n_cmp"))
        .agg(round(sum(abs(col("ca") / col("ta") - col("cb") / col("tb"))
          * col("dv")), 4).as("w1"))
        .select("cmp_lang", "n_ref", "n_cmp", "w1")
        .orderBy("cmp_lang")
    }),

    // --- M4 time-series downsampling (Jugel et al., VLDB 2014): the
    // error-free visualization reducer — per (series, pixel-bucket)
    // keep min, max, first, last; M4 provably reproduces the exact
    // pixel-perfect line rendering at 4 points/bucket, and unlike
    // LTTB it is embarrassingly parallel (no sequential dependence on
    // the previously selected point): ONE hash agg over the fact
    // scan, any corpus size. 32 buckets on a shared global time axis
    // (the dashboard x-axis), bucket id in pure INTEGER arithmetic
    // (`div`, no double rounding at bucket edges); first/last are
    // min_by/max_by on exact microseconds — no tie-break exists, so
    // BehaviorSpec pins (event_type, us) tie-freeness at gate scale.
    "q_m4_downsample" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("event_type"),
        unix_micros(col("ts")).as("us"), col("value"))
      val bounds = ev.agg(min("us").as("mn"), max("us").as("mx"))
      ev.crossJoin(broadcast(bounds))
        .withColumn("bucket",
          expr("((us - mn) * 32) div (mx - mn + 1)"))
        .groupBy("event_type", "bucket")
        .agg(count(lit(1)).as("n"),
          min("value").as("v_min"), max("value").as("v_max"),
          min_by(col("value"), col("us")).as("v_first"),
          max_by(col("value"), col("us")).as("v_last"),
          min("us").as("us_first"), max("us").as("us_last"))
        .orderBy("event_type", "bucket")
    }),

    // --- chi-square independence: event_type × user-cohort contingency
    // table, per-type contribution Σ(o−e)²/e. The contingency is a
    // BOUNDED hash agg (types × cohorts cells); marginals are windows
    // over that tiny cell table, so the only corpus-sized work is the
    // one grouped count.
    "q_chi_square" -> ((s, d) => {
      val observed = Tables.events(s, d)
        .select(col("event_type"), (col("user_id") % 4).as("cohort"))
        .groupBy("event_type", "cohort")
        .agg(count(lit(1)).as("n"))
      // complete the grid: an EMPTY (type, cohort) cell still contributes
      // (0 − e)²/e = e to the statistic — dropping it understates chi².
      // The grid is bounded (types × cohorts), built from two tiny
      // distinct sets, so completion costs nothing at any scale.
      val cells = observed.select("event_type").distinct()
        .crossJoin(observed.select("cohort").distinct())
        .join(observed, Seq("event_type", "cohort"), "left")
        .withColumn("n", coalesce(col("n"), lit(0L)))
      val byType = Window.partitionBy("event_type")
      val byCohort = Window.partitionBy("cohort")
      val all = Window.partitionBy(lit(1))
      cells
        .withColumn("expected",
          sum("n").over(byType) * sum("n").over(byCohort)
            / sum("n").over(all).cast("double"))
        .groupBy("event_type")
        .agg(sum("n").as("n_events"),
          round(sum((col("n") - col("expected")) * (col("n") - col("expected"))
            / col("expected")), 6).as("chi2_part"))
        .orderBy("event_type")
    }),

    // --- time-hierarchy rollup: revenue at year → quarter → month
    // grain plus the grand total in ONE pass (Expand + hash agg —
    // Catalyst plans ROLLUP as a single scan with a 4-way Expand, not
    // four scans). The drill-down cube every revenue dashboard reads.
    // --- EWMA smoothing (exponential moving average, the time-series
    // denoising primitive behind anomaly baselines and metric
    // dashboards). The recursive y_k = α·x_k + (1−α)·y_{k−1} is
    // UNROLLED to its 16-term truncated closed form so it plans as one
    // per-user window with 16 codegen'd lag() columns — no recursion,
    // no per-row state, one shuffle on user_id and a sort within the
    // partition (the 100 TB plan: sessions never cross executors).
    // α = 1/2 makes every weight 2^-(j+1) — an EXACT dyadic double
    // whose decimal literal both engines parse to the same bits, and
    // the left-associated sum order matches the oracle term-for-term,
    // so the arithmetic is bit-identical before the round(4).
    // Truncation tail ≤ 2^-16 of the oldest mass, below the rounding.
    "q_ewma_smooth" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val ewma = (0 until 16)
        .map(j => coalesce(lag(col("value"), j).over(w), lit(0.0)) *
          lit(math.pow(0.5, j + 1)))
        .reduce(_ + _)
      Tables.events(s, d)
        .filter(col("user_id") < 20)
        .select(col("user_id"), col("event_id"), col("ts"), col("value"))
        // decimal-cast before the round: the 2-decimal inputs land sums
        // exactly on 4th-decimal halves, where the two engines' DOUBLE
        // round algorithms disagree — the 12-digit decimal detour is the
        // house determinism rule
        .withColumn("ewma",
          round(ewma.cast("decimal(30,12)"), 4).cast("double"))
        .select("user_id", "event_id", "ewma")
        .orderBy("user_id", "event_id")
    }),

    "q_time_rollup" -> ((s, d) => {
      Tables.orders(s, d)
        .select(year(col("o_orderdate")).as("y"),
          quarter(col("o_orderdate")).as("q"),
          month(col("o_orderdate")).as("m"),
          col("o_totalprice"))
        .rollup("y", "q", "m")
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice").cast("decimal(30,12)")), 2)
            .cast("double").as("revenue"))
        .orderBy(asc_nulls_first("y"), asc_nulls_first("q"), asc_nulls_first("m"))
    }),

    // --- rolling actives / stickiness: daily distinct users, the
    // 7-day rolling average, and the DAU/WAU ratio. The corpus-sized
    // work is one (day, user) dedup agg; every window runs over the
    // ~day-count table, so the rolling pass is bounded no matter how
    // many events feed it.
    "q_rolling_actives" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .select(to_date(col("ts")).as("day"), col("user_id"))
        .distinct()
        .groupBy("day").agg(countDistinct(col("user_id")).as("dau"))
      val wau = Tables.events(s, d)
        .select(to_date(col("ts")).as("day"), col("user_id"))
        .distinct()
        .crossJoin(broadcast(
          Tables.events(s, d).select(to_date(col("ts")).as("d2")).distinct()))
        .filter(col("day") > date_sub(col("d2"), 7) && col("day") <= col("d2"))
        .groupBy(col("d2").as("day"))
        .agg(countDistinct(col("user_id")).as("wau"))
      val w7 = Window.orderBy("day").rowsBetween(-6, 0)
      daily.join(wau, "day")
        .withColumn("dau_7d_avg", round(avg("dau").over(w7), 4))
        .select(col("day"), col("dau"), col("wau"),
          col("dau_7d_avg"),
          round(col("dau") / col("wau"), 4).as("stickiness"))
        .orderBy("day")
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
    }),

    // --- preference-pair construction (RLHF/DPO prep): per user, the
    // highest- and lowest-scored event become one (chosen, rejected)
    // pair with its margin. Both extremes ride topk_agg k=1 — a bounded
    // per-partition heap merged map-side, so the shuffle carries ≤ 2
    // rows per (user, partition) and NOTHING is window-sorted: at
    // 100 TB this is two O(1)-state hash aggregates over the event log,
    // where the row_number formulation (the oracle) sorts every user's
    // whole history. Ties broken (score, id asc) identically in both
    // engines; score pre-rounded so the negated rejected heap sees the
    // exact same key. Single-event users produce no pair.
    "q_preference_pairs" -> ((s, d) => {
      import graft.functions.topk_agg
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          round(col("value"), 4).as("v"))
      ev.groupBy("user_id")
        .agg(topk_agg(col("v"), col("event_id"), 1).as("top"),
          topk_agg(-col("v"), col("event_id"), 1).as("bot"),
          count(lit(1)).as("n_events"))
        .filter(col("n_events") >= 2)
        .select(col("user_id"), col("n_events"),
          col("top")(0)("id").as("chosen_id"),
          col("top")(0)("score").as("chosen_val"),
          col("bot")(0)("id").as("rejected_id"),
          (-col("bot")(0)("score")).as("rejected_val"),
          round(col("top")(0)("score") + col("bot")(0)("score"), 4)
            .as("margin"))
        .orderBy("user_id")
    }))

  val oracleSql: Map[String, String] = Map(
    // same five exact decimal sums, same double algebra term-for-term
    "q_segmented_regression" ->
      """WITH g AS (
        |  SELECT event_type,
        |    count(*)::DOUBLE AS n,
        |    sum((hour(ts)::DOUBLE)::DECIMAL(30,12))::DOUBLE AS sx,
        |    sum(value::DECIMAL(30,12))::DOUBLE AS sy,
        |    sum((hour(ts)::DOUBLE * hour(ts)::DOUBLE)::DECIMAL(30,12))
        |      ::DOUBLE AS sxx,
        |    sum((hour(ts)::DOUBLE * value)::DECIMAL(30,12))::DOUBLE AS sxy,
        |    sum((value * value)::DECIMAL(30,12))::DOUBLE AS syy
        |  FROM events GROUP BY 1)
        |SELECT event_type, n::BIGINT AS n_events,
        |  round(CASE WHEN n*sxx - sx*sx > 0
        |    THEN (n*sxy - sx*sy) / (n*sxx - sx*sx) END, 4) AS slope,
        |  round(CASE WHEN n*sxx - sx*sx > 0
        |    THEN (sy - ((n*sxy - sx*sy) / (n*sxx - sx*sx)) * sx) / n
        |    END, 4) AS intercept,
        |  round(CASE WHEN n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0
        |    THEN ((n*sxy - sx*sy) * (n*sxy - sx*sy)) /
        |         ((n*sxx - sx*sx) * (n*syy - sy*sy)) END, 4) AS r2
        |FROM g ORDER BY event_type""".stripMargin,

    "q_itemitem_cooc" ->
      """WITH li AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |pairs AS (
        |  SELECT a.pk AS p1, b.pk AS p2, count(*) AS n_cooc
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY 1, 2),
        |totals AS (SELECT pk, count(*) AS n FROM li GROUP BY 1)
        |SELECT p1, p2, n_cooc, t1.n AS n1, t2.n AS n2
        |FROM pairs JOIN totals t1 ON t1.pk = p1
        |           JOIN totals t2 ON t2.pk = p2
        |ORDER BY n_cooc DESC, p1, p2 LIMIT 20""".stripMargin,

    "q_wow_growth" ->
      """WITH weekly AS (
        |  SELECT date_trunc('week', ts)::DATE AS week, event_type,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT week, event_type, n,
        |  lag(n) OVER (PARTITION BY event_type ORDER BY week) AS prev_n,
        |  CASE WHEN lag(n) OVER (PARTITION BY event_type ORDER BY week) > 0
        |    THEN round(n::DOUBLE /
        |      lag(n) OVER (PARTITION BY event_type ORDER BY week), 4)
        |  END AS wow
        |FROM weekly ORDER BY event_type, week""".stripMargin,

    "q_mode_per_group" ->
      """WITH counts AS (
        |  SELECT user_id, event_type, count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |mx AS (SELECT user_id, max(c) AS mode_n FROM counts GROUP BY 1)
        |SELECT user_id, min(event_type) AS mode_type, mode_n
        |FROM counts JOIN mx USING (user_id)
        |WHERE c = mode_n
        |GROUP BY user_id, mode_n ORDER BY user_id""".stripMargin,

    // same union-merge as-of, expressed with IGNORE NULLS windows; the
    // window order (ts, tag, event_id) is the engine's exactly
    "q_attribution" ->
      """WITH merged AS (
        |  SELECT user_id, ts, event_id, 0 AS tag,
        |    event_type AS ctype, ts AS cts, NULL::DOUBLE AS value
        |  FROM events WHERE event_type <> 'purchase'
        |  UNION ALL
        |  SELECT user_id, ts, event_id, 1, NULL, NULL, value
        |  FROM events WHERE event_type = 'purchase'),
        |carried AS (
        |  SELECT *,
        |    last_value(ctype IGNORE NULLS) OVER w AS last_type,
        |    last_value(cts IGNORE NULLS) OVER w AS last_ts
        |  FROM merged
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, tag, event_id
        |               ROWS UNBOUNDED PRECEDING))
        |SELECT CASE WHEN last_ts IS NOT NULL
        |              AND last_ts > ts - INTERVAL 7 DAY
        |         THEN last_type ELSE 'direct' END AS channel,
        |  count(*) AS n_purchases,
        |  round(sum(value::DECIMAL(30,12)), 4)::DOUBLE AS sum_value
        |FROM carried WHERE tag = 1
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_markov_transitions" ->
      """WITH tr AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |                           ORDER BY ts, event_id) AS to_type
        |  FROM events),
        |cnt AS (SELECT from_type, to_type, count(*) AS n FROM tr
        |        WHERE to_type IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT from_type, sum(n) AS tot FROM cnt GROUP BY 1)
        |SELECT from_type, to_type, n, round(n::DOUBLE / tot::DOUBLE, 4) AS p
        |FROM cnt JOIN tot USING (from_type)
        |ORDER BY from_type, to_type""".stripMargin,

    "q_preference_pairs" ->
      """WITH e AS (SELECT user_id, event_id, round(value, 4) AS v FROM events),
        |n AS (SELECT user_id, count(*) AS n_events FROM e
        |      GROUP BY 1 HAVING count(*) >= 2),
        |c AS (SELECT user_id, event_id AS chosen_id, v AS chosen_val,
        |        row_number() OVER (PARTITION BY user_id
        |                           ORDER BY v DESC, event_id) AS rn FROM e),
        |r AS (SELECT user_id, event_id AS rejected_id, v AS rejected_val,
        |        row_number() OVER (PARTITION BY user_id
        |                           ORDER BY v ASC, event_id) AS rn FROM e)
        |SELECT n.user_id, n.n_events, c.chosen_id, c.chosen_val,
        |  r.rejected_id, r.rejected_val,
        |  round(c.chosen_val - r.rejected_val, 4) AS margin
        |FROM n JOIN c ON c.user_id = n.user_id AND c.rn = 1
        |       JOIN r ON r.user_id = n.user_id AND r.rn = 1
        |ORDER BY n.user_id""".stripMargin,

    "q_ks_test" ->
      """WITH ev AS (
        |  SELECT event_type, value, epoch_us(ts) AS us FROM events),
        |b AS (SELECT min(us) AS mn, max(us) AS mx FROM ev),
        |cells AS (
        |  SELECT event_type, value,
        |    sum(CASE WHEN us * 2 < mn + mx THEN 1 ELSE 0 END) AS n_a,
        |    sum(CASE WHEN us * 2 < mn + mx THEN 0 ELSE 1 END) AS n_b
        |  FROM ev CROSS JOIN b GROUP BY 1, 2),
        |cum AS (
        |  SELECT event_type,
        |    sum(n_a) OVER (PARTITION BY event_type ORDER BY value
        |      ROWS UNBOUNDED PRECEDING) AS ca,
        |    sum(n_b) OVER (PARTITION BY event_type ORDER BY value
        |      ROWS UNBOUNDED PRECEDING) AS cb,
        |    sum(n_a) OVER (PARTITION BY event_type) AS ta,
        |    sum(n_b) OVER (PARTITION BY event_type) AS tb
        |  FROM cells)
        |SELECT event_type, ta::BIGINT AS n_a, tb::BIGINT AS n_b,
        |  round(max(CASE WHEN ta > 0 AND tb > 0
        |    THEN abs(ca / ta - cb / tb) END), 6) AS ks_d
        |FROM cum GROUP BY event_type, ta, tb
        |ORDER BY event_type""".stripMargin,

    "q_wasserstein_1d" ->
      """WITH cnt AS (
        |  SELECT lang,
        |    len(list_filter(string_split(lower(text), ' '),
        |        t -> t <> ''))::BIGINT AS v,
        |    count(*)::BIGINT AS c
        |  FROM documents GROUP BY 1, 2),
        |cells AS (
        |  SELECT l.lang AS cmp_lang, e.v, e.c AS a, 0::BIGINT AS b
        |  FROM (SELECT * FROM cnt WHERE lang = 'en') e
        |  CROSS JOIN (SELECT DISTINCT lang FROM cnt WHERE lang <> 'en') l
        |  UNION ALL
        |  SELECT lang, v, 0::BIGINT, c FROM cnt WHERE lang <> 'en'),
        |g AS (
        |  SELECT cmp_lang, v, sum(a)::BIGINT AS a, sum(b)::BIGINT AS b
        |  FROM cells GROUP BY 1, 2),
        |cum AS (
        |  SELECT cmp_lang,
        |    sum(a) OVER (PARTITION BY cmp_lang ORDER BY v
        |      ROWS UNBOUNDED PRECEDING) AS ca,
        |    sum(b) OVER (PARTITION BY cmp_lang ORDER BY v
        |      ROWS UNBOUNDED PRECEDING) AS cb,
        |    sum(a) OVER (PARTITION BY cmp_lang) AS ta,
        |    sum(b) OVER (PARTITION BY cmp_lang) AS tb,
        |    coalesce(lead(v) OVER (PARTITION BY cmp_lang ORDER BY v) - v,
        |      0) AS dv
        |  FROM g)
        |SELECT cmp_lang, ta::BIGINT AS n_ref, tb::BIGINT AS n_cmp,
        |  round(sum(abs(ca / ta - cb / tb) * dv), 4) AS w1
        |FROM cum GROUP BY cmp_lang, ta, tb
        |ORDER BY cmp_lang""".stripMargin,

    "q_m4_downsample" ->
      """WITH ev AS (
        |  SELECT event_type, epoch_us(ts) AS us, value FROM events),
        |b AS (SELECT min(us) AS mn, max(us) AS mx FROM ev)
        |SELECT event_type,
        |  ((us - mn) * 32) // (mx - mn + 1) AS bucket,
        |  count(*)::BIGINT AS n,
        |  min(value) AS v_min, max(value) AS v_max,
        |  arg_min(value, us) AS v_first, arg_max(value, us) AS v_last,
        |  min(us) AS us_first, max(us) AS us_last
        |FROM ev CROSS JOIN b
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_chi_square" ->
      """WITH observed AS (
        |  SELECT event_type, user_id % 4 AS cohort, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |cells AS (
        |  SELECT t.event_type, c.cohort, coalesce(o.n, 0) AS n
        |  FROM (SELECT DISTINCT event_type FROM observed) t
        |  CROSS JOIN (SELECT DISTINCT cohort FROM observed) c
        |  LEFT JOIN observed o
        |    ON o.event_type = t.event_type AND o.cohort = c.cohort),
        |exp_ AS (
        |  SELECT event_type, cohort, n,
        |    sum(n) OVER (PARTITION BY event_type)
        |      * sum(n) OVER (PARTITION BY cohort)
        |      / (sum(n) OVER ())::DOUBLE AS expected
        |  FROM cells)
        |SELECT event_type, sum(n)::BIGINT AS n_events,
        |  round(sum((n - expected) * (n - expected) / expected), 6) AS chi2_part
        |FROM exp_ GROUP BY 1 ORDER BY 1""".stripMargin,

    // same 16 exact-dyadic weight literals, same left-assoc term order
    // → bit-identical doubles before the round
    "q_ewma_smooth" -> {
      val terms = (0 until 16).map(j =>
        s"coalesce(lag(value, $j) OVER w, 0.0) * ${math.pow(0.5, j + 1)}")
        .mkString(" + ")
      s"""SELECT user_id, event_id,
         |  round(($terms)::DECIMAL(30,12), 4)::DOUBLE AS ewma
         |FROM events WHERE user_id < 20
         |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         |ORDER BY user_id, event_id""".stripMargin
    },

    "q_time_rollup" ->
      """SELECT year(o_orderdate) AS y, quarter(o_orderdate) AS q,
        |  month(o_orderdate) AS m, count(*) AS n_orders,
        |  round(sum(o_totalprice::DECIMAL(30,12)), 2)::DOUBLE AS revenue
        |FROM orders
        |GROUP BY ROLLUP (y, q, m)
        |ORDER BY y ASC NULLS FIRST, q ASC NULLS FIRST, m ASC NULLS FIRST""".stripMargin,

    "q_rolling_actives" ->
      """WITH du AS (SELECT DISTINCT ts::DATE AS day, user_id FROM events),
        |daily AS (SELECT day, count(DISTINCT user_id) AS dau FROM du GROUP BY 1),
        |days AS (SELECT DISTINCT day AS d2 FROM du),
        |wau AS (
        |  SELECT d2 AS day, count(DISTINCT user_id) AS wau
        |  FROM du CROSS JOIN days
        |  WHERE du.day > d2 - 7 AND du.day <= d2 GROUP BY 1),
        |j AS (SELECT daily.day, dau, wau FROM daily JOIN wau USING (day))
        |SELECT day, dau, wau,
        |  round(avg(dau) OVER (ORDER BY day
        |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS dau_7d_avg,
        |  round(dau::DOUBLE / wau, 4) AS stickiness
        |FROM j ORDER BY day""".stripMargin,

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

    "q_equidepth_hist" ->
      """WITH b AS (
        |  SELECT quantile_cont(l_extendedprice,
        |    [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875]) AS q,
        |    count(*) AS n_total,
        |    round(min(l_extendedprice), 4) AS v_lo,
        |    round(max(l_extendedprice), 4) AS v_hi
        |  FROM lineitem)
        |SELECT bucket, n_total::BIGINT AS n_total, v_lo, v_hi,
        |  abs(count(*) - n_total / 8.0) <= n_total * 0.01 + 1 AS depth_ok
        |FROM (
        |  SELECT n_total, v_lo, v_hi,
        |    1 + (l_extendedprice > q[1])::INT + (l_extendedprice > q[2])::INT
        |      + (l_extendedprice > q[3])::INT + (l_extendedprice > q[4])::INT
        |      + (l_extendedprice > q[5])::INT + (l_extendedprice > q[6])::INT
        |      + (l_extendedprice > q[7])::INT AS bucket
        |  FROM lineitem, b)
        |GROUP BY bucket, n_total, v_lo, v_hi ORDER BY bucket""".stripMargin,

    "q_anomaly_mad" ->
      """WITH med AS (
        |  SELECT event_type, quantile_cont(value, 0.5) AS med,
        |    count(*) AS n_total
        |  FROM events GROUP BY 1),
        |stats AS (
        |  SELECT event_type, quantile_cont(abs(value - med), 0.5) AS mad,
        |    max(med) AS med, max(n_total) AS n_total,
        |    sum(CASE WHEN value < med THEN 1 ELSE 0 END) AS n_lt_med,
        |    sum(CASE WHEN value <= med THEN 1 ELSE 0 END) AS n_le_med
        |  FROM events JOIN med USING (event_type) GROUP BY 1),
        |fin AS (
        |  SELECT event_type, max(n_total) AS n_total,
        |    max(n_lt_med) AS n_lt_med, max(n_le_med) AS n_le_med,
        |    sum(CASE WHEN abs(value - med) < mad THEN 1 ELSE 0 END) AS n_dev_lt,
        |    sum(CASE WHEN abs(value - med) <= mad THEN 1 ELSE 0 END) AS n_dev_le,
        |    sum(CASE WHEN value > med + 1.5 * mad THEN 1 ELSE 0 END) AS n_anom
        |  FROM events JOIN stats USING (event_type) GROUP BY 1)
        |SELECT event_type, n_total::BIGINT AS n_total,
        |  (n_lt_med <= n_total / 2.0 + (n_total * 0.01 + 1)
        |    AND n_le_med >= n_total / 2.0 - (n_total * 0.01 + 1)) AS med_rank_ok,
        |  (n_dev_lt <= n_total / 2.0 + (n_total * 0.01 + 1)
        |    AND n_dev_le >= n_total / 2.0 - (n_total * 0.01 + 1)) AS mad_rank_ok,
        |  (n_anom <= n_total / 2.0 + (n_total * 0.01 + 1)) AS anom_frac_ok
        |FROM fin ORDER BY event_type""".stripMargin,

    "q_pagerank_neardup" ->
      """WITH sh AS (
        |  SELECT doc_id, list_distinct([
        |    array_to_string(toks[i:i+2], ' ')
        |    FOR i IN range(1, greatest(len(toks) - 1, 2))
        |  ]) AS grams
        |  FROM (SELECT doc_id, list_filter(string_split(lower(text), ' '),
        |                                   t -> t <> '') AS toks
        |        FROM documents)),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE round(len(list_intersect(a.grams, b.grams))::DOUBLE /
        |        len(list_distinct(list_concat(a.grams, b.grams)))::DOUBLE, 4) >= 0.8),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION ALL SELECT id_b, id_a FROM pairs),
        |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
        |nn AS (SELECT count(*) AS n FROM deg),
        |r0 AS (SELECT src AS node, deg, 1.0 / (SELECT n FROM nn) AS rank FROM deg),
        |c1 AS (SELECT e.dst, sum(r.rank / r.deg) AS csum
        |       FROM edges e JOIN r0 r ON e.src = r.node GROUP BY 1),
        |r1 AS (SELECT d.src AS node, d.deg,
        |         0.15 / (SELECT n FROM nn) + 0.85 * coalesce(c.csum, 0) AS rank
        |       FROM deg d LEFT JOIN c1 c ON c.dst = d.src),
        |c2 AS (SELECT e.dst, sum(r.rank / r.deg) AS csum
        |       FROM edges e JOIN r1 r ON e.src = r.node GROUP BY 1),
        |r2 AS (SELECT d.src AS node, d.deg,
        |         0.15 / (SELECT n FROM nn) + 0.85 * coalesce(c.csum, 0) AS rank
        |       FROM deg d LEFT JOIN c2 c ON c.dst = d.src),
        |c3 AS (SELECT e.dst, sum(r.rank / r.deg) AS csum
        |       FROM edges e JOIN r2 r ON e.src = r.node GROUP BY 1),
        |r3 AS (SELECT d.src AS node, d.deg,
        |         0.15 / (SELECT n FROM nn) + 0.85 * coalesce(c.csum, 0) AS rank
        |       FROM deg d LEFT JOIN c3 c ON c.dst = d.src)
        |SELECT node, round(rank, 4) AS rank FROM r3
        |ORDER BY rank DESC, node LIMIT 10""".stripMargin,

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
