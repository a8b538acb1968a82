package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.streaming.StreamingPipelines

/**
 * Streaming surface as driver-checkable queries (SURVEY.md §2h). Each
 * runs a Structured Streaming pipeline to completion (AvailableNow) and
 * returns its result. Tumbling-window and dedup results are
 * batch-equivalent, so they carry DuckDB oracles (the batch-twin
 * technique); the rest are rows-only + StreamingSpec equivalence tests.
 */
object StreamingQueries {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "q_stream_tumbling" -> ((s, d) => StreamingPipelines.tumblingCounts(s, d)),
    "q_stream_sliding" -> ((s, d) => StreamingPipelines.slidingCounts(s, d)),
    "q_stream_session" -> ((s, d) => StreamingPipelines.sessionCounts(s, d)),
    "q_stream_dedup" -> ((s, d) => StreamingPipelines.streamDedup(s, d)),
    "q_stream_dedup_wm" -> ((s, d) =>
      StreamingPipelines.streamDedupWithinWatermark(s, d)),
    "q_stream_chained" -> ((s, d) => StreamingPipelines.streamChained(s, d)),
    "q_stream_dim_refresh" -> ((s, d) =>
      StreamingPipelines.streamDimRefresh(s, d)),
    "q_stream_bloom" -> ((s, d) => StreamingPipelines.bloomFilteredStream(s, d)),
    "q_stream_static_join" -> ((s, d) => StreamingPipelines.streamStaticJoin(s, d)),
    "q_stream_cms_state" -> ((s, d) => StreamingPipelines.cmsStatefulStream(s, d)),
    "q_stream_tws" -> ((s, d) => StreamingPipelines.cmsTransformWithState(s, d)),
    // TTL'd twin: same per-user CMS state, but every value written with a
    // 1-hour PROCESSING-TIME TTL (TimeMode.ProcessingTime) — the config
    // that bounds state under unbounded key cardinality at 100 TB. The
    // horizon is far beyond the seconds-long replay, so no eviction can
    // fire mid-run and the output equals q_stream_tws deterministically;
    // StateTtlSpec proves actual eviction with a short TTL + paced batches.
    "q_stream_tws_ttl" -> ((s, d) => StreamingPipelines.cmsTransformWithState(
      s, d, org.apache.spark.sql.streaming.TTLConfig(
        java.time.Duration.ofHours(1)), "stream_tws_ttl")),
    "q_stream_timer_session" -> ((s, d) => StreamingPipelines.sessionTimerCounts(s, d)),
    "q_stream_stream_join" -> ((s, d) => StreamingPipelines.streamStreamJoin(s, d)),
    "q_stream_outer_join" -> ((s, d) => StreamingPipelines.streamOuterJoin(s, d)),
    "q_stream_foreach_batch" -> ((s, d) => StreamingPipelines.foreachBatchCounts(s, d)),
    "q_stream_cdc_apply" -> ((s, d) => StreamingPipelines.streamCdcApply(s, d)),
    "q_stream_minhash_dedup" -> ((s, d) => StreamingPipelines.streamMinhashDedup(s, d)),
    "q_stream_quality_filter" -> ((s, d) => StreamingPipelines.streamQualityFilter(s, d)),
    "q_stream_ivf_ingest" -> ((s, d) => StreamingPipelines.streamIvfIngest(s, d)),
    "q_stream_phash_dedup" -> ((s, d) => StreamingPipelines.streamPhashDedup(s, d)),
    "q_stream_ewma" -> ((s, d) => StreamingPipelines.streamEwma(s, d)),
    "q_stream_observe" -> ((s, d) => StreamingPipelines.streamObserve(s, d)))

  val oracleSql: Map[String, String] = Map(
    // the untruncated recursion, replayed as an ordered list fold —
    // list_reduce with a prepended 0 seed runs the IDENTICAL IEEE
    // sequence (acc*0.5 + x*0.5 in (ts, event_id) order) the stream's
    // cross-batch state folds, so the final value is hash-exact
    "q_stream_ewma" ->
      """SELECT user_id,
        |  round((list_reduce(
        |    list_prepend(0.0, list(value ORDER BY ts, event_id)),
        |    (acc, x) -> acc * 0.5 + x * 0.5))::DECIMAL(30,12), 4)::DOUBLE
        |    AS ewma_final,
        |  count(*) AS n
        |FROM events WHERE user_id < 20
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    // the streamed fold-in converges to the batch twin exactly
    // (frozen quantizer + additive per-cell counts are batch-order-
    // independent) → shares q_ivf_incremental's derived oracle
    "q_stream_ivf_ingest" -> VectorQueries.ivfIncrementalOracle,
    // perceptual ingest-gate guarantee row: the planted aHash group is
    // exactly one dup group at EVERY scale (the count is scoped to the
    // planted sig — organic exact-aHash groups exist from sf0.1 up and
    // are correctly deduped, but their number is data-dependent), the
    // pair is byte-distinct, and it spanned two arrival batches
    "q_stream_phash_dedup" ->
      """SELECT 'phash_stream' AS method, 1::BIGINT AS n_planted_groups,
        |  true AS planted_pair_found, true AS planted_group_streamed,
        |  true AS payloads_differ, true AS cross_batch""".stripMargin,
    // streaming CDC apply converges to the same end state as the batch
    // MERGE (LWW-by-seq is batching-independent) → shares q_cdc_merge's
    // derived oracle
    "q_stream_cdc_apply" ->
      """WITH merged AS (
        |  SELECT o_totalprice AS price FROM orders
        |    WHERE o_orderkey % 10 NOT IN (0, 1)
        |  UNION ALL
        |  SELECT o_totalprice * 1.1 FROM orders WHERE o_orderkey % 10 = 0
        |  UNION ALL
        |  SELECT o_totalprice FROM orders WHERE o_orderkey % 10 = 2)
        |SELECT
        |  (SELECT count(*) FROM merged) AS n_rows,
        |  (SELECT count(*) FROM orders WHERE o_orderkey % 10 = 0) AS n_updated,
        |  (SELECT count(*) FROM orders WHERE o_orderkey % 10 = 2) AS n_inserted,
        |  (SELECT count(*) FROM orders WHERE o_orderkey % 10 = 1) AS n_deleted,
        |  (SELECT round(sum(price::DECIMAL(30,12)), 4)::DOUBLE FROM merged)
        |    AS sum_price""".stripMargin,

    // the streamed classifier scores are bit-identical to the batch twin
    // (exact-decimal margins under any batch split) and the file replay
    // is exactly-once, so n_scored = n_docs and the disagreement count
    // is zero by construction — both DuckDB-checkable
    "q_stream_quality_filter" ->
      """SELECT count(*) AS n_docs, count(*) AS n_scored,
        |  3::BIGINT AS n_batches, true AS stream_eq_batch
        |FROM documents""".stripMargin,

    // the streamed MinHash gate + exact verify provably equals the
    // Jaccard = 1.0 pair graph of documents ∪ planted (sig-identity is
    // implied by gram-set equality; sub-1.0 collisions are verified away)
    "q_stream_minhash_dedup" ->
      s"""WITH sh AS (
        |  SELECT doc_id, list_distinct([
        |    array_to_string(toks[i:i+2], ' ')
        |    FOR i IN range(1, greatest(len(toks) - 1, 2))
        |  ]) AS grams
        |  FROM (SELECT doc_id, list_filter(string_split(lower(text), ' '),
        |                                   t -> t <> '') AS toks
        |        FROM (SELECT doc_id, text FROM documents
        |              UNION ALL ${TextQueries.plantedValuesSql(TextQueries.plantedDupDocs)}))
        |)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  round(len(list_intersect(a.grams, b.grams))::DOUBLE /
        |        len(list_distinct(list_concat(a.grams, b.grams)))::DOUBLE, 4) AS jaccard
        |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |WHERE round(len(list_intersect(a.grams, b.grams))::DOUBLE /
        |      len(list_distinct(list_concat(a.grams, b.grams)))::DOUBLE, 4) >= 1.0
        |ORDER BY 1, 2""".stripMargin,

    // tumbling 1-day windows == time_bucket days (epoch-aligned in both)
    "q_stream_tumbling" ->
      """SELECT time_bucket(INTERVAL '1 day', ts)::DATE AS day,
        |  event_type, count(*) AS cnt
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // streaming dropDuplicates(user_id, event_type) == DISTINCT pairs
    "q_stream_dedup" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    // per-batch dim refresh: each batch sees exactly the markers of
    // previously-processed batches → 0+1+2 under ANY order; a cached
    // static dim would read 0 (the staleness bug the pipeline rules out)
    "q_stream_dim_refresh" ->
      """SELECT 3::BIGINT AS n_batches, count(*) AS n_events,
        |  3::BIGINT AS marks_seen, true AS refresh_ok
        |FROM events""".stripMargin,

    // chained stateful (dedup → windowed count): daily uniques per type,
    // restricted to windows the 1h-delay watermark provably closed
    "q_stream_chained" ->
      """SELECT time_bucket(INTERVAL '1 day', ts)::DATE AS day, event_type,
        |  count(DISTINCT (user_id, ts::DATE)) AS n_uniques
        |FROM events
        |WHERE time_bucket(INTERVAL '1 day', ts) + INTERVAL '1 day'
        |  <= (SELECT max(ts) FROM events) - INTERVAL '1 hour'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // within-watermark dedup: every copy of a (user, type, day) key lies
    // inside one day < the 3-day delay, so no key expires before its
    // last copy and the emitted set == exact first-occurrence dedup
    "q_stream_dedup_wm" ->
      """SELECT event_type,
        |  count(DISTINCT (user_id, ts::DATE)) AS n_keys
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    // sliding 2-day/1-day windows: each event lands in exactly two
    // epoch-aligned windows, starting at its day bucket and the day before
    "q_stream_sliding" ->
      """SELECT win_start, event_type, count(*) AS cnt FROM (
        |  SELECT unnest([time_bucket(INTERVAL '1 day', ts),
        |                 time_bucket(INTERVAL '1 day', ts) - INTERVAL '1 day'
        |                ])::DATE AS win_start,
        |         event_type
        |  FROM events)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // stream-static equi-join == batch join (broadcast dim both ways)
    "q_stream_static_join" ->
      """SELECT c_mktsegment, count(*) AS n_events
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // stream-stream inner join emits every in-window match (watermarks
    // only bound STATE, not the inner-join result on a replayed file),
    // so the result equals the batch attribution join; both engines read
    // the same ns parquet truncated to µs, so the 2h boundary agrees
    "q_stream_stream_join" ->
      """SELECT c.user_id, count(*) AS n_pairs
        |FROM events c JOIN events p
        |  ON c.user_id = p.user_id
        | AND c.event_type = 'click' AND p.event_type = 'purchase'
        | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 2 HOUR
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // left-outer stream-stream join under the 4h closed-window margin:
    // every counted click's join window closed strictly below the final
    // watermark, so matches AND null rows have provably emitted — the
    // batch left join under the same cutoff is exact
    "q_stream_outer_join" ->
      """WITH cut AS (SELECT max(ts) - INTERVAL 4 HOUR AS c FROM events),
        |c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase')
        |SELECT c.user_id, count(*) AS n_rows,
        |  count(p.ts) AS n_matched,
        |  count(*) FILTER (WHERE p.ts IS NULL) AS n_unmatched
        |FROM c LEFT JOIN p
        |  ON c.user_id = p.user_id
        | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 2 HOUR, cut
        |WHERE c.ts <= cut.c
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // foreachBatch republishes per-batch counts; summed == plain counts
    "q_stream_foreach_batch" ->
      "SELECT event_type, count(*) AS cnt FROM events GROUP BY 1 ORDER BY 1",

    // per-user CMS state at ε=0.05 → width 55 ≫ the event_type keyspace
    // (5 values), so the per-user "click" estimate is provably the exact
    // filtered count (a full-depth collision under the pinned seed has
    // probability (4/55)^7 ≈ 1e-8 and would be deterministic and
    // IDENTICAL across every user if it occurred — the gate would fail
    // loudly, not flake). Sizing is CmsStateSizing (round 10): 3.2 KB
    // per user keeps the 100× 200k-key state load at ~640 MB, inside
    // the memory store — the previous 160 KB/user OOMed it.
    "q_stream_cms_state" ->
      """SELECT user_id, count(*) FILTER (WHERE event_type = 'click') AS click_est
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    // same sizing argument — transformWithState twin produces the same
    // per-user CMS (proven byte-equivalent to mapGroupsWithState in
    // StreamingSpec), so the same exact-count oracle applies
    "q_stream_tws" ->
      """SELECT user_id, count(*) FILTER (WHERE event_type = 'click') AS click_est
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    // TTL'd twin: the 1h processing-time horizon cannot elapse during
    // the replay, so the TTL'd state answers identically — same oracle
    "q_stream_tws_ttl" ->
      """SELECT user_id, count(*) FILTER (WHERE event_type = 'click') AS click_est
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    // bloom prefilter (no false negatives) + exact member verify ==
    // click counts of purchasing users, plain SQL
    "q_stream_bloom" ->
      """SELECT user_id, count(*) AS n_clicks
        |FROM events
        |WHERE event_type = 'click'
        |  AND user_id IN (SELECT user_id FROM events WHERE event_type = 'purchase')
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // timer-driven DIY sessions (transformWithState + event-time timers)
    // share the built-in session_window pipeline's closed-session margin
    // and therefore its oracle
    "q_stream_timer_session" ->
      """WITH cut AS (SELECT max(ts) - INTERVAL 8 HOUR AS c FROM events),
        |marks AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w >= INTERVAL 6 HOUR
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |sess AS (
        |  SELECT user_id, ts,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
        |                        ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM marks),
        |per AS (SELECT user_id, sid, count(*) AS n_events, max(ts) AS last_ev
        |        FROM sess GROUP BY 1, 2),
        |closed AS (SELECT user_id, n_events FROM per, cut WHERE last_ev <= c)
        |SELECT user_id, count(*) AS n_sessions, sum(n_events)::BIGINT AS n_events
        |FROM closed GROUP BY 1 ORDER BY 1""".stripMargin,

    // watermark-finalized sessions == gaps-and-islands with the same
    // closed-session cutoff: stream keeps sessions with window end
    // ≤ max_ts − 2h, i.e. last event ≤ max_ts − 8h (6h gap + 2h margin)
    "q_stream_session" ->
      """WITH cut AS (SELECT max(ts) - INTERVAL 8 HOUR AS c FROM events),
        |marks AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w >= INTERVAL 6 HOUR
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |sess AS (
        |  SELECT user_id, ts,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
        |                        ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM marks),
        |per AS (SELECT user_id, sid, count(*) AS n_events, max(ts) AS last_ev
        |        FROM sess GROUP BY 1, 2),
        |closed AS (SELECT user_id, n_events FROM per, cut WHERE last_ev <= c)
        |SELECT user_id, count(*) AS n_sessions, sum(n_events)::BIGINT AS n_events
        |FROM closed GROUP BY 1 ORDER BY 1""".stripMargin,

    // the per-batch observed metrics, summed across the 3 file batches,
    // must equal the batch recomputation over the whole table
    "q_stream_observe" ->
      """SELECT event_type, count(*) AS cnt,
        |  3::BIGINT AS n_batches_observed,
        |  (SELECT count(*) FROM events) AS rows_observed,
        |  (SELECT round(sum(value::DECIMAL(30,12)), 4)::DOUBLE
        |     FROM events) AS value_observed
        |FROM events
        |GROUP BY 1 ORDER BY 1""".stripMargin)
}
