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
    "q_stream_bloom" -> ((s, d) => StreamingPipelines.bloomFilteredStream(s, d)),
    "q_stream_static_join" -> ((s, d) => StreamingPipelines.streamStaticJoin(s, d)),
    "q_stream_cms_state" -> ((s, d) => StreamingPipelines.cmsStatefulStream(s, d)),
    "q_stream_tws" -> ((s, d) => StreamingPipelines.cmsTransformWithState(s, d)),
    "q_stream_foreach_batch" -> ((s, d) => StreamingPipelines.foreachBatchCounts(s, d)))

  val oracleSql: Map[String, String] = Map(
    // tumbling 1-day windows == time_bucket days (epoch-aligned in both)
    "q_stream_tumbling" ->
      """SELECT time_bucket(INTERVAL '1 day', ts)::DATE AS day,
        |  event_type, count(*) AS cnt
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // streaming dropDuplicates(user_id, event_type) == DISTINCT pairs
    "q_stream_dedup" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users
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

    // foreachBatch republishes per-batch counts; summed == plain counts
    "q_stream_foreach_batch" ->
      "SELECT event_type, count(*) AS cnt FROM events GROUP BY 1 ORDER BY 1")
}
