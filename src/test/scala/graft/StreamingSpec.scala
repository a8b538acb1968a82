package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingPipelines

/**
 * Batch-twin equivalence (SURVEY.md §5.4): the Structured Streaming
 * pipelines replayed over the static events table must produce exactly
 * the result of the equivalent batch query — the declarative-model
 * guarantee the engine's streaming surface is built on.
 */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark
  import spark.implicits._

  test("tumbling window stream == batch window aggregate") {
    val stream = StreamingPipelines.tumblingCounts(spark, GraftSpark.sf)
    val batch = Tables.events(spark, GraftSpark.sf)
      .groupBy(window($"ts", "1 day"), $"event_type")
      .agg(count(lit(1)).as("cnt"))
      .select($"window.start".cast("date").as("day"), $"event_type", $"cnt")
      .orderBy("day", "event_type")
    assert(stream.collect().toSeq === batch.collect().toSeq)
  }

  test("streaming dedup == batch distinct") {
    val stream = StreamingPipelines.streamDedup(spark, GraftSpark.sf)
    val batch = Tables.events(spark, GraftSpark.sf)
      .select("user_id", "event_type").distinct()
      .groupBy("event_type").agg(count(lit(1)).as("n_users"))
      .orderBy("event_type")
    assert(stream.collect().toSeq === batch.collect().toSeq)
  }

  test("bloom-filtered stream keeps every true member (no false negatives)") {
    val got = StreamingPipelines.bloomFilteredStream(spark, GraftSpark.sf)
      .select("user_id").as[Long].collect().toSet
    val trueMembers = {
      val ev = Tables.events(spark, GraftSpark.sf)
      val purchasers = ev.filter($"event_type" === "purchase")
        .select("user_id").distinct()
      ev.filter($"event_type" === "click")
        .join(purchasers, "user_id")
        .select("user_id").as[Long].collect().toSet
    }
    assert(trueMembers.subsetOf(got), "bloom stream dropped a true member")
  }

  test("stateful CMS stream estimates >= exact per-user click counts") {
    val est = StreamingPipelines.cmsStatefulStream(spark, GraftSpark.sf)
      .as[(Long, Long)].collect().toMap
    val exact = Tables.events(spark, GraftSpark.sf)
      .filter($"event_type" === "click")
      .groupBy("user_id").count()
      .as[(Long, Long)].collect().toMap
    exact.foreach { case (u, c) =>
      assert(est.getOrElse(u, 0L) >= c, s"user $u: est ${est.get(u)} < exact $c")
    }
  }

  test("session windows: stream (append + watermark) == batch for finalized users") {
    // append mode only emits a session once the watermark (max ts - 1h)
    // passes its end (last event + 6h gap), and the pipeline then keeps
    // only sessions ending >= 1h INSIDE the watermark (end <= max - 2h,
    // i.e. last event <= max - 8h) so the result is margin-deterministic.
    // So: exact equality for users whose activity ends >8h before the
    // stream ends, subset for the rest.
    val stream = StreamingPipelines.sessionCounts(spark, GraftSpark.sf)
      .as[(Long, Long, Long)].collect()
      .map { case (u, ns, ne) => u -> ((ns, ne)) }.toMap
    val ev = Tables.events(spark, GraftSpark.sf)
    val batch = ev
      .groupBy(session_window($"ts", "6 hours"), $"user_id")
      .agg(count(lit(1)).as("n_events"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum("n_events").as("n_events"))
      .as[(Long, Long, Long)].collect()
      .map { case (u, ns, ne) => u -> ((ns, ne)) }.toMap
    val cutoff = new java.sql.Timestamp(
      ev.agg(max($"ts")).head().getTimestamp(0).getTime - 8L * 3600 * 1000)
    val finalized = ev.groupBy("user_id").agg(max($"ts").as("mx"))
      .filter($"mx" < lit(cutoff)).select("user_id").as[Long].collect().toSet

    finalized.foreach { u =>
      assert(stream.get(u) === batch.get(u),
        s"user $u: stream ${stream.get(u)} != batch ${batch.get(u)}")
    }
    stream.foreach { case (u, (ns, ne)) =>
      val (bs, be) = batch(u)
      assert(ns <= bs && ne <= be, s"stream emitted more than batch for $u")
    }
  }

  test("flatMapGroupsWithState: multi-row emission per key update") {
    // the 0..n-rows-per-key variant of mapGroupsWithState (the API the
    // session-close / alert-emission patterns use): emit one row per
    // event type a user has seen, refreshed every batch
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val updateFn = (userId: Long, rows: Iterator[(Long, String)],
        state: GroupState[Set[String]]) => {
      val seen = state.getOption.getOrElse(Set.empty) ++ rows.map(_._2)
      state.update(seen)
      seen.toSeq.sorted.map(et => (userId, et)).iterator
    }
    val out = StreamingPipelines.eventStream(spark, GraftSpark.sf)
      .select($"user_id", $"event_type").as[(Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(updateFn)
      .toDF("user_id", "event_type")
    val got = graft.streaming.StreamingPipelines
      .runToMemory(spark, out, "fmgws", org.apache.spark.sql.streaming.OutputMode.Update())
      .distinct().as[(Long, String)].collect().toSet
    val expected = Tables.events(spark, GraftSpark.sf)
      .select($"user_id", $"event_type").distinct()
      .as[(Long, String)].collect().toSet
    assert(got === expected)
  }

  test("transformWithState (RocksDB) == mapGroupsWithState CMS pipeline") {
    // same seed, same per-key update sequence → identical estimates; this
    // pins the Spark-4 state API + RocksDB provider to the HDFS-backed
    // mapGroupsWithState twin
    val tws = StreamingPipelines.cmsTransformWithState(spark, GraftSpark.sf)
      .as[(Long, Long)].collect().toSeq
    val mgws = StreamingPipelines.cmsStatefulStream(spark, GraftSpark.sf)
      .as[(Long, Long)].collect().toSeq
    assert(tws === mgws)
  }

  test("streaming minhash gate finds the planted CROSS-BATCH duplicate groups") {
    val got = StreamingPipelines.streamMinhashDedup(spark, GraftSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every planted pair must surface; the alpha pair's members land in
    // DIFFERENT micro-batches (ids mod 3 = 1 and 2 with
    // maxFilesPerTrigger=1), so finding it requires keyed state to
    // survive across batches — the property this pipeline exists to prove
    val planted = Set((9000001L, 9000002L), (9000003L, 9000004L),
      (9000003L, 9000005L), (9000004L, 9000005L))
    assert(planted.subsetOf(got), s"missing planted pairs: ${planted -- got}")
    // deterministic under re-run (fresh state dir, same batch split)
    val rerun = StreamingPipelines.streamMinhashDedup(spark, GraftSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rerun === got)
  }

  test("streaming EWMA: cross-batch recursion == driver fold, multi-batch state real") {
    val result = StreamingPipelines.streamEwma(spark, GraftSpark.sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    // driver fold over the globally ordered history — the untruncated
    // recursion the stream's state is supposed to carry across batches
    val hist = Tables.events(spark, GraftSpark.sf)
      .filter(col("user_id") < 20)
      .select("user_id", "event_id", "ts", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getDouble(3)))
    def round4(x: Double): Double =
      new java.math.BigDecimal(x)
        .setScale(12, java.math.RoundingMode.HALF_UP)
        .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    val expect = hist.groupBy(_._1).map { case (u, evs) =>
      val ordered = evs.sortBy(e => (e._3.getTime, e._3.getNanos, e._2))
      u -> (round4(ordered.foldLeft(0.0)((a, e) => a * 0.5 + e._4 * 0.5)),
        ordered.length.toLong)
    }
    assert(result.length === expect.size)
    result.foreach { case (u, ewma, n) =>
      assert((ewma, n) === expect(u), s"user $u")
    }
    // the memory sink saw >1 emission for most users — i.e. state REALLY
    // crossed micro-batch boundaries (a single-batch run emits once/user)
    val emissions = spark.table("stream_ewma")
      .groupBy("user_id").count().collect().map(_.getLong(1))
    assert(emissions.count(_ >= 2) > emissions.length / 2,
      "most users should emit from multiple micro-batches")
    // rerun-deterministic (fresh state dir, same rank-range batch split)
    val rerun = StreamingPipelines.streamEwma(spark, GraftSpark.sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(rerun.toSeq === result.toSeq)
  }

  test("streaming observe: per-batch metrics sum to the batch totals") {
    val got = StreamingPipelines.streamObserve(spark, GraftSpark.sf)
      .collect()
    val ev = Tables.events(spark, GraftSpark.sf)
    val nTotal = ev.count()
    // observed totals are batch-order-independent sums; they must equal
    // the direct batch computation, and the 3-file split must be REAL
    // (3 observed non-empty batches, none skipped or merged)
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getAs[Long]("n_batches_observed") === 3L)
      assert(r.getAs[Long]("rows_observed") === nTotal)
    }
    // per-type counts in the complete-mode final state == batch groupBy
    val want = ev.groupBy("event_type").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    got.foreach(r =>
      assert(r.getAs[Long]("cnt") === want(r.getAs[String]("event_type"))))
    // rerun determinism (fresh files, same residue split)
    val rerun = StreamingPipelines.streamObserve(spark, GraftSpark.sf)
      .collect().map(_.toString).toSeq
    assert(rerun === got.map(_.toString).toSeq)
  }
}
