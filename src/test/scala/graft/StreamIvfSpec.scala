package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingPipelines

/**
 * Streaming ANN index maintenance (q_stream_ivf_ingest, VERDICT r9 #5):
 * the 3-batch streamed fold-in must converge to the batch twin
 * (q_ivf_incremental) exactly, rerun deterministically, and actually
 * process the arrival batches through the versioned snapshots (not
 * fold everything in one degenerate batch).
 */
class StreamIvfSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark
  private val sf = GraftSpark.sf

  test("streamed fold-in == batch twin, rerun-deterministic, 3 real batches") {
    val run1 = StreamingPipelines.streamIvfIngest(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // 3 single-file arrivals + maxFilesPerTrigger=1 → exactly 3 merge
    // versions past v0 (a single mega-batch would hide ordering bugs)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(graft.GraftIO.root + "/stream_ivf/v3")),
      "expected 3 versioned merges (one per arrival batch)")
    val batch = SparkEntry.queries("q_ivf_incremental")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(run1 === batch,
      s"streamed accounting diverged from the batch twin:\n stream=$run1\n batch=$batch")
    val run2 = StreamingPipelines.streamIvfIngest(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(run2 === run1, "rerun must be deterministic")
    // every delta vector landed somewhere: totals add up
    assert(run1.map(_._4).sum === run1.map(_._2).sum + run1.map(_._3).sum)
    assert(run1.map(_._3).sum > 0, "the delta must be non-empty")
  }
}
