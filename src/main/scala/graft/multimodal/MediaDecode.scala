package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Opaque media payload + typed metadata (the multimodal column model). */
case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

/** Decoded metadata a real decoder would emit (width/height/duration…). */
case class MediaMeta(media_id: Long, kind: String, n_bytes: Int,
    width: Int, height: Int, ok: Boolean)

/**
 * Multimodal decode plumbing (SURVEY.md §2j).
 *
 * Real pipelines run image/audio decode as a per-partition batched stage
 * (PySpark: `mapInPandas`; Scala-native equivalent: `mapPartitions` over a
 * typed Dataset, amortizing decoder init per partition, never per row).
 * The container ships no media libraries, so [[decodeStub]] is a
 * clearly-marked deterministic fake — the partitioning, batch shape,
 * schema, and post-decode analytics around it are the real thing.
 */
object MediaDecode {

  /**
   * STUB decoder — stands in for e.g. libjpeg. Deterministic fake:
   * "dimensions" derived from payload bytes. Swap the body for a real
   * decoder; the surrounding plan does not change.
   */
  def decodeStub(payload: Array[Byte]): (Int, Int, Boolean) = {
    if (payload == null || payload.isEmpty) (0, 0, false)
    else {
      var h = 1125899906842597L
      var i = 0
      while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
      (((h & 0x7FFFFFFF) % 1920).toInt + 1, ((h >>> 32) % 1080).toInt + 1, true)
    }
  }

  /** documents → fake media table → batched decode → per-kind stats. */
  def decodeStats(spark: SparkSession, documents: DataFrame): DataFrame = {
    import spark.implicits._
    val media = documents.select(
        col("doc_id").as("media_id"),
        // deterministic modality assignment standing in for a real mime col
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
    val decoded = media.mapPartitions { rows =>
      // decoder init happens HERE, once per partition, not per row
      rows.map { r =>
        val (w, h, ok) = decodeStub(r.payload)
        MediaMeta(r.media_id, r.kind, r.payload.length, w, h, ok)
      }
    }
    // dims_ok pins the decoder CONTRACT (w ∈ [1,1920], h ∈ [1,1080] for
    // every decodable payload) rather than the stub's hash values — the
    // n/bytes/ok columns plus the contract flag are all expressible in
    // plain SQL, so the whole pipeline is oracle-checkable even though
    // the stub's fake dimensions are not.
    decoded.toDF()
      .groupBy("kind")
      .agg(count(lit(1)).as("n"),
        sum(col("n_bytes").cast("long")).as("total_bytes"),
        sum(when(col("ok"), 1L).otherwise(0L)).as("n_ok"),
        coalesce(min(when(col("ok"), col("width"))) >= 1 &&
          max(when(col("ok"), col("width"))) <= 1920 &&
          min(when(col("ok"), col("height"))) >= 1 &&
          max(when(col("ok"), col("height"))) <= 1080,
          lit(true)).as("dims_ok")) // vacuously true with no decodable rows
      .orderBy("kind")
  }

  /**
   * Frame-sampling plan shape: one output row per sampled frame index,
   * the explode pattern of video frame extraction (every 10th frame of a
   * fake frame count derived from payload size).
   */
  def frameSample(spark: SparkSession, documents: DataFrame): DataFrame = {
    documents.select(
        col("doc_id").as("media_id"),
        encode(col("text"), "UTF-8").as("payload"))
      .withColumn("n_frames", (octet_length(col("payload")) / 10).cast("int"))
      // guard: sequence(0, -1, 10) throws (positive step needs start<=stop),
      // so a sub-10-byte payload (n_frames = 0) must yield NULL — explode
      // then drops the row instead of killing the query.
      .withColumn("frame_idx",
        explode(when(col("n_frames") > 0,
          sequence(lit(0), col("n_frames") - 1, lit(10)))))
      .groupBy("media_id")
      .agg(count(lit(1)).as("n_sampled"),
        max("frame_idx").cast("long").as("last_frame"))
      .orderBy("media_id")
  }
}
