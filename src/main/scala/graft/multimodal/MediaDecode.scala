package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem, AudioFileFormat}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Decoded metadata: spatial dims (visual kinds), unit count (1 image /
  * n audio frames / n video frames), mean sample value, decode success. */
case class MediaMeta(media_id: Long, kind: String, width: Int, height: Int,
    n_units: Long, px_mean: Option[Double], ok: Boolean)

/** One sampled (decoded) frame of a video container. */
case class FrameMeta(media_id: Long, frame_idx: Int, width: Int, height: Int,
    px_mean: Double)

/**
 * Multimodal decode over REAL codecs (SURVEY.md §2j; VERDICT r9 #2 —
 * replaces the round-1..8 stub codec).
 *
 * The container ships no external media libraries, but the JDK itself
 * carries two real ones: `javax.imageio` (PNG encode/decode) and
 * `javax.sound.sampled` (WAV encode/decode). Payloads are synthesized
 * executor-side as REAL containers — grayscale PNGs, PCM WAVs, and a
 * length-prefixed PNG-frame stream for video — with dimensions and
 * sample values derived deterministically from `media_id`, so the
 * DuckDB oracle can recompute every decoded statistic from the
 * generation formulas while the engine recovers them by actually
 * parsing the bytes. A wrong decode (or a codec that stopped reading
 * real pixels) breaks the hash gate.
 *
 * Decode runs as a per-partition batched stage (`mapPartitions` over a
 * typed Dataset): codec init — including `ImageIO.setUseCache(false)`,
 * which otherwise writes temp files per call — happens once per
 * partition, never per row. That is the Scala-native equivalent of the
 * `mapInPandas` batching a Python pipeline would use, and the shape a
 * 1000-executor decode stage needs (embarrassingly parallel, no
 * shuffle until the per-kind aggregate).
 */
object MediaDecode {

  // ---- deterministic generation formulas (mirrored in the oracle SQL)
  def imgW(id: Long): Int = 16 + (id % 48).toInt
  def imgH(id: Long): Int = 16 + 2 * ((id / 7) % 16).toInt // always even
  def imgTop(id: Long): Int = (id % 256).toInt
  def imgBot(id: Long): Int = (id * 7 % 256).toInt
  def wavFrames(id: Long): Int = 1000 + (id % 3000).toInt
  def wavValue(id: Long): Int = 64 + (id % 128).toInt
  def vidFrames(id: Long): Int = 20 + (id % 50).toInt
  def vidFill(id: Long, frame: Int): Int = ((id + frame) % 256).toInt
  val VidDim = 8

  // ---- synthesis: REAL container bytes --------------------------------

  /** Two-band grayscale PNG: top half imgTop, bottom half imgBot — the
    * per-image mean is exactly (top+bot)/2 because the height is even
    * and PNG is lossless. */
  def synthPng(id: Long): Array[Byte] = {
    val (w, h) = (imgW(id), imgH(id))
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      val v = if (y < h / 2) imgTop(id) else imgBot(id)
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, v); x += 1 }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Constant-amplitude unsigned-8-bit mono PCM WAV (8 kHz). */
  def synthWav(id: Long): Array[Byte] = {
    val n = wavFrames(id)
    val data = Array.fill[Byte](n)(wavValue(id).toByte)
    val fmt = new AudioFormat(8000f, 8, 1, false, false) // unsigned, LE
    val ais = new AudioInputStream(new ByteArrayInputStream(data), fmt, n.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Video stand-in: a length-prefixed stream of real PNG frames
    * ([4-byte BE length][PNG bytes]…) — constant-fill 8×8 frames, frame
    * k filled with vidFill(id, k). The framing supports the operation
    * that matters at scale: SEEKING past frames without decoding them. */
  def synthVideo(id: Long): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    var k = 0
    val n = vidFrames(id)
    while (k < n) {
      val img = new BufferedImage(VidDim, VidDim, BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var y = 0
      while (y < VidDim) {
        var x = 0
        while (x < VidDim) { raster.setSample(x, y, 0, vidFill(id, k)); x += 1 }
        y += 1
      }
      val fb = new ByteArrayOutputStream()
      ImageIO.write(img, "png", fb)
      val bytes = fb.toByteArray
      out.writeInt(bytes.length)
      out.write(bytes)
      k += 1
    }
    out.flush()
    bos.toByteArray
  }

  // ---- decode: the real parsers --------------------------------------

  /** PNG → (width, height, mean sample). None on undecodable bytes
    * (ImageIO signals corruption both ways: null for an unrecognized
    * container, IIOException for a recognized-but-truncated one). */
  def decodeImage(payload: Array[Byte]): Option[(Int, Int, Double)] = {
    if (payload == null || payload.isEmpty) return None
    val img =
      try ImageIO.read(new ByteArrayInputStream(payload))
      catch { case _: java.io.IOException => null }
    if (img == null) return None
    val (w, h) = (img.getWidth, img.getHeight)
    val raster = img.getRaster
    var sum = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { sum += raster.getSample(x, y, 0); x += 1 }
      y += 1
    }
    Some((w, h, sum.toDouble / (w.toLong * h)))
  }

  /** WAV → (channels, frame count, mean unsigned sample). */
  def decodeWav(payload: Array[Byte]): Option[(Int, Long, Double)] = {
    if (payload == null || payload.isEmpty) return None
    try {
      val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
      val fmt = ais.getFormat
      val frames = ais.getFrameLength
      val buf = new Array[Byte](4096)
      var sum = 0L
      var total = 0L
      var read = ais.read(buf)
      while (read > 0) {
        var i = 0
        while (i < read) { sum += buf(i) & 0xff; i += 1 }
        total += read
        read = ais.read(buf)
      }
      if (total == 0) None
      else Some((fmt.getChannels, frames, sum.toDouble / total))
    } catch { case _: Exception => None }
  }

  /** Walk the frame container WITHOUT decoding: frame count + the byte
    * offsets of every `step`-th frame (the seek path of frame sampling). */
  def frameIndex(payload: Array[Byte], step: Int): Seq[(Int, Int, Int)] = {
    // (frame_idx, offset, length) for sampled frames
    val out = Seq.newBuilder[(Int, Int, Int)]
    var pos = 0
    var k = 0
    while (pos + 4 <= payload.length) {
      val len = ((payload(pos) & 0xff) << 24) | ((payload(pos + 1) & 0xff) << 16) |
        ((payload(pos + 2) & 0xff) << 8) | (payload(pos + 3) & 0xff)
      if (k % step == 0) out += ((k, pos + 4, len))
      pos += 4 + len
      k += 1
    }
    out.result()
  }

  /** Container frame count only (seek-through, zero decodes). */
  def frameCount(payload: Array[Byte]): Int = {
    var pos = 0
    var k = 0
    while (pos + 4 <= payload.length) {
      val len = ((payload(pos) & 0xff) << 24) | ((payload(pos + 1) & 0xff) << 16) |
        ((payload(pos + 2) & 0xff) << 8) | (payload(pos + 3) & 0xff)
      pos += 4 + len
      k += 1
    }
    k
  }

  /** NEAREST-neighbor half-size resize of a decoded image — the
    * thumbnail/feature-extract step of a media pipeline. Nearest (not
    * bilinear) keeps the oracle exact: with even source dims, every
    * target pixel samples one source pixel, so a two-band source
    * resizes to a two-band half-image with the SAME band values and
    * the mean is still exactly (top+bot)/2. */
  def resizeHalf(img: BufferedImage): BufferedImage = {
    val (w, h) = (math.max(1, img.getWidth / 2), math.max(1, img.getHeight / 2))
    val out = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val src = img.getRaster
    val dst = out.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { dst.setSample(x, y, 0, src.getSample(x * 2, y * 2, 0)); x += 1 }
      y += 1
    }
    out
  }

  /** documents → synthesized real containers → batched decode →
    * per-kind stats, every column recomputable from the generation
    * formulas in plain SQL. */
  def decodeStats(spark: SparkSession, documents: DataFrame): DataFrame = {
    import spark.implicits._
    val ids = documents.select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"))
      .as[(Long, String)]
      // the decode is CPU-bound and the id relation is tiny in BYTES, so
      // the scan arrives in 1-2 partitions and the whole decode ran on
      // one task (ProfileQ round 17: 2.1 s single-task stage, 31 cores
      // idle). One explicit round-robin spread sizes the stage to the
      // cluster's cores — defaultParallelism, not a local constant; AQE
      // byte-based coalescing would fold tiny-byte/heavy-CPU rows back
      // to one task, which is why this is not a repartition(col).
      .repartition(documents.sparkSession.sparkContext.defaultParallelism)
    val decoded = ids.mapPartitions { rows =>
      ImageIO.setUseCache(false) // once per partition, not per row
      rows.map { case (id, kind) =>
        kind match {
          case "image" =>
            decodeImage(synthPng(id)) match {
              case Some((w, h, mean)) => MediaMeta(id, kind, w, h, 1L, Some(mean), ok = true)
              case None => MediaMeta(id, kind, 0, 0, 0L, None, ok = false)
            }
          case "audio" =>
            decodeWav(synthWav(id)) match {
              case Some((ch, frames, mean)) =>
                MediaMeta(id, kind, 0, ch, frames, Some(mean), ok = true)
              case None => MediaMeta(id, kind, 0, 0, 0L, None, ok = false)
            }
          case _ => // video: container walk + decode of the FIRST frame
            val payload = synthVideo(id)
            val n = frameCount(payload)
            frameIndex(payload, step = Int.MaxValue).headOption.flatMap {
              case (_, off, len) =>
                decodeImage(java.util.Arrays.copyOfRange(payload, off, off + len))
            } match {
              case Some((w, h, mean)) =>
                MediaMeta(id, kind, w, h, n.toLong, Some(mean), ok = true)
              case None => MediaMeta(id, kind, 0, 0, 0L, None, ok = false)
            }
        }
      }
    }
    decoded.toDF()
      .groupBy("kind")
      .agg(count(lit(1)).as("n"),
        sum(when(col("ok"), 1L).otherwise(0L)).as("n_ok"),
        round(avg("width"), 4).as("avg_w"),
        round(avg("height"), 4).as("avg_h"),
        round(avg("n_units"), 4).as("avg_units"),
        round(avg("px_mean"), 4).as("avg_px"))
      .orderBy("kind")
  }

  /**
   * Frame sampling over the video containers: SEEK past 9 of every 10
   * frames (length-prefix walk, no decode), decode only the sampled
   * frames with the real PNG codec, aggregate per media. The skip:decode
   * ratio is the entire economics of frame sampling at 100 TB — the
   * framing walk touches 4 bytes per skipped frame.
   */
  def frameSample(spark: SparkSession, documents: DataFrame): DataFrame = {
    import spark.implicits._
    val vids = documents.filter(col("doc_id") % 3 === 2)
      .select(col("doc_id").as("media_id")).as[Long]
      // same CPU-bound spread as decodeStats: one id expands to all of
      // its frames inside one task, so per-media aggregates stay
      // deterministic under any partitioning
      .repartition(documents.sparkSession.sparkContext.defaultParallelism)
    val frames = vids.mapPartitions { rows =>
      ImageIO.setUseCache(false)
      rows.flatMap { id =>
        val payload = synthVideo(id)
        frameIndex(payload, step = 10).flatMap { case (k, off, len) =>
          decodeImage(java.util.Arrays.copyOfRange(payload, off, off + len))
            .map { case (w, h, mean) => FrameMeta(id, k, w, h, mean) }
        }
      }
    }
    frames.toDF()
      .groupBy("media_id")
      .agg(count(lit(1)).as("n_sampled"),
        max("frame_idx").cast("long").as("last_frame"),
        round(avg("px_mean"), 4).as("avg_px"))
      .orderBy("media_id")
  }
}
