package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.PHash64

/**
 * Perceptual average-hash (PHash64 expression + q_phash_dedup):
 * robustness/contrast properties of the hash, codegen/eval agreement,
 * and the gate row.
 */
class PHashSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark
  private val sf = GraftSpark.sf

  private val base = ("a" * 10 + "z" * 10) * 32

  test("aHash is invariant to a small perturbation but flips on stripe inversion") {
    val h0 = PHash64.compute(base.getBytes("UTF-8"))
    val hPert = PHash64.compute(base.updated(305, 'c').getBytes("UTF-8"))
    val hInv = PHash64.compute((("z" * 10 + "a" * 10) * 32).getBytes("UTF-8"))
    assert(java.lang.Long.bitCount(h0 ^ hPert) <= 1,
      "1-byte perturbation must stay within 1 hamming bit")
    assert(java.lang.Long.bitCount(h0 ^ hInv) == 64,
      "stripe inversion must complement every bit")
    assert(PHash64.compute(Array.emptyByteArray) == 0L)
    // alternating 10-char stripes of 'a'(97)/'z'(122): bits alternate
    assert((h0 & 0x3L) == 0x2L, "stripe 0 ('a') below mean, stripe 1 ('z') above")
  }

  test("generated code and interpreted eval agree on every corpus payload") {
    val viaPlan = Tables.documents(spark, sf)
      .select(col("doc_id"), graft.functions.phash64(encode(col("text"), "UTF-8")).as("ph"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaDriver = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> PHash64.compute(r.getString(1).getBytes("UTF-8")))
      .toMap
    assert(viaPlan == viaDriver, "codegen'd hash differs from driver compute")
  }

  test("gate row: blocking complete, planted pair found, negative control rejected") {
    val rows = SparkEntry.queries("q_phash_dedup")(spark, sf).collect()
    assert(rows.length == 1, s"expected one row: ${rows.toSeq}")
    val r = rows(0)
    assert(r.getBoolean(3) && r.getBoolean(4) && r.getBoolean(5),
      s"flags must hold: $r")
  }

  test("exact-duplication invariance: a 10x-replicated corpus keeps overflow 0 and every flag") {
    // the round-14 property (VERDICT r13 #5): band occupancy is a
    // function of DISTINCT hashes, so replicating every payload 10x
    // (the boilerplate regime that put 14876 media-level buckets over
    // cap at 100x) changes NOTHING at the rep level — overflow stays 0,
    // the class cap absorbs the 11-member exact classes, and the
    // planted pair (max ids — the first victims of the capped lowest-id
    // rule under media-level banding) survives organically.
    import spark.implicits._
    val dir = "target/phash-dup-scratch"
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    (0 until 10).map(c => docs.select(
        (col("doc_id") + c * 1000000L).as("doc_id"), col("text")))
      .reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = SparkEntry.queries("q_phash_dedup")(spark, dir).collect()(0)
    assert(r.getBoolean(3), s"blocking_complete must hold under replication: $r")
    assert(r.getBoolean(4), s"planted pair must survive replication: $r")
    assert(r.getBoolean(5), s"negative control must stay rejected: $r")
    assert(r.getLong(6) == 0L,
      s"rep-level banding is duplication-invariant — overflow must be 0: $r")
  }

  test("byte_entropy: exact landmarks, histogram differential, codegen agreement") {
    import graft.functions.ByteEntropy
    // landmarks
    assert(ByteEntropy.compute(Array.emptyByteArray) == 0.0)
    assert(math.abs(ByteEntropy.compute(Array.fill(100)(7.toByte))) < 1e-12)
    assert(math.abs(ByteEntropy.compute(Array.tabulate(256)(_.toByte)) - 8.0) < 1e-12)
    // two equiprobable symbols → exactly 1 bit
    assert(math.abs(ByteEntropy.compute(
      Array.tabulate(64)(i => (i % 2).toByte)) - 1.0) < 1e-12)
    // independent histogram recompute on every corpus payload
    def naive(b: Array[Byte]): Double = {
      if (b.isEmpty) return 0.0
      b.groupBy(identity).values.map { g =>
        val p = g.length.toDouble / b.length
        -p * math.log(p) / math.log(2.0)
      }.sum
    }
    val viaPlan = Tables.documents(spark, sf)
      .select(col("doc_id"),
        graft.functions.byte_entropy(encode(col("text"), "UTF-8")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val viaDriver = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> naive(r.getString(1).getBytes("UTF-8"))).toMap
    assert(viaPlan.keySet == viaDriver.keySet)
    viaPlan.foreach { case (id, h) =>
      assert(math.abs(h - viaDriver(id)) < 1e-9, s"doc $id: $h vs ${viaDriver(id)}")
    }
    // gate row
    val r = SparkEntry.queries("q_media_entropy")(spark, sf).head()
    assert(r.getBoolean(1) && r.getBoolean(2) && r.getBoolean(3), s"flags: $r")
  }

  test("q_multimodal_dedup: planted pair carries all 3 channel votes, " +
      "single-channel control rejected") {
    val rows = SparkEntry.queries("q_multimodal_dedup")(spark, sf).collect()
    assert(rows.length === 1)
    val r = rows(0)
    assert(r.getString(0) === "fusion3")
    assert(r.getLong(1) === 3L, s"planted pair must carry 3 votes: $r")
    assert(r.getBoolean(2) && r.getBoolean(3) && r.getBoolean(4),
      s"every channel must vote for the full duplicate: $r")
    assert(r.getBoolean(5), s"majority rule must accept the planted pair: $r")
    // the negative control shares ONLY the embedding — exactly one vote,
    // and the fusion must reject it (one noisy channel can't delete)
    assert(r.getLong(6) === 1L, s"neg control must carry exactly 1 vote: $r")
    assert(r.getBoolean(7), s"neg control must be rejected: $r")
    // rerun determinism (blocked joins + majority rule are layout-free)
    val again = SparkEntry.queries("q_multimodal_dedup")(spark, sf).collect()
    assert(again.toSeq.toString === rows.toSeq.toString)
  }
}
