package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.CurationQueries

/**
 * In-plan quality classifier (q_quality_classifier): driver-side full
 * differential. Reimplements the WHOLE pipeline independently —
 * tokenize → 3-gram xxhash → bucket → presence features → 3 integer-
 * scaled logistic-GD steps — and requires the engine's learned weight
 * relation to match BIT-EXACTLY, which is the decimal-exact-training
 * claim: no distributed sum order may perturb a single weight.
 */
class QcSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark
  private val sf = GraftSpark.sf

  private val D = 1L << 22
  private val BIAS = -1L
  private val ETA = 0.05
  private val STEPS = 3

  /** Catalyst's own xxhash64 on string literals (seed 42) — the same
    * value the plan's xxhash64(...) computes, evaluated eagerly. */
  private def xx(parts: Seq[String]): Long = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    XxHash64(parts.map(p => Literal.create(p)), 42L).eval(null).asInstanceOf[Long]
  }

  private def tokensOf(text: String): Seq[String] = {
    val t = text.replaceAll("^[ \t\n\f\r]+|[ \t\n\f\r]+$", "")
    if (t.isEmpty) Seq.empty else t.toLowerCase.split("\\s+").toSeq
  }

  private def r0(x: Double): Long =
    java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue.toLong

  test("engine-trained weights match a full driver-side GD recomputation bit-exactly") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // features: distinct 3-gram hash buckets (whole-doc gram for short
    // docs) + the bias bucket; label = english
    val feats: Map[Long, (Double, Set[Long])] = docs.map { case (id, text, lang) =>
      val tk = tokensOf(text)
      val hashes =
        if (tk.size >= 3) tk.sliding(3).map(g => xx(g)).toSet
        else Set(xx(Seq(tk.mkString(" "))))
      val buckets = hashes.map(h => Math.floorMod(h, D)) + BIAS
      id -> (if (lang == "en") 1.0 else 0.0, buckets)
    }.toMap
    // 3 GD steps, mirroring the plan's integer-scaled arithmetic
    var w = feats.values.flatMap(_._2).toSet.map((b: Long) => b -> 0.0).toMap
    for (_ <- 1 to STEPS) {
      val rs: Map[Long, Long] = feats.map { case (id, (y, bs)) =>
        // margin: sum of exact integer products, then the same casts
        val mScaled = bs.toSeq.map(b => r0(w(b) * 1e9) * 1000000L).sum
        val m = mScaled.toDouble / 1e15
        id -> r0((1.0 / (1.0 + math.exp(-m)) - y) * 1e8)
      }
      val byBucket = feats.toSeq
        .flatMap { case (id, (_, bs)) => bs.toSeq.map(b => b -> rs(id)) }
        .groupBy(_._1)
      w = byBucket.map { case (b, g) =>
        val gsum = g.map(_._2 * 1000000L).sum // exact: |rs·xs| ≤ 1e14 per term
        b -> (w(b) - ETA * (gsum.toDouble / 1e14 / g.size))
      }
    }
    val got = CurationQueries.qcTrain(spark, sf)._2.collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == w.keySet,
      s"bucket sets differ: engine ${got.size} vs driver ${w.size}")
    val mism = w.collect { case (b, wv) if got(b) != wv => (b, wv, got(b)) }
    assert(mism.isEmpty,
      s"${mism.size} weights differ (first 5: ${mism.take(5).toSeq})")
  }

  test("gate row is deterministic and all flags hold") {
    val rows = SparkEntry.queries("q_quality_classifier")(spark, sf).collect()
    assert(rows.length == 1, s"expected one row, got ${rows.toSeq}")
    val r = rows(0)
    assert(r.getBoolean(2) && r.getBoolean(3) && r.getBoolean(4),
      s"classifier flags must all hold: $r")
  }

  test("training separates the classes (measured metrics clear the floors with margin)") {
    val m = CurationQueries.qcMetrics(spark, sf).head()
    val (acc, keepEn, keepOther, loss) =
      (m.getDouble(1), m.getDouble(2), m.getDouble(3), m.getDouble(4))
    info(f"acc=$acc%.4f keep_en=$keepEn%.4f keep_other=$keepOther%.4f loss=$loss%.4f")
    assert(acc >= 0.88 && keepEn - keepOther >= 0.75 && loss < 0.6931)
  }

  test("streaming inference equals the batch twin; the equality flag is not vacuous") {
    import org.apache.spark.sql.functions._
    val r = SparkEntry.queries("q_stream_quality_filter")(spark, sf).head()
    assert(r.getLong(0) === r.getLong(1), s"n_scored != n_docs: $r")
    assert(r.getBoolean(3), s"streamed scores diverged from batch twin: $r")
    // negative control: a one-bucket weight perturbation must produce
    // scoring disagreements — i.e. the equality the flag asserts is a
    // real property of the margins, not an artifact of the comparison
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val w = CurationQueries.qcTrainShared(spark, sf)._2
    val wPert = w.select(col("b"),
      when(col("b") === BIAS, col("wv") - lit(10.0)).otherwise(col("wv"))
        .as("wv"))
    val base = CurationQueries.qcScore(docs, w)
      .withColumnRenamed("m", "m0").withColumnRenamed("keep", "k0")
    val diverged = base.join(CurationQueries.qcScore(docs, wPert), "doc_id")
      .filter(col("m0") =!= col("m") || col("k0") =!= col("keep"))
      .count()
    assert(diverged > 0, "perturbed model scored identically — comparison is vacuous")
    // the trained filter actually filters: keeps some docs, not all
    val keeps = CurationQueries.qcScore(docs, w)
      .agg(sum(when(col("keep"), 1L).otherwise(0L)), count(lit(1))).head()
    assert(keeps.getLong(0) > 0 && keeps.getLong(0) < keeps.getLong(1), s"$keeps")
  }
}
