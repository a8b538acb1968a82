package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Blocking

/** The capped blocked-pair enumeration (VERDICT r9 #1): a planted
  * 200-copy mega-bucket must yield a BOUNDED candidate set (≤ cap²/2
  * from that bucket, never 200²/2) plus an overflow count, while every
  * under-cap bucket enumerates its complete pair set unchanged. */
class BlockingSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark
  import spark.implicits._

  private val cap = Blocking.BandCap // 64

  test("both outputs read ONE materialized ranked intermediate (round 12)") {
    // VERDICT r11 #2: consumers embedding pairs AND overflow in one
    // plan used to re-plan the whole upstream bucket pipeline twice
    // (rk<=cap vs rk==cap+1 carried different WindowGroupLimit params,
    // blocking exchange reuse). cappedBucketPairs now localCheckpoints
    // the rk<=cap+1 ranked intermediate; this pins it mechanically — a
    // refactor that drops the checkpoint re-introduces a Window into
    // the consumer plans and fails here, not in a bench regression.
    val buckets = (1L to 10L).map(id => ("k1", id)).toDF("bkey", "id")
    val (pairs, overflow) = Blocking.cappedBucketPairs(
      buckets, Seq("bkey"), "id", cap)
    Seq("pairs" -> pairs, "overflow" -> overflow).foreach { case (n, df) =>
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("ExistingRDD"),
        s"$n must scan the materialized checkpoint:\n$plan")
      assert(!plan.contains("Window"),
        s"$n must not re-plan the rank (it ran once at build time):\n$plan")
    }
  }

  test("withOverflowAccounting: empty result still surfaces the count (round 12)") {
    // the all-overflow regime (observed live at 100×: every fixed-P
    // embed bucket clips, every planted pair drops): the pair list is
    // EMPTY, and a plain crossJoin would make the accounting column
    // vanish with it — the one silent outcome the column exists to
    // prevent. The sentinel row must carry the count; with a nonempty
    // result it must NOT appear (byte-identical to the crossJoin form).
    val rows = Seq((1L, 2L, 0.95)).toDF("id_a", "id_b", "score")
    val overflow = Seq(Tuple1(7L)).toDF("overflow_buckets")
    val nonEmpty = Blocking.withOverflowAccounting(rows, overflow).collect()
    assert(nonEmpty.length === 1 &&
      nonEmpty(0).getLong(0) === 1L && nonEmpty(0).getLong(3) === 7L)
    val empty = Blocking.withOverflowAccounting(
      rows.filter(col("score") > 2.0), overflow).collect()
    assert(empty.length === 1, "empty result must emit the sentinel row")
    assert(empty(0).isNullAt(0) && empty(0).isNullAt(1) && empty(0).isNullAt(2))
    assert(empty(0).getLong(3) === 7L, "sentinel must carry the overflow count")
  }

  test("planted 200-copy mega-bucket: candidates bounded at C(cap,2), overflow counted") {
    // one mega-bucket (e.g. a boilerplate document duplicated 200×
    // hashing into one band key) + two organic buckets
    val rows =
      (1L to 200L).map(id => ("mega", id)) ++
      Seq(("small", 900L), ("small", 901L), ("small", 902L)) ++
      Seq(("solo", 950L))
    val buckets = rows.toDF("bkey", "id")
    val (pairs, overflow) = Blocking.cappedBucketPairs(
      buckets, Seq("bkey"), "id", cap)
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // mega contributes exactly C(cap,2) pairs over its cap LOWEST ids
    val megaPairs = got.filter(_._1 <= 200L)
    assert(megaPairs.size === cap * (cap - 1) / 2)
    assert(megaPairs.forall { case (a, b) => a < b && b <= cap.toLong })
    // the under-cap bucket is complete and untouched
    assert(got.filter(_._1 >= 900L) ===
      Set((900L, 901L), (900L, 902L), (901L, 902L)))
    // exactly the mega bucket overflowed
    assert(overflow.collect()(0).getLong(0) === 1L)
  }

  test("no bucket over cap → zero overflow, complete enumeration") {
    val buckets = (0L until 60L).map(i => (s"b${i % 4}", i)).toDF("bkey", "id")
    val (pairs, overflow) = Blocking.cappedBucketPairs(
      buckets, Seq("bkey"), "id", cap)
    // 4 buckets × C(15,2) pairs
    assert(pairs.count() === 4L * 15 * 14 / 2)
    assert(overflow.collect()(0).getLong(0) === 0L)
  }

  test("duplicate (key,id) rows and cross-bucket repeats dedupe") {
    val buckets = Seq(
      ("x", 1L), ("x", 1L), ("x", 2L), // dup membership row
      ("y", 1L), ("y", 2L) // same pair via a second bucket
    ).toDF("bkey", "id")
    val (pairs, overflow) = Blocking.cappedBucketPairs(
      buckets, Seq("bkey"), "id", cap)
    assert(pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
      Set((1L, 2L)))
    assert(overflow.collect()(0).getLong(0) === 0L)
    // a duplicated membership row must not fake an overflow at cap=1
    val (p1, o1) = Blocking.cappedBucketPairs(
      Seq(("z", 7L), ("z", 7L)).toDF("bkey", "id"), Seq("bkey"), "id", 1)
    assert(p1.count() === 0L)
    assert(o1.collect()(0).getLong(0) === 0L)
  }

  test("multi-column bucket key (band, bkey)") {
    val buckets = Seq((0, 5L, 10L), (0, 5L, 11L), (1, 5L, 10L), (1, 7L, 11L))
      .toDF("band", "bkey", "id")
    val (pairs, _) = Blocking.cappedBucketPairs(
      buckets, Seq("band", "bkey"), "id", cap)
    assert(pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
      Set((10L, 11L)))
  }

  // --- round 11: the join-form half of the skew family -----------------

  test("planted mega-BAND through the capped minhash-style enumeration") {
    // 300 docs sharing one band key (viral boilerplate) + one organic
    // near-dup pair: the mega band is bounded at C(cap,2) and counted;
    // the organic pair survives untouched
    val rows = (1L to 300L).map(id => (777L, id)) ++
      Seq((42L, 9001L), (42L, 9002L))
    val (pairs, overflow) = Blocking.cappedBucketPairs(
      rows.toDF("band", "doc_id"), Seq("band"), "doc_id", cap)
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.count(_._1 <= 300L) === cap * (cap - 1) / 2)
    assert(got.contains((9001L, 9002L)))
    assert(overflow.collect()(0).getLong(0) === 1L)
  }

  test("dfCappedPostings: hot gram dropped from both sides, counted; column order preserved") {
    // gram 100 appears in 70 docs (> cap=64) → dropped; gram 200 in 2
    val rows = (1L to 70L).map(doc => (doc, 100L)) ++
      Seq((1L, 200L), (2L, 200L))
    val postings = rows.toDF("doc_id", "gh")
    val (kept, hotCount) = Blocking.dfCappedPostings(postings, "gh", 64)
    // caller's column order survives the anti-join (consumers rename
    // positionally via toDF — the round-11 bug this pins)
    assert(kept.columns.toSeq === Seq("doc_id", "gh"))
    assert(kept.select("gh").distinct().collect().map(_.getLong(0)).toSet
      === Set(200L))
    assert(hotCount.collect()(0).getLong(0) === 1L)
    // under-cap postings: nothing dropped, zero hot
    val (k2, h2) = Blocking.dfCappedPostings(
      Seq((1L, 5L), (2L, 5L)).toDF("doc_id", "gh"), "gh", 64)
    assert(k2.count() === 2L)
    assert(h2.collect()(0).getLong(0) === 0L)
  }
}
