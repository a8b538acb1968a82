package graft

import java.io.ByteArrayOutputStream

import org.apache.spark.util.sketch.{BloomFilter, CountMinSketch}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/**
 * ScalaCheck property tests for the sketch invariants (SURVEY.md §5.1),
 * run against `org.apache.spark.util.sketch` — the exact classes the
 * distributed `TypedImperativeAggregate`s wrap (SketchSpec proves the
 * wrapper ≡ direct-build equivalence; here randomized inputs probe the
 * invariants themselves, hundreds of cases per property).
 */
class SketchPropertySpec extends AnyFunSuite {

  private val params = SCTest.Parameters.default
    .withMinSuccessfulTests(100)
    .withInitialSeed(org.scalacheck.rng.Seed(42L))

  private def check(name: String, p: Prop): Unit = {
    val r = SCTest.check(params, p)
    assert(r.passed, s"$name: $r")
  }

  private val items: Gen[List[Long]] =
    Gen.listOfN(200, Gen.chooseNum(Long.MinValue, Long.MaxValue))

  test("bloom: zero false negatives for every inserted item (∀ random sets)") {
    check("no-false-negatives", Prop.forAll(items) { xs =>
      val bf = BloomFilter.create(1000, 0.03)
      xs.foreach(bf.putLong)
      xs.forall(bf.mightContainLong)
    })
  }

  test("bloom: merge is the set union (no false negatives across halves)") {
    check("merge-union", Prop.forAll(items, items) { (as, bs) =>
      val (x, y) = (BloomFilter.create(1000, 0.03), BloomFilter.create(1000, 0.03))
      as.foreach(x.putLong); bs.foreach(y.putLong)
      x.mergeInPlace(y)
      (as ++ bs).forall(x.mightContainLong)
    })
  }

  test("cms: overestimate-only — a hard structural guarantee (∀ inputs)") {
    // min over d rows of only-incremented counters can never undercount;
    // this half of the CM05 contract must hold even for adversarial
    // inputs, so it IS a forAll property (the shrinker can hunt freely —
    // it even finds full-collision triples like {-4294967295, Long.Min,
    // 0}, which overestimate but still never undercount)
    check("cms-never-under", Prop.forAll(items) { xs =>
      val cms = CountMinSketch.create(0.01, 0.999, 42)
      xs.foreach(cms.addLong(_))
      xs.groupBy(identity).forall { case (k, g) =>
        cms.estimateCount(k) >= g.size.toLong
      }
    })
  }

  test("cms: eps*N cap holds for >= 1-δ of (input, key) samples") {
    // the upper bound is probabilistic over the hash choice — for any
    // fixed seed, adversarial colliding inputs exist (see above), so a
    // shrinker-driven forAll would chase them and "fail" by design.
    // Measured instead: violation RATE over seeded random multisets.
    val eps = 0.01
    val rnd = new scala.util.Random(42)
    var keys = 0L
    var violations = 0L
    for (_ <- 1 to 100) {
      val xs = List.fill(300)(
        if (rnd.nextInt(6) < 5) rnd.nextInt(10).toLong else rnd.nextLong())
      val cms = CountMinSketch.create(eps, 0.999, 42)
      xs.foreach(cms.addLong(_))
      val bound = math.ceil(eps * xs.size).toLong
      xs.groupBy(identity).foreach { case (k, g) =>
        keys += 1
        if (cms.estimateCount(k) > g.size.toLong + bound) violations += 1
      }
    }
    val rate = violations.toDouble / keys
    assert(rate <= 0.01, f"eps*N violation rate $rate%.4f over $keys keys")
  }

  test("topk_agg buffers: any partitioning + merge order == sorted take-k") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val agg = graft.sketches.TopKAgg(
      BoundReference(0, DoubleType, nullable = false),
      BoundReference(1, LongType, nullable = false),
      Literal(5))
    // ids made unique per row — the aggregate's contract (the id IS the
    // tie-break; duplicate (score,id) rows would occupy multiple slots)
    val rows: Gen[List[(Double, Long)]] =
      Gen.listOfN(60, Gen.chooseNum(-100.0, 100.0))
        .map(_.zipWithIndex.map { case (s, i) => (s, i.toLong) })
    val cuts: Gen[Int] = Gen.chooseNum(1, 6)
    check("topk-partition-invariance", Prop.forAll(rows, cuts) { (xs, nParts) =>
      // expected: global sort by (score desc, id asc), first 5
      val expected = xs.sortBy { case (s, i) => (-s, i) }.take(5)
      // actual: split into nParts buffers, update, merge in order
      val parts = xs.grouped(math.max(1, xs.size / nParts)).toList
      val bufs = parts.map { p =>
        val b = agg.createAggregationBuffer()
        p.foreach { case (s, i) => agg.update(b, InternalRow(s, i)) }
        b
      }
      val merged = bufs.reduceLeft(agg.merge)
      val got = merged.toList.sortBy { case (s, i) => (-s, i) }
      got == expected
    })
  }

  test("bitmap_agg buffers: popcount == distinct count, merge == set union") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.LongType
    val agg = graft.sketches.BitmapAgg(BoundReference(0, LongType, nullable = false))
    def popcount(b: Array[Byte]): Int =
      b.map(x => java.lang.Integer.bitCount(x & 0xff)).sum
    val positions: Gen[List[Long]] =
      Gen.listOfN(150, Gen.chooseNum(0L, 32767L))
    check("bitmap-popcount-union", Prop.forAll(positions, positions) { (as, bs) =>
      def build(xs: List[Long]) = {
        val b = agg.createAggregationBuffer()
        xs.foreach(p => agg.update(b, InternalRow(p)))
        b
      }
      val merged = agg.merge(build(as), build(bs))
      popcount(build(as ++ bs)) == (as ++ bs).distinct.size &&
        popcount(merged) == (as ++ bs).distinct.size
    })
  }

  test("int8 quantization: per-element roundtrip error <= 0.5/scale in range") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val scale = 100.0
    val q = graft.functions.VecQuantizeI8(
      Literal.create(null, ArrayType(DoubleType)), Literal(scale))
    val vecs: Gen[List[Double]] =
      Gen.listOfN(32, Gen.chooseNum(-1.2, 1.2))
    check("quantize-error-bound", Prop.forAll(vecs) { xs =>
      val codes = q.nullSafeEval(
        new GenericArrayData(xs.toArray), scale).asInstanceOf[Array[Byte]]
      xs.zip(codes).forall { case (x, c) =>
        if (math.abs(x) * scale <= 127.0) math.abs(c / scale - x) <= 0.5 / scale + 1e-12
        else c == (if (x > 0) 127 else -127) // clamped out-of-range
      }
    })
  }

  test("cms: merge == single-pass build, byte-identical under a fixed seed") {
    check("cms-merge-homomorphism", Prop.forAll(items, items) { (as, bs) =>
      def bytes(c: CountMinSketch): Seq[Byte] = {
        val o = new ByteArrayOutputStream(); c.writeTo(o); o.toByteArray.toSeq
      }
      val whole = CountMinSketch.create(0.01, 0.99, 42)
      (as ++ bs).foreach(whole.addLong(_))
      val (l, r) = (CountMinSketch.create(0.01, 0.99, 42),
        CountMinSketch.create(0.01, 0.99, 42))
      as.foreach(l.addLong(_)); bs.foreach(r.addLong(_))
      l.mergeInPlace(r)
      bytes(l) == bytes(whole)
    })
  }

  test("ams: tug-of-war counter² is an EXACTLY unbiased F₂ estimator (∀ multisets)") {
    // The identity behind q_ams_f2, checked without probability: averaged
    // over ALL 2^K sign assignments σ: keys → ±1, the cross terms of
    // (Σ_k σ(k)·f_k)² cancel pairwise and the mean equals Σ f_k² = F₂
    // exactly — in integer arithmetic, for every multiset. (The sketch
    // replaces the enumeration with a hash family; unbiasedness is this
    // identity, accuracy is the median-of-means bound the query's
    // within_half flag pins on real data.)
    val multiset: Gen[List[Int]] =
      Gen.chooseNum(1, 10).flatMap(k =>
        Gen.listOfN(k, Gen.chooseNum(1, 50))) // f_k frequencies, K ≤ 10 keys
    check("ams-unbiased", Prop.forAll(multiset) { fs =>
      val k = fs.length
      val f2 = fs.map(f => f.toLong * f).sum
      val sumSq = (0 until (1 << k)).map { mask =>
        val c = fs.zipWithIndex.map { case (f, i) =>
          if ((mask >> i & 1) == 1) f.toLong else -f.toLong }.sum
        BigInt(c) * c
      }.sum
      sumSq == BigInt(f2) * (1 << k)
    })
  }
}
