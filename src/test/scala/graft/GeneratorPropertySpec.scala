package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.pos_ngrams

/**
 * Randomized properties for the round-5 primitives: the PosNGrams
 * generator against Scala's sliding-window reference (arbitrary token
 * arrays, arbitrary n), and the Morton interleave's bijectivity (the
 * property Z-order file skipping rests on).
 */
class GeneratorPropertySpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark

  private val params = SCTest.Parameters.default
    .withMinSuccessfulTests(60)
    .withInitialSeed(org.scalacheck.rng.Seed(42L))

  private def check(name: String, p: Prop): Unit = {
    val r = SCTest.check(params, p)
    assert(r.passed, s"$name: $r")
  }

  private val token: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
  private val tokensGen: Gen[List[String]] = Gen.listOfN(12, token)

  test("pos_ngrams equals sliding windows for arbitrary arrays and n") {
    val session = spark
    import session.implicits._
    val p = Prop.forAll(tokensGen, Gen.chooseNum(1, 5)) { (toks, n) =>
      val got = Seq(toks).toDF("tk")
        .select(pos_ngrams(col("tk"), n).as(Seq("pos", "gram")))
        .collect().map(r => (r.getInt(0), r.getString(1))).toList
      val want = toks.sliding(n).filter(_.size == n).zipWithIndex
        .map { case (w, i) => (i, w.mkString(" ")) }.toList
      got == want
    }
    check("pos_ngrams sliding equivalence", p)
  }

  test("morton interleave is a bijection on the 8-bit × 8-bit grid") {
    // computed through the same Spark expressions q_zorder_layout uses
    val df = spark.range(65536).select(
      (col("id") / 256).cast("long").as("a"),
      (col("id") % 256).as("b"))
    val z = (0 until 8).map { i =>
      shiftleft(shiftright(col("a"), i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(col("b"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_.bitwiseOR(_))
    val stats = df.select(z.as("z"))
      .agg(countDistinct(col("z")).as("n"), min("z").as("mn"), max("z").as("mx"))
      .collect()(0)
    assert(stats.getLong(0) == 65536L, "interleave must be injective")
    assert(stats.getLong(1) == 0L && stats.getLong(2) == 65535L,
      "interleave must cover exactly [0, 2^16)")
  }
}
