package graft

import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{pq_argmin, PqArgmin}

/** Direct unit coverage for the hand-written [[PqArgmin]] codegen
  * expression (VERDICT r16 #2): the interpreted `nullSafeEval` and the
  * generated Java are two hand-maintained implementations of the same
  * loop, and through round 16 they were only covered indirectly (pipeline
  * specs + the oracle exercise the codegen path on clean data). Every
  * case here evaluates BOTH paths and asserts agreement — a divergence
  * would otherwise surface as a silent wrong answer wherever codegen
  * falls back — plus equality with the replaced `join + min_by(cid, d2)`
  * form on tie-free data. */
class PqArgminSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark
  import spark.implicits._

  private val svType = ArrayType(DoubleType)
  private val cbsType = ArrayType(StructType(Seq(
    StructField("cid", IntegerType), StructField("cv", ArrayType(DoubleType)))))

  /** Interpreted path: eval over literals (BinaryExpression.eval →
    * nullSafeEval; no codegen involved). */
  private def interpreted(sv: Seq[java.lang.Double],
      cbs: Seq[(Integer, Seq[java.lang.Double])]): Any = {
    val e = PqArgmin(Literal.create(sv, svType), Literal.create(
      if (cbs == null) null
      else cbs.map(c => if (c == null) null
                        else org.apache.spark.sql.Row(c._1, c._2)), cbsType))
    CatalystTypeConverters.convertToScala(
      e.eval(org.apache.spark.sql.catalyst.InternalRow.empty), IntegerType)
  }

  /** Codegen path: the same inputs through a projected DataFrame select
    * (whole-stage codegen compiles doGenCode; constant-folding is
    * defeated by binding the inputs as columns of a real row). */
  private def codegen(sv: Seq[java.lang.Double],
      cbs: Seq[(Integer, Seq[java.lang.Double])]): Any = {
    val df = Seq((sv, cbs)).toDF("sv", "cbs")
    val r = df.select(pq_argmin(col("sv"),
      col("cbs").cast(cbsType)).as("cid")).head()
    if (r.isNullAt(0)) null else r.getInt(0)
  }

  private def both(sv: Seq[java.lang.Double],
      cbs: Seq[(Integer, Seq[java.lang.Double])], expect: Any): Unit = {
    val i = interpreted(sv, cbs)
    val c = codegen(sv, cbs)
    assert(i === c, s"interpreted=$i codegen=$c disagree")
    assert(c === expect)
  }

  private def d(xs: Double*): Seq[java.lang.Double] = xs.map(Double.box)

  test("clean input: first strict minimum in cid order wins") {
    val cbs = Seq((Integer.valueOf(0), d(1.0, 1.0)),
      (Integer.valueOf(1), d(0.0, 0.1)), (Integer.valueOf(2), d(5.0, 5.0)))
    both(d(0.0, 0.0), cbs, 1)
  }

  test("exact tie keeps the FIRST (lowest-cid) candidate") {
    val cbs = Seq((Integer.valueOf(3), d(1.0, 0.0)),
      (Integer.valueOf(7), d(0.0, 1.0))) // both d2 = 1.0 from origin
    both(d(0.0, 0.0), cbs, 3)
  }

  test("null sv element → null") {
    val cbs = Seq((Integer.valueOf(0), d(0.0, 0.0)))
    both(Seq(Double.box(1.0), null), cbs, null)
  }

  test("null cv element: entry skipped, next valid entry wins") {
    val cbs = Seq((Integer.valueOf(0), Seq(Double.box(0.0), null)),
      (Integer.valueOf(1), d(9.0, 9.0)))
    both(d(0.0, 0.0), cbs, 1)
  }

  test("cv length mismatch: entry skipped") {
    val cbs = Seq((Integer.valueOf(0), d(0.0)),
      (Integer.valueOf(1), d(2.0, 2.0)))
    both(d(0.0, 0.0), cbs, 1)
  }

  test("null codebook entry / null cv: skipped") {
    val cbs = Seq(null.asInstanceOf[(Integer, Seq[java.lang.Double])],
      (Integer.valueOf(4), d(1.0, 1.0)))
    both(d(0.0, 0.0), cbs, 4)
    val nullCv = Seq((Integer.valueOf(0), null.asInstanceOf[Seq[java.lang.Double]]),
      (Integer.valueOf(2), d(1.0, 1.0)))
    both(d(0.0, 0.0), nullCv, 2)
  }

  test("empty codebook and all-invalid codebook → null") {
    both(d(0.0, 0.0), Seq.empty, null)
    both(d(0.0, 0.0), Seq((Integer.valueOf(0), d(1.0))), null) // all mismatched
  }

  test("NaN d2 candidates are skipped (min_by semantics); all-NaN → null") {
    val cbs = Seq((Integer.valueOf(0), d(Double.NaN, 0.0)),
      (Integer.valueOf(1), d(10.0, 10.0)))
    both(d(0.0, 0.0), cbs, 1) // NaN on the lowest cid must NOT stick
    both(d(0.0, 0.0), Seq((Integer.valueOf(0), d(Double.NaN, 0.0))), null)
    both(d(Double.NaN, 0.0), Seq((Integer.valueOf(0), d(1.0, 1.0)),
      (Integer.valueOf(1), d(2.0, 2.0))), null) // NaN sv poisons every d2
  }

  test("float sv × double cv and double sv × float cv agree with double×double") {
    val sv = d(0.25, -1.5, 3.0)
    val cbs = Seq((Integer.valueOf(0), d(0.25, -1.5, 2.0)),
      (Integer.valueOf(1), d(0.25, -1.5, 3.5)),
      (Integer.valueOf(2), d(9.0, 9.0, 9.0)))
    // values chosen exactly representable in float so the casts are lossless
    val base = codegen(sv, cbs)
    val df = Seq((sv, cbs)).toDF("sv", "cbs")
    val fSv = df.select(pq_argmin(col("sv").cast(ArrayType(FloatType)),
      col("cbs").cast(cbsType)).as("cid")).head().getInt(0)
    val fCv = df.select(pq_argmin(col("sv"),
      col("cbs").cast(ArrayType(StructType(Seq(
        StructField("cid", IntegerType),
        StructField("cv", ArrayType(FloatType))))))).as("cid")).head().getInt(0)
    assert(fSv === base)
    assert(fCv === base)
    assert(base === 1)
  }

  test("equals the replaced join + min_by(cid, d2) form on tie-free data") {
    import graft.functions.vec_dot
    // 40 subvector rows × 8 dims, 16 codewords — deterministic pseudo-
    // random doubles; tie-free with probability ~1 (asserted below)
    def vec(seed: Int): Seq[Double] =
      (0 until 8).map(i => ((seed * 31 + i * 17) % 97) / 97.0)
    val subs = (1 to 40).map(i => (i.toLong, vec(i))).toDF("vec_id", "sv")
    val cb = (0 until 16).map(c => (c, vec(1000 + c))).toDF("cid", "cv")
    val d2 = vec_dot(col("sv"), col("sv")) + vec_dot(col("cv"), col("cv")) -
      lit(2.0) * vec_dot(col("sv"), col("cv"))
    val oldForm = subs.crossJoin(cb)
      .groupBy("vec_id").agg(min_by(col("cid"), d2).as("cid"))
    // tie-freeness guard: the min d2 is strictly unique per vec_id
    val minCnt = subs.crossJoin(cb).select(col("vec_id"), d2.as("d2"))
      .groupBy("vec_id").agg(min("d2").as("m"), count(lit(1)).as("n"))
    val ties = subs.crossJoin(cb).select(col("vec_id"), d2.as("d2"))
      .join(minCnt, "vec_id").filter(col("d2") === col("m"))
      .groupBy("vec_id").agg(count(lit(1)).as("k"))
      .filter(col("k") > 1).count()
    assert(ties === 0L)
    val grouped = cb.agg(array_sort(collect_list(struct(col("cid"), col("cv"))))
      .as("cbs"))
    val newForm = subs.crossJoin(grouped)
      .select(col("vec_id"), pq_argmin(col("sv"), col("cbs")).as("cid"))
    val diff = oldForm.withColumnRenamed("cid", "old")
      .join(newForm, "vec_id")
      .filter(col("old") =!= col("cid")).count()
    assert(diff === 0L)
  }
}
