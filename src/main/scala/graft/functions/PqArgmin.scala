package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * `pq_argmin(sv, cbs)` — nearest-codeword id of subvector `sv` against a
 * codebook `cbs: array<struct<cid int, cv array<double>>>`, as one
 * code-generating Catalyst expression.
 *
 * This replaces the PQ/IVF-PQ encode-and-train assignment shape
 * `subs JOIN broadcast(cb) ON sub … GROUP BY (vec_id, sub) AGG
 * min_by(cid, d2)` (round 16, guide §"shuffle fewer bytes"/"per-task
 * work"): that form materializes n×M×K joined rows and hash-aggregates
 * them back down to n×M — at K=256 a 256× row amplification through a
 * join + aggregate pair on the hottest path of every PQ query, and at
 * 100 TB the amplification IS the encode cost. Here the codebook rides
 * as one bounded array per subspace (grouped + broadcast by the caller)
 * and the argmin is a tight primitive loop per row: n×M rows in, n×M
 * rows out, no aggregate, no exchange.
 *
 * Distance and selection semantics are EXACTLY the replaced form's:
 * d2 = (sv·sv + cv·cv) − 2.0·(sv·cv), each dot accumulated in double in
 * ascending index order (the [[VecDot]] loop), combined in that literal
 * association order, so every candidate's d2 is bit-identical to the
 * old `pqD2` column. Entries are visited in ascending array order — the
 * caller array_sorts by cid — with a strict `<` keeping the first
 * minimum. `min_by` gives NO tie guarantee (ties were arbitrary before;
 * every shipped codebook is tie-free, asserted in PqSpec/Pq8Spec/
 * IvfPqSpec), so on tie-free input the results are identical rows.
 * Null/mismatch semantics also mirror the old form: an entry whose cv
 * is null, length-mismatched, or contains a null element produced a
 * null d2 that `min_by` ignored — here it is skipped; no valid entry →
 * null (the old aggregate emitted no row only when the JOIN emitted
 * none, which the caller's inner join on the group key still enforces).
 * A NaN d2 is skipped too (round 17, ADVICE r16): Spark's double
 * ordering treats NaN as greatest, so `min_by` could never select it;
 * only reachable with non-finite embedding values. Interpreted and
 * generated paths are asserted identical over the whole edge-case
 * matrix in PqArgminSpec.
 */
case class PqArgmin(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(lt, _),
            ArrayType(StructType(Array(cidF, cvF)), _))
          if (lt == FloatType || lt == DoubleType) &&
             cidF.dataType == IntegerType &&
             (cvF.dataType == ArrayType(DoubleType, true) ||
              cvF.dataType == ArrayType(DoubleType, false) ||
              cvF.dataType == ArrayType(FloatType, true) ||
              cvF.dataType == ArrayType(FloatType, false)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_argmin expects (array<float|double>, array<struct<int, " +
          s"array<float|double>>>), got ${l.catalogString}, ${r.catalogString}")
    }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_argmin"

  private def svIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private def cvIsFloat: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType
      .asInstanceOf[StructType].fields(1).dataType
      .asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val sv = a.asInstanceOf[ArrayData]
    val cbs = b.asInstanceOf[ArrayData]
    val n = sv.numElements()
    // sv·sv once per row (identical value for every candidate)
    var svv = 0.0
    var i = 0
    while (i < n) {
      if (sv.isNullAt(i)) return null
      val v = if (svIsFloat) sv.getFloat(i).toDouble else sv.getDouble(i)
      svv += v * v
      i += 1
    }
    var best = 0.0
    var bestCid = 0
    var found = false
    var e = 0
    val m = cbs.numElements()
    while (e < m) {
      if (!cbs.isNullAt(e)) {
        val row = cbs.getStruct(e, 2)
        if (!row.isNullAt(0) && !row.isNullAt(1)) {
          val cid = row.getInt(0)
          val cv = row.getArray(1)
          if (cv.numElements() == n) {
            var cvv = 0.0
            var svc = 0.0
            var ok = true
            var j = 0
            while (ok && j < n) {
              if (cv.isNullAt(j)) ok = false
              else {
                val c = if (cvIsFloat) cv.getFloat(j).toDouble
                        else cv.getDouble(j)
                val s = if (svIsFloat) sv.getFloat(j).toDouble
                        else sv.getDouble(j)
                cvv += c * c
                svc += s * c
                j += 1
              }
            }
            if (ok) {
              val d2 = (svv + cvv) - 2.0 * svc
              // skip NaN candidates (ADVICE r16): min_by under Spark's
              // double ordering treats NaN as greatest, so a NaN d2 could
              // never win there — without this guard a NaN on the FIRST
              // candidate would be kept forever (!found selects it and
              // `d2 < NaN` is false for every later candidate)
              if (!java.lang.Double.isNaN(d2) &&
                  (!found || d2 < best)) { best = d2; bestCid = cid; found = true }
            }
          }
        }
      }
      e += 1
    }
    if (found) bestCid else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val svGet = if (svIsFloat) "getFloat" else "getDouble"
    val cvGet = if (cvIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (svA, cbsA) => {
      val n = ctx.freshName("n")
      val svv = ctx.freshName("svv")
      val best = ctx.freshName("best")
      val bestCid = ctx.freshName("bestCid")
      val found = ctx.freshName("found")
      val badSv = ctx.freshName("badSv")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      val e = ctx.freshName("e")
      val m = ctx.freshName("m")
      val row = ctx.freshName("row")
      val cv = ctx.freshName("cv")
      val cvv = ctx.freshName("cvv")
      val svc = ctx.freshName("svc")
      val cj = ctx.freshName("cj")
      val sj = ctx.freshName("sj")
      val ok = ctx.freshName("ok")
      val j = ctx.freshName("j")
      val d2 = ctx.freshName("d2")
      val rowCls = "org.apache.spark.sql.catalyst.InternalRow"
      val arrCls = "org.apache.spark.sql.catalyst.util.ArrayData"
      s"""
         |int $n = $svA.numElements();
         |double $svv = 0.0;
         |boolean $badSv = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($svA.isNullAt($i)) { $badSv = true; break; }
         |  double $v = (double) $svA.$svGet($i);
         |  $svv += $v * $v;
         |}
         |if ($badSv) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $best = 0.0;
         |  int $bestCid = 0;
         |  boolean $found = false;
         |  int $m = $cbsA.numElements();
         |  for (int $e = 0; $e < $m; $e++) {
         |    if ($cbsA.isNullAt($e)) continue;
         |    $rowCls $row = $cbsA.getStruct($e, 2);
         |    if ($row.isNullAt(0) || $row.isNullAt(1)) continue;
         |    $arrCls $cv = $row.getArray(1);
         |    if ($cv.numElements() != $n) continue;
         |    double $cvv = 0.0;
         |    double $svc = 0.0;
         |    boolean $ok = true;
         |    for (int $j = 0; $j < $n; $j++) {
         |      if ($cv.isNullAt($j)) { $ok = false; break; }
         |      double $cj = (double) $cv.$cvGet($j);
         |      double $sj = (double) $svA.$svGet($j);
         |      $cvv += $cj * $cj;
         |      $svc += $sj * $cj;
         |    }
         |    if (!$ok) continue;
         |    double $d2 = ($svv + $cvv) - 2.0 * $svc;
         |    if (!Double.isNaN($d2) && (!$found || $d2 < $best)) {
         |      $best = $d2; $bestCid = $row.getInt(0); $found = true;
         |    }
         |  }
         |  if ($found) ${ev.value} = $bestCid; else ${ev.isNull} = true;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqArgmin =
    copy(left = newLeft, right = newRight)
}
