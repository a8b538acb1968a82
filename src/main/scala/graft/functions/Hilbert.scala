package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/**
 * Hilbert-curve index of an 8-bit (x, y) cell → d ∈ [0, 65536)
 * (order-8 curve; the data-layout clustering key).
 *
 * Z-order (Morton — [[graft.queries.WarehouseQueries]] zkey8) is the
 * cheap interleave, but its curve JUMPS: consecutive z-values can be
 * far apart in (x, y), so a z-range bucket's bounding box carries
 * dead area and min-max file skipping over-scans. The Hilbert curve is
 * the locality-optimal space-filling order — every consecutive pair of
 * d values is an ADJACENT cell (unit Manhattan step, no jumps), which
 * is why modern table-layout clustering moved from Z-order to Hilbert
 * for multi-dimensional file clustering. HilbertSpec pins exactly that
 * contract: bijection over all 2^16 cells plus unit adjacency of every
 * consecutive pair — properties only a true Hilbert transform has.
 *
 * Standard iterative xy2d (flip-then-swap rotation with the sub-square
 * size s): 8 constant iterations of integer compares/shifts, codegen'd
 * into the scan stage like the rest of the layout family. The same
 * arithmetic is re-expressed in the DuckDB oracle as an 8-step
 * recursive CTE over two's-complement BIGINTs, so layout buckets are
 * hash-checked exactly, not metric-flagged.
 */
case class HilbertIndex8(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"hilbert_index8 expects (bigint, bigint), got " +
          s"${l.catalogString}, ${r.catalogString}")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "hilbert_index8"

  override def nullSafeEval(a: Any, b: Any): Any = {
    var x = a.asInstanceOf[Long] & 255L
    var y = b.asInstanceOf[Long] & 255L
    var d = 0L
    var s = 128L
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val rx = ctx.freshName("rx")
      val ry = ctx.freshName("ry")
      val t = ctx.freshName("t")
      s"""
         |long $x = $a & 255L;
         |long $y = $b & 255L;
         |long $d = 0L;
         |for (long $s = 128L; $s > 0; $s >>= 1) {
         |  long $rx = (($x & $s) > 0) ? 1L : 0L;
         |  long $ry = (($y & $s) > 0) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0) {
         |    if ($rx == 1) { $x = $s - 1 - $x; $y = $s - 1 - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex8 =
    copy(left = newLeft, right = newRight)
}
