package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Int8 embedding quantization (SURVEY.md §2j scale path).
 *
 * At 100 TB the similarity-search bottleneck is scan/shuffle bandwidth,
 * not FLOPs: a 64-dim float32 embedding is 256 B, its int8 code is
 * 64 B — a 4× reduction in bytes read, cached, and shuffled. Codes are
 * `code_i = clamp(round(x_i * scale), -127, 127)` stored as BinaryType
 * (1 byte/element, no per-element null bits); with one shared scale the
 * quantized cosine `dot8(a,b) / (sqrt(dot8(a,a)) * sqrt(dot8(b,b)))` is
 * scale-free, so ranking needs no dequantization at all.
 *
 * Both expressions are codegen'd (`doGenCode`) — the probe loop stays
 * inside whole-stage codegen, same as [[VecDot]].
 */
case class VecQuantizeI8(child: Expression, scaleExpr: Expression)
    extends BinaryExpression {

  override def left: Expression = child
  override def right: Expression = scaleExpr

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, scaleExpr.dataType) match {
      case (ArrayType(t, _), DoubleType) if t == FloatType || t == DoubleType =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"vec_quantize_i8 expects (array<float|double>, double), got " +
          s"${l.catalogString}, ${r.catalogString}")
    }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_quantize_i8"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, s: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val scale = s.asInstanceOf[Double]
    val n = arr.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val v = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      val q = Math.rint(v * scale)
      out(i) = Math.max(-127.0, Math.min(127.0, q)).toByte
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, s) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      val q = ctx.freshName("q")
      s"""
         |int $n = $a.numElements();
         |byte[] $out = new byte[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  double $q = Math.rint(((double) $a.$get($i)) * $s);
         |  $out[$i] = (byte) Math.max(-127.0, Math.min(127.0, $q));
         |}
         |if (!${ev.isNull}) ${ev.value} = $out;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecQuantizeI8 =
    copy(child = newLeft, scaleExpr = newRight)
}

/** Dot product of two int8 code vectors (BinaryType), exact in Long. */
case class VecDotI8(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"vec_dot_i8 expects (binary, binary), got ${l.catalogString}, ${r.catalogString}")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot_i8"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
    if (x.length != y.length) return null
    var s = 0L
    var i = 0
    while (i < x.length) { s += x(i).toLong * y(i).toLong; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |if ($a.length != $b.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $s = 0L;
         |  for (int $i = 0; $i < $a.length; $i++) {
         |    $s += ((long) $a[$i]) * ((long) $b[$i]);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDotI8 =
    copy(left = newLeft, right = newRight)
}
