package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * 1-bit (binary) embedding quantization (SURVEY.md §2j scale path).
 *
 * The most aggressive compression on the int8 ladder ([[VecQuantizeI8]]):
 * keep only the SIGN of each coordinate. A 64-dim float32 embedding
 * (256 B) becomes 64 bits (8 B) — 32× less to scan, cache, and shuffle —
 * and the angular distance is approximated by the Hamming distance
 * between sign patterns (the SRP-LSH estimate: for unit vectors,
 * E[hamming]/dim = θ/π), computable with XOR + POPCNT, no FLOPs at all.
 * This is the signature behind binary-quantized vector search: scan the
 * packed bits for a Hamming shortlist, then rerank the shortlist with
 * the exact float cosine.
 *
 * Packing is 32 sign bits per Long word (word w holds positions
 * [32w, 32w+32), position p at bit (p mod 32)): bit 63 is never used, so
 * word construction involves no sign-bit arithmetic and an external
 * system (or the DuckDB oracle) can rebuild identical words with plain
 * integer shifts and adds. A >64-dim deployment just gets more words;
 * Hamming over the word array is sum(bit_count(xor)) per word.
 *
 * Codegen'd (`doGenCode`) like the rest of the vector family — the
 * pack loop stays inside whole-stage codegen.
 */
case class VecSignPack32(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(t, _) if t == FloatType || t == DoubleType =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"sign_pack32 expects array<float|double>, got ${t.catalogString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "sign_pack32"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val words = new Array[Long]((n + 31) / 32)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val v = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      if (v > 0.0) words(i / 32) |= (1L << (i % 32))
      i += 1
    }
    new GenericArrayData(words)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val words = ctx.freshName("words")
      s"""
         |int $n = $a.numElements();
         |long[] $words = new long[($n + 31) / 32];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  if (((double) $a.$get($i)) > 0.0) {
         |    $words[$i / 32] |= (1L << ($i % 32));
         |  }
         |}
         |if (!${ev.isNull}) {
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($words);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): VecSignPack32 =
    copy(child = newChild)
}
