package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/**
 * `byte_entropy(payload)` — Shannon entropy of a binary payload in bits
 * per byte, as a code-generating Catalyst expression.
 *
 * H = log₂(n) − (Σ cᵢ·log₂ cᵢ)/n over the 256-bucket byte histogram —
 * the count-based form, so the histogram stays integer-exact and the
 * logs are taken once per OCCUPIED bucket (≤ 256 per row, not per
 * byte). The measure is the standard content-corruption probe for
 * opaque media columns: truncated/zero-padded payloads collapse toward
 * 0 bits, encrypted or bit-rotten payloads saturate toward 8, while
 * structured media sits in between — a pure per-row map over the scan
 * (no shuffle, state O(256)), so the filter costs one pass at any
 * corpus size. Deterministic: the histogram walk and the bucket loop
 * have fixed order, so the double result is identical on every
 * partitioning/retry.
 */
case class ByteEntropy(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"byte_entropy expects a binary payload, got ${other.catalogString}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "byte_entropy"

  override def nullSafeEval(input: Any): Any =
    ByteEntropy.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ByteEntropy.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): ByteEntropy =
    copy(child = newChild)
}

object ByteEntropy {
  private val LN2 = math.log(2.0)

  /** Shared by interpreted eval and generated code. Empty payload → 0. */
  def compute(bytes: Array[Byte]): Double = {
    val n = bytes.length
    if (n == 0) return 0.0
    val hist = new Array[Long](256)
    var i = 0
    while (i < n) { hist(bytes(i) & 0xff) += 1; i += 1 }
    var acc = 0.0
    i = 0
    while (i < 256) {
      val c = hist(i)
      if (c > 0) acc += c * (math.log(c.toDouble) / LN2)
      i += 1
    }
    math.log(n.toDouble) / LN2 - acc / n
  }
}
