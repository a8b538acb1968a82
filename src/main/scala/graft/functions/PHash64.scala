package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/**
 * `phash64(payload)` — 64-bit perceptual AVERAGE HASH (aHash) of a
 * binary payload, as a code-generating Catalyst expression.
 *
 * The classical aHash pipeline (decode → downsample to an 8×8 luma
 * grid → bit i = cell i brighter than the grid mean) applied to the
 * decoded byte stream: the payload is average-pooled into 64 equal
 * stripes (the downsample), and bit i is set iff stripe i's mean
 * exceeds the global mean. Small local perturbations move one stripe
 * mean slightly, so near-identical payloads land within a few hamming
 * bits — the property perceptual dedup blocks on — while the
 * mean-comparison is computed with EXACT integer cross-multiplication
 * (sum_i·n > total·cnt_i), so the hash is bit-stable on every platform.
 *
 * This engine's media decode is a stub (no codec ships in the
 * container — multimodal/MediaDecode.scala); the pooled-stripe hash
 * over the decoded bytes is the real plan shape, and swapping the stub
 * for a real decoder changes nothing downstream of the byte stream.
 */
case class PHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"phash64 expects a binary payload, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "phash64"

  override def nullSafeEval(input: Any): Any =
    PHash64.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): PHash64 =
    copy(child = newChild)
}

object PHash64 {
  /** Shared by interpreted eval and generated code. */
  def compute(bytes: Array[Byte]): Long = {
    val n = bytes.length
    if (n == 0) return 0L
    val sums = new Array[Long](64)
    val cnts = new Array[Long](64)
    var i = 0
    while (i < n) {
      // stripe of byte i under the equal-split downsample
      val s = (i.toLong * 64 / n).toInt
      sums(s) += (bytes(i) & 0xff)
      cnts(s) += 1
      i += 1
    }
    var total = 0L
    i = 0
    while (i < 64) { total += sums(i); i += 1 }
    var h = 0L
    i = 0
    while (i < 64) {
      // stripe mean > global mean, exact: sums(i)/cnts(i) > total/n
      if (cnts(i) > 0 && sums(i) * n > total * cnts(i)) h |= 1L << i
      i += 1
    }
    h
  }
}
