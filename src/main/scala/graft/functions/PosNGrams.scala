package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * `pos_ngrams(tokens, n)` — a custom Catalyst `Generator` (the UDTF
 * surface of SURVEY.md §2i): emits one `(pos, gram)` row per n-token
 * window of the input array, where `gram` is the space-joined window
 * and `pos` its 0-based start offset.
 *
 * This is extension tier (b): built-in generators (`explode`,
 * `posexplode`, `inline`) can only unnest EXISTING collections, so the
 * composable formulation must first MATERIALIZE the n-gram array per
 * row (`transform(sequence(...), i -> concat_ws(...))`) and then
 * explode it — one allocated intermediate array per document. The
 * generator emits windows straight off the token array instead. Rows
 * stream out of `GenerateExec` one at a time, so peak memory per row is
 * O(n tokens), never O(grams) — the property that matters when a
 * document is 1 M tokens long.
 *
 * `CodegenFallback` is deliberate: custom generators run interpreted
 * inside `GenerateExec` (only `explode`-family generators codegen);
 * the surrounding project/filter stages still fuse. Null or undersized
 * arrays emit nothing, matching `explode` of an empty array.
 */
case class PosNGrams(child: Expression, n: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(child, n)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PosNGrams =
    copy(child = newChildren(0), n = newChildren(1))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) =>
      if (!n.foldable)
        TypeCheckResult.TypeCheckFailure("pos_ngrams n must be a constant")
      else n.dataType match {
        // integral only — a fractional n would otherwise truncate
        // silently, and a non-numeric one would throw ClassCastException
        // out of analysis instead of a clean type-check failure
        case ByteType | ShortType | IntegerType | LongType =>
          n.eval() match {
            case v: Number if v.intValue() >= 1 => TypeCheckResult.TypeCheckSuccess
            case _ => TypeCheckResult.TypeCheckFailure("pos_ngrams n must be >= 1")
          }
        case t => TypeCheckResult.TypeCheckFailure(
          s"pos_ngrams n must be an integral constant, got ${t.catalogString}")
      }
    case t => TypeCheckResult.TypeCheckFailure(
      s"pos_ngrams expects array<string>, got ${t.catalogString}")
  }

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("gram", StringType, nullable = false)))

  private lazy val nv: Int = n.eval().asInstanceOf[Number].intValue()
  private val space = UTF8String.fromString(" ")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null) return Iterator.empty
    val len = arr.numElements()
    if (len < nv) return Iterator.empty
    new Iterator[InternalRow] {
      private var i = 0
      override def hasNext: Boolean = i <= len - nv
      override def next(): InternalRow = {
        val parts = new Array[UTF8String](nv)
        var j = 0
        while (j < nv) {
          // pass nulls through: UTF8String.concatWs SKIPS null inputs,
          // exactly like the concat_ws expression — so a window with a
          // null token joins the remaining tokens with single spaces,
          // matching the documented composable-equivalent formulation
          parts(j) = if (arr.isNullAt(i + j)) null
                     else arr.getUTF8String(i + j)
          j += 1
        }
        val row = InternalRow(i, UTF8String.concatWs(space, parts: _*))
        i += 1
        row
      }
    }
  }

  override def prettyName: String = "pos_ngrams"
}
