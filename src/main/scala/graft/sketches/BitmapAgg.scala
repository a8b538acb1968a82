package graft.sketches

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/**
 * Fixed-size bitmap aggregate: `bitmap_agg(pos)` sets bit `pos`
 * (0 ≤ pos < 32768, i.e. `bitmap_bit_position`'s range) in a 4 KiB
 * bitmap, merged by bitwise OR — byte-compatible with the built-in
 * `bitmap_construct_agg`, so `bitmap_count` / `bitmap_or_agg` work on
 * the result unchanged.
 *
 * Exists because the built-in is a DeclarativeAggregate over a binary
 * buffer, which HashAggregate cannot hold — Catalyst plans it as
 * SortAggregate with a full sort of the input under BOTH the partial
 * and final stages. As a TypedImperativeAggregate this lands in
 * ObjectHashAggregate: no sort anywhere, partial+final hash as usual.
 */
case class BitmapAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  def this(child: Expression) = this(child, 0, 0)

  private val numBytes = 4096 // 32768 bits, matches bitmap_bucket_number

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"bitmap_agg expects an integral bit position, got ${dt.catalogString}")
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bitmap_agg"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](numBytes)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val pos = v match {
        case l: java.lang.Long    => l.longValue()
        case i: java.lang.Integer => i.longValue()
      }
      require(pos >= 0 && pos < numBytes * 8L,
        s"bitmap_agg position $pos out of [0, ${numBytes * 8})")
      val p = pos.toInt
      buf(p >> 3) = (buf(p >> 3) | (1 << (p & 7))).toByte
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < numBytes) { buf(i) = (buf(i) | other(i)).toByte; i += 1 }
    buf
  }

  override def eval(buf: Array[Byte]): Any = buf
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BitmapAgg =
    copy(child = newChild)
}
