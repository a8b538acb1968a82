package graft.sketches

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/**
 * Bounded top-k-per-group aggregate: `topk_agg(score, id, k)` returns
 * `array<struct<score:double, id:bigint>>` — the k highest-scoring rows,
 * ordered (score desc, id asc), ties broken by the unique id.
 *
 * This is the scalable form of "top N per key". The window-rank
 * formulation (`row_number() OVER (PARTITION BY g ORDER BY s DESC) <= k`)
 * must shuffle and SORT every row of every group; this aggregate keeps a
 * k-element min-heap per (partition, group), so the shuffle carries at
 * most k rows per group per partition and nothing is ever fully sorted —
 * at 100 TB with k=3 that is the difference between shuffling the table
 * and shuffling kilobytes. Merge is heap-union-truncate, associative and
 * commutative, so partial aggregation applies as usual.
 *
 * Contract: `id` must uniquely identify a row — it is the tie-break for
 * equal scores, and duplicate (score, id) pairs would occupy multiple
 * heap slots (derive it from a key, e.g. orderkey*10+linenumber).
 */
case class TopKAgg(
    scoreExpr: Expression,
    idExpr: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]]
  with TernaryLike[Expression] {

  def this(score: Expression, id: Expression, k: Expression) = this(score, id, k, 0, 0)

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  // min-heap: head is the WEAKEST entry = lowest score, ties resolved so
  // that a larger id is weaker (we keep the smallest ids among ties)
  private val weakestFirst: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (s, i) => (-s, i) }

  override def first: Expression = scoreExpr
  override def second: Expression = idExpr
  override def third: Expression = kExpr

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!kExpr.foldable) {
      TypeCheckResult.TypeCheckFailure("topk_agg k must be a constant")
    } else if (kExpr.eval() == null ||
               kExpr.eval().asInstanceOf[Number].intValue() < 1) {
      // fail at analysis: with k <= 0 offer() would buf.head an empty heap
      TypeCheckResult.TypeCheckFailure(
        s"topk_agg k must be >= 1, got ${kExpr.eval()}")
    } else (scoreExpr.dataType, idExpr.dataType) match {
      case (DoubleType | FloatType | LongType | IntegerType, LongType | IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"topk_agg expects (numeric score, integral id), got " +
          s"${s.catalogString}, ${i.catalogString}")
    }
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_agg"

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty[(Double, Long)](weakestFirst)

  private def offer(buf: mutable.PriorityQueue[(Double, Long)],
      s: Double, i: Long): Unit = {
    if (buf.size < k) buf.enqueue((s, i))
    else {
      val (ws, wi) = buf.head
      if (s > ws || (s == ws && i < wi)) { buf.dequeue(); buf.enqueue((s, i)) }
    }
  }

  override def update(buf: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val sv = scoreExpr.eval(input)
    val iv = idExpr.eval(input)
    if (sv != null && iv != null) {
      val s = sv match {
        case d: java.lang.Double  => d.doubleValue()
        case f: java.lang.Float   => f.doubleValue()
        case l: java.lang.Long    => l.doubleValue()
        case n: java.lang.Integer => n.doubleValue()
      }
      val i = iv match {
        case l: java.lang.Long    => l.longValue()
        case n: java.lang.Integer => n.longValue()
      }
      offer(buf, s, i)
    }
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Double, Long)],
      other: mutable.PriorityQueue[(Double, Long)]):
      mutable.PriorityQueue[(Double, Long)] = {
    other.foreach { case (s, i) => offer(buf, s, i) }
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    val sorted = buf.toArray.sortBy { case (s, i) => (-s, i) }
    new GenericArrayData(sorted.map { case (s, i) => InternalRow(s, i) })
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var j = 0
    while (j < n) { buf.enqueue((in.readDouble(), in.readLong())); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): TopKAgg =
    copy(scoreExpr = newFirst, idExpr = newSecond, kExpr = newThird)
}
