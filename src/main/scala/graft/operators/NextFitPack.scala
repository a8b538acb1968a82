package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.LongType

/**
 * Whole-operator form of next-fit sequence packing (SURVEY.md §2j /
 * the brief's extension tier (c): custom LogicalPlan + Strategy +
 * SparkPlan): appends a `pack_id` column assigning each row to a
 * fixed-capacity pack, next-fit within each group in `order` order.
 *
 * Why an operator and not `mapPartitions`: packing's contract —
 * "all rows of a group on one partition, sorted by (group, order)" —
 * becomes a DECLARED requirement (`requiredChildDistribution` /
 * `requiredChildOrdering`), so `EnsureRequirements` plans the exchange
 * and sort only when the child doesn't already satisfy them. Input
 * that is already bucketed/sorted on the group key (the 100 TB layout
 * for corpus shards) is packed with ZERO added shuffle or sort —
 * something the mapPartitions formulation (which hard-codes its own
 * repartition+sortWithinPartitions) cannot express. PackExecSpec pins
 * both plans.
 */
case class NextFitPack(
    group: Expression,
    order: Expression,
    weight: Expression,
    budget: Long,
    packId: AttributeReference,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ packId
  override def references: AttributeSet =
    AttributeSet(Seq(group, order, weight).flatMap(_.references))
  override protected def withNewChildInternal(newChild: LogicalPlan): NextFitPack =
    copy(child = newChild)
}

case class NextFitPackExec(
    group: Expression,
    order: Expression,
    weight: Expression,
    budget: Long,
    packId: Attribute,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ packId

  /** The packing contract, declared — not hand-scheduled. */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(group)) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(group, Ascending), SortOrder(order, Ascending)))

  /** One appended column changes neither partitioning nor ordering. */
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = child.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val boundGroup = BindReferences.bindReference(group, childOutput)
    val boundWeight = BindReferences.bindReference(weight, childOutput)
    val fullOutput = output
    val capacity = budget
    child.execute().mapPartitions { iter =>
      // per-partition sequential scan: rows arrive grouped and sorted
      // (the declared requirement), so one running (key, pack, fill)
      // suffices — O(1) state, no buffering
      val groupProj = UnsafeProjection.create(Seq(boundGroup))
      val outProj = UnsafeProjection.create(fullOutput, childOutput :+ packId)
      val joined = new JoinedRow
      val packCell = new GenericInternalRow(1)
      var curKey: InternalRow = null
      var pack = 0L
      var fill = 0L
      iter.map { row =>
        val key = groupProj(row)
        val w = boundWeight.eval(row).asInstanceOf[Long]
        if (curKey == null || key != curKey) {
          curKey = key.copy(); pack = 1L; fill = w
        } else if (fill + w > capacity) {
          pack += 1L; fill = w
        } else fill += w
        packCell.setLong(0, pack)
        outProj(joined(row, packCell))
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): NextFitPackExec =
    copy(child = newChild)
}

/** Planner strategy for [[NextFitPack]]. */
object NextFitPackStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case NextFitPack(g, o, w, b, p, child) =>
      NextFitPackExec(g, o, w, b, p, planLater(child)) :: Nil
    case _ => Nil
  }
}

object PackOps {
  /**
   * Append a `pack_id` (1-based per group) assigning rows to next-fit
   * packs of at most `budget` total `weight`, in `order` order within
   * each `group`. Weight must be a LONG column of `df`.
   */
  def nextFitPack(df: DataFrame, group: String, order: String,
      weight: String, budget: Long, as: String = "pack_id"): DataFrame = {
    val spark = df.sparkSession
    // idempotent strategy registration so the operator works on any
    // session, extensions or not
    if (!spark.experimental.extraStrategies.contains(NextFitPackStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ NextFitPackStrategy
    }
    val analyzed = df.queryExecution.analyzed
    def attr(name: String): Attribute =
      analyzed.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${analyzed.output.map(_.name).mkString(", ")}"))
    require(attr(weight).dataType == LongType,
      s"weight column $weight must be LONG, is ${attr(weight).dataType}")
    val packId = AttributeReference(as, LongType, nullable = false)()
    org.apache.spark.sql.graft.Shims.ofRows(spark,
      NextFitPack(attr(group), attr(order), attr(weight), budget, packId, analyzed))
  }
}
