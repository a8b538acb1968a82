package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/**
 * Optimizer rule: rewrite a pure point-in-interval range join — the plan
 * Spark executes as a BroadcastNestedLoopJoin / CartesianProduct, O(n·m)
 * comparisons — into a binned equi-join (SURVEY.md §4; the manual form is
 * `q_range_join_binned` / the epoch-bin rewrites of `q_asof_join` and
 * `q_interval_overlap`, here promoted to an automatic Catalyst rewrite).
 *
 *   point JOIN ival ON p.x >= i.lo AND p.x <= i.hi        (no equi conjunct)
 *     ⇒ point+  = Project(point, bin_l = floor(x / W))
 *       ival+   = Generate(explode(sequence(floor(lo/W), floor(hi/W))), ival)
 *       point+ JOIN ival+ ON bin_l = bin_r AND <original condition>
 *
 * Each point row lands in exactly ONE bin and every interval is replicated
 * to exactly the bins it covers, so a qualifying pair meets on precisely
 * one bin key — no duplicates, no `distinct` needed — and the residual
 * original predicate keeps exactness on the bin-boundary stragglers. A
 * non-qualifying pair either never shares a bin (pruned before the join —
 * the entire point of the rewrite) or fails the residual. The planner sees
 * the injected equality and picks a shuffled hash/sort-merge join: the
 * O(n·m) loop becomes O(n + m·bins_per_interval) with both sides hash-
 * partitioned on the bin key — the shape that survives 100 TB, where a
 * nested loop over a non-broadcastable side is unrunnable.
 *
 * Bin width W (`spark.graft.rangeJoin.binSize`, 0 = rule off) is the one
 * deployment dial: W ≈ the typical interval length replicates each
 * interval to ~2 bins; W far below that inflates the Generate fan-out
 * (`sequence` hard-fails past Int.MaxValue elements rather than silently
 * truncating — a mis-set dial is loud, never wrong).
 *
 * Guards: conf-gated; Inner joins only; fires only when the condition has
 * NO equi conjunct (with one, Spark already plans a hash join and the
 * range is a cheap post-filter); both bounds must come from the same side
 * with the probe expression from the other; numeric/timestamp types only;
 * structurally idempotent (the injected bin attributes are recognized on
 * re-entry, so the rule is safe under the FixedPoint `extraOptimizations`
 * batch of a pre-built session as well as the Once pre-CBO injection).
 * Intervals with lo > hi can match nothing and are filtered out before
 * the Generate (`sequence` would otherwise reject the descending bounds).
 */
case class RangeJoinBinningRule(spark: SparkSession) extends Rule[LogicalPlan]
    with PredicateHelper {

  private val BinL = "graft_bin_l"
  private val BinR = "graft_bin_r"

  private def binSize: Double =
    spark.conf.getOption("spark.graft.rangeJoin.binSize")
      .map(_.toDouble).getOrElse(0.0)

  private def supported(dt: DataType): Boolean = dt match {
    case _: NumericType | TimestampType => true
    case _ => false
  }

  /** floor(e / W) as a LongType bin id (timestamps bin on epoch seconds). */
  private def bin(e: Expression, w: Double): Expression =
    Floor(Divide(Cast(e, DoubleType), Literal(w)))

  /** A conjunct `x >= lo` (any of >=, >, <=, < in either operand order),
    * normalized to (probe, bound, isLower). Strict bounds bin exactly like
    * their inclusive forms — binning only over-approximates; the residual
    * keeps strictness. */
  private def asBound(c: Expression): Option[(Expression, Expression, Boolean)] =
    c match {
      case GreaterThanOrEqual(x, lo) => Some((x, lo, true))
      case GreaterThan(x, lo)        => Some((x, lo, true))
      case LessThanOrEqual(x, hi)    => Some((x, hi, false))
      case LessThan(x, hi)           => Some((x, hi, false))
      case _                         => None
    }

  /** Flip a bound so `probe` is the side we orient by. */
  private def oriented(b: (Expression, Expression, Boolean),
      left: LogicalPlan, right: LogicalPlan):
      Option[(Expression, Expression, Boolean, Boolean)] = {
    val (a, b2, isLower) = b
    // (probe, bound, isLower, probeIsLeft)
    if (a.references.nonEmpty && a.references.subsetOf(left.outputSet) &&
        b2.references.nonEmpty && b2.references.subsetOf(right.outputSet))
      Some((a, b2, isLower, true))
    else if (a.references.nonEmpty && a.references.subsetOf(right.outputSet) &&
        b2.references.nonEmpty && b2.references.subsetOf(left.outputSet))
      Some((a, b2, isLower, false))
    else None
  }

  private def alreadyBinned(cond: Expression): Boolean =
    cond.references.exists(a => a.name == BinL || a.name == BinR)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = binSize
    if (!(w > 0)) return plan

    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if !alreadyBinned(cond) =>
        val conjuncts = splitConjunctivePredicates(cond)
        val hasEqui = conjuncts.exists {
          case EqualTo(a, b) =>
            (a.references.subsetOf(left.outputSet) &&
              b.references.subsetOf(right.outputSet)) ||
            (a.references.subsetOf(right.outputSet) &&
              b.references.subsetOf(left.outputSet))
          case _ => false
        }
        if (hasEqui) j
        else {
          val bounds = conjuncts.flatMap(c =>
            asBound(c).flatMap(oriented(_, left, right)))
          // one lower and one upper bound on the SAME probe expression,
          // with both interval endpoints on the opposite side
          val hit = bounds.collectFirst {
            case (x, lo, true, pl)
                if supported(x.dataType) && x.deterministic &&
                   lo.deterministic &&
                   bounds.exists { b =>
                     !b._3 && b._4 == pl && b._1.semanticEquals(x) &&
                       b._2.deterministic
                   } =>
              val hi = bounds.find { b =>
                !b._3 && b._4 == pl && b._1.semanticEquals(x) &&
                  b._2.deterministic
              }.get._2
              (x, lo, hi, pl)
          }
          hit match {
            case Some((x, lo, hi, probeIsLeft))
                if supported(lo.dataType) && supported(hi.dataType) =>
              val (probe, ival) = if (probeIsLeft) (left, right) else (right, left)
              // probe side: one bin per row
              val binL = Alias(bin(x, w), BinL)()
              val probeB = Project(probe.output :+ binL, probe)
              // interval side: descending bounds match nothing — drop them
              // before `sequence` (which rejects start > stop with step 1)
              val keep = Filter(LessThanOrEqual(lo, hi), ival)
              // Sequence is TimeZoneAwareExpression: unresolved until the
              // zone is pinned, even over plain longs
              val seq = new Sequence(bin(lo, w), bin(hi, w), Literal(1L))
                .withTimeZone(spark.sessionState.conf.sessionLocalTimeZone)
              val gen = Explode(seq)
              val binR = AttributeReference(BinR, LongType,
                nullable = gen.elementSchema.head.nullable)()
              val ivalB = Generate(gen, unrequiredChildIndex = Nil,
                outer = false, qualifier = None,
                generatorOutput = Seq(binR), child = keep)
              val eq = EqualTo(binL.toAttribute, binR)
              val (newL, newR) =
                if (probeIsLeft) (probeB, ivalB) else (ivalB, probeB)
              // original output order and attributes are preserved
              Project(j.output,
                Join(newL, newR, Inner, Some(And(eq, cond)), hint))
            case _ => j
          }
        }
    }
  }
}
