package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Welford/Chan online-variance state: count, running mean, sum of squared
  * deviations. A case class so the product encoder keeps the buffer
  * unboxed in Tungsten rows. */
case class VarBuf(n: Long, mean: Double, m2: Double)

/**
 * Numerically stable sample variance as a typed `Aggregator[IN, BUF, OUT]`
 * (SURVEY.md §2d "custom typed UDAF" — the third UDAF surface next to the
 * two `TypedImperativeAggregate` sketches).
 *
 * Per-partition updates use Welford's recurrence; cross-partition merge
 * uses Chan et al.'s pairwise-combine formula — an exact-merge design, so
 * like the sketches the result is independent of partitioning (up to fp
 * rounding) and the aggregate runs partial+final with no driver state.
 *
 * Register with `functions.udaf(new WelfordVariance)` for the Column API
 * or use on typed Datasets via `.toColumn`.
 */
class WelfordVariance extends Aggregator[Double, VarBuf, Double] {

  override def zero: VarBuf = VarBuf(0L, 0.0, 0.0)

  override def reduce(b: VarBuf, x: Double): VarBuf = {
    val n = b.n + 1
    val delta = x - b.mean
    val mean = b.mean + delta / n
    VarBuf(n, mean, b.m2 + delta * (x - mean))
  }

  override def merge(a: VarBuf, b: VarBuf): VarBuf = {
    if (a.n == 0) b
    else if (b.n == 0) a
    else {
      val n = a.n + b.n
      val delta = b.mean - a.mean
      VarBuf(n,
        a.mean + delta * b.n / n,
        a.m2 + b.m2 + delta * delta * a.n * b.n / n)
    }
  }

  /** Sample variance (n−1 denominator). Below 2 observations this
    * returns NaN — a DELIBERATE deviation from Spark 4's `var_samp`,
    * which returns NULL for n<=1 (NaN only under the legacy
    * `statisticalAggregate` flag): an `Aggregator[.., Double]` with a
    * primitive output encoder cannot produce null, and NaN is the
    * nearest representable sentinel. Callers comparing against
    * `var_samp` must restrict to groups with n >= 2 (q_typed_udaf
    * does). */
  override def finish(r: VarBuf): Double =
    if (r.n < 2) Double.NaN else r.m2 / (r.n - 1)

  override def bufferEncoder: Encoder[VarBuf] = Encoders.product[VarBuf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
