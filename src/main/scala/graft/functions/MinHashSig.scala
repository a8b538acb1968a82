package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * `minhash_sig(grams | tokens)` — combined k=16 MinHash signature as a
 * code-generating Catalyst expression, in two input modes:
 *
 *  - `array<bigint>`: the input IS the gram-hash array; 16 coordinate
 *    minima fold into one 64-bit signature.
 *  - `array<string>`: the input is the TOKEN array; word-3-gram hashes
 *    are derived inline with the exact `xxhash64(t0, t1, t2)` chain
 *    (seed 42, [[XXH64.hashUTF8String]] per part — bit-identical to the
 *    SQL function, FunctionsSpec-pinned), with the whole-doc fallback
 *    gram `xxhash64(concat_ws(' ', tokens))` under 3 tokens — the
 *    [[graft.queries.TextQueries.gramHashPostings]] gram definition.
 *
 * The token mode exists for the streaming ingest gate: the composable
 * form (a `transform` HOF producing the gram array, then 16
 * `array_min(transform(...))`) is CodegenFallback — an interpreted
 * per-element lambda that measured ~3 ms/doc on the sf0.1 corpus
 * (~14 s per evaluation, several evaluations per query). Here
 * tokenize-adjacent work happens once per row in one compiled loop:
 * 3 XXH64 calls per gram + 16 mixes, nothing allocated.
 *
 * Coordinate j's hash is a splitmix64 finalizer over (gram ⊕ saltⱼ) —
 * the multiplicative min-wise family. Properties the dedup gate relies
 * on: (a) the signature is a pure function of the gram SET (equal sets
 * ⇒ equal minima ⇒ equal signature — the no-miss direction for
 * Jaccard-1.0 pairs), and (b) near-identical sets collide with
 * probability ≈ jᵏ — the classic banding rate for sub-identical pairs.
 */
case class MinHashSig(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) | ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<bigint> gram hashes or array<string> tokens, " +
        s"got ${other.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "minhash_sig"

  private def tokenMode: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == StringType

  override def nullSafeEval(input: Any): Any =
    if (tokenMode) MinHashSig.computeTokens(input.asInstanceOf[ArrayData])
    else MinHashSig.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (tokenMode) "computeTokens" else "compute"
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashSig.$fn($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  val K = 16

  /** One salt per coordinate from a splitmix64 stream (seed 42). */
  private[graft] val salts: Array[Long] = {
    var x = 42L
    Array.fill(K) {
      x += 0x9E3779B97F4A7C15L
      finalizeMix(x)
    }
  }

  private def finalizeMix(v: Long): Long = {
    var z = v
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Coordinate hash h_j(g) (shared by compute and the spec). */
  private[graft] def coord(g: Long, j: Int): Long = finalizeMix(g ^ salts(j))

  private def updateMins(mins: Array[Long], g: Long): Unit = {
    var j = 0
    while (j < K) {
      val h = finalizeMix(g ^ salts(j))
      if (h < mins(j)) mins(j) = h
      j += 1
    }
  }

  private def fold(mins: Array[Long]): Long = {
    var r = 0x9E3779B97F4A7C15L
    var j = 0
    while (j < K) { r = finalizeMix(r ^ mins(j)); j += 1 }
    r
  }

  /** Gram-hash mode; shared by interpreted eval and generated code.
    * Null elements count as gram hash 0 (never null in this engine). */
  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    val mins = Array.fill(K)(Long.MaxValue)
    var i = 0
    while (i < n) {
      updateMins(mins, if (arr.isNullAt(i)) 0L else arr.getLong(i))
      i += 1
    }
    fold(mins)
  }

  /** Token mode: word-3-gram hashes exactly as `xxhash64(t0, t1, t2)`
    * (seed 42), whole-doc join gram under 3 tokens. */
  def computeTokens(arr: ArrayData): Long = {
    val n = arr.numElements()
    val mins = Array.fill(K)(Long.MaxValue)
    if (n >= 3) {
      var i = 0
      while (i <= n - 3) {
        var h = 42L
        h = XXH64.hashUTF8String(arr.getUTF8String(i), h)
        h = XXH64.hashUTF8String(arr.getUTF8String(i + 1), h)
        h = XXH64.hashUTF8String(arr.getUTF8String(i + 2), h)
        updateMins(mins, h)
        i += 1
      }
    } else {
      val parts = Array.tabulate(n)(i => arr.getUTF8String(i))
      val joined = UTF8String.concatWs(UTF8String.fromString(" "), parts: _*)
      updateMins(mins, XXH64.hashUTF8String(joined, 42L))
    }
    fold(mins)
  }
}
