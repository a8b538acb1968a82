package graft.sketches

import java.io.{ByteArrayInputStream, DataInputStream}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/**
 * Distinct-count estimation from a Bloom filter's fill ratio — the
 * Swamidass & Baldi estimator (J. Chem. Inf. Model. 2007):
 *
 *   n̂ = −(m/k) · ln(1 − X/m)
 *
 * where m = bit-array size, k = hash count, X = set bits. A Bloom filter
 * built for membership thus answers "how many distinct keys went in?"
 * for free — no second HLL pass over the data. The estimate is exact in
 * expectation for X ≪ m and degrades as the filter fills; a SATURATED
 * filter (X = m) carries no cardinality information and returns +∞
 * rather than a fabricated number.
 *
 * Determinism: Spark's BloomFilter hashes with a fixed-seed Murmur3, so
 * the same inserted multiset always yields the same bit array and the
 * same estimate — safe to compare against thresholds in a hash-checked
 * oracle.
 *
 * Parsing: BloomFilterImpl serialized layout (format VERSION 2, verified
 * against `writeTo` byte-for-byte): `int version, int numHashFunctions,
 * long numWords, long words[numWords]`. Only the popcount and sizes are
 * needed — the words are scanned once and not retained.
 *
 * Capability extension of the reference's Bloom membership stage
 * (SURVEY.md §2c `[paper:SB07]`; reference mount empty).
 */
case class BloomNdv(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "bloom_ndv"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != BinaryType) {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName argument must be a BINARY serialized Bloom filter")
    } else TypeCheckResult.TypeCheckSuccess

  @transient private var cachedBytes: Array[Byte] = _
  @transient private var cachedEst: Double = _

  def estimate(bytes: Array[Byte]): Double = {
    if ((bytes ne cachedBytes) &&
        (cachedBytes == null || !java.util.Arrays.equals(bytes, cachedBytes))) {
      cachedBytes = bytes
      val in = new DataInputStream(new ByteArrayInputStream(bytes))
      val version = in.readInt()
      require(version == 2, s"unsupported BloomFilter serial format $version")
      val k = in.readInt()
      val numWords = in.readLong()
      var setBits = 0L
      var i = 0L
      while (i < numWords) { setBits += java.lang.Long.bitCount(in.readLong()); i += 1 }
      val m = numWords * 64.0
      cachedEst =
        if (setBits == 0L) 0.0
        else if (setBits >= m) Double.PositiveInfinity
        else -(m / k) * Math.log1p(-(setBits / m))
    }
    cachedEst
  }

  override def nullSafeEval(v: Any): Any = estimate(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomNdv", this, classOf[BloomNdv].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.estimate($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomNdv =
    copy(child = newChild)
}
