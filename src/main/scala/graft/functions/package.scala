package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Shims
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.sketches.{BloomBuildAgg, BloomMergeAgg, BloomMightContain, CmsBuildAgg, CmsEstimate, CmsMergeAgg}

/**
 * graft.functions — the engine's column-function surface.
 *
 * Everything here is built from codegen'd Catalyst expressions
 * (`org.apache.spark.sql.functions` built-ins or the graft sketch
 * expressions); there are no Scala UDF closures in any hot path, so every
 * helper stays inside whole-stage codegen and is safe at 100 TB scale.
 */
package object functions {

  // ------------------------------------------------------------------
  // Probabilistic sketches (the reference's core — SURVEY.md §2c)
  // ------------------------------------------------------------------

  /** Build a cuckoo filter over a column → BinaryType: the deletable
    * membership sketch ([[graft.sketches.CuckooBuildAgg]]); m buckets ×
    * 4 slots of 8-bit fingerprints, merged by re-insertion. */
  def cuckoo_agg(col: Column, buckets: Int): Column =
    Shims.column(new graft.sketches.CuckooBuildAgg(
      Shims.expression(col), Shims.expression(lit(buckets)))
      .toAggregateExpression())

  /** Codegen'd cuckoo membership probe ([[graft.sketches.CuckooContains]]). */
  def cuckoo_contains(sketch: Column, value: Column): Column =
    Shims.column(graft.sketches.CuckooContains(
      Shims.expression(sketch), Shims.expression(value)))

  /** Build a Bloom filter over a column → BinaryType (distributed, mergeable). */
  def bloom_agg(col: Column, expectedItems: Long, fpp: Double): Column =
    Shims.column(BloomBuildAgg(Shims.expression(col),
      Shims.expression(lit(expectedItems)), Shims.expression(lit(fpp)))
      .toAggregateExpression())

  /** Probe a serialized Bloom filter; no false negatives. */
  def bloom_might_contain(sketch: Column, value: Column): Column =
    Shims.column(BloomMightContain(Shims.expression(sketch), Shims.expression(value)))

  /** Build a Count-Min Sketch over a column → BinaryType (distributed, mergeable). */
  def cms_agg(col: Column, eps: Double, confidence: Double, seed: Int): Column =
    Shims.column(CmsBuildAgg(Shims.expression(col), Shims.expression(lit(eps)),
      Shims.expression(lit(confidence)), Shims.expression(lit(seed)))
      .toAggregateExpression())

  /** 4 KiB bitmap with the given bit positions set, OR-merged —
    * byte-compatible with bitmap_construct_agg but planned as an
    * ObjectHashAggregate instead of a sorting SortAggregate. */
  def bitmap_agg(pos: Column): Column =
    Shims.column(new graft.sketches.BitmapAgg(Shims.expression(pos))
      .toAggregateExpression())

  /** Bounded top-k rows per group: array<struct<score,id>>, (score desc,
    * id asc). k-element heaps per partition -> the shuffle carries at most
    * k rows per (group, partition); see [[graft.sketches.TopKAgg]]. */
  def topk_agg(score: Column, id: Column, k: Int): Column =
    Shims.column(graft.sketches.TopKAgg(Shims.expression(score),
      Shims.expression(id), Shims.expression(lit(k)))
      .toAggregateExpression())

  /** Custom `Generator` (UDTF surface): one (pos, gram) row per n-token
    * window of the array — windows stream straight off the token array,
    * no per-row n-gram array materialization; see
    * [[graft.functions.PosNGrams]]. Multi-alias the result:
    * `pos_ngrams(tk, 3).as(Seq("pos", "gram"))`. */
  def pos_ngrams(tokens: Column, n: Int): Column =
    Shims.column(PosNGrams(Shims.expression(tokens), Shims.expression(lit(n))))

  /** Point-frequency estimate from a serialized CMS: f ≤ f̂ ≤ f + ε·N. */
  def cms_estimate(sketch: Column, value: Column): Column =
    Shims.column(CmsEstimate(Shims.expression(sketch), Shims.expression(value)))

  /** Swamidass–Baldi distinct-count estimate from a serialized Bloom
    * filter's fill ratio: n̂ = −(m/k)·ln(1−X/m) — membership and NDV
    * from the same sketch; see [[graft.sketches.BloomNdv]]. */
  def bloom_ndv(sketch: Column): Column =
    Shims.column(graft.sketches.BloomNdv(Shims.expression(sketch)))

  /** Join-size / inner-product estimate from two serialized CMS built
    * with the same eps/confidence/seed: a·b ≤ est ≤ a·b + ε‖a‖₁‖b‖₁
    * (CM05 §4.2) — the constant-size "how big would this join be?"
    * probe; see [[graft.sketches.CmsInnerProduct]]. */
  def cms_inner_product(a: Column, b: Column): Column =
    Shims.column(graft.sketches.CmsInnerProduct(
      Shims.expression(a), Shims.expression(b)))

  /** Merge serialized CMS columns (counter addition) — re-aggregate a
    * sketch table to any coarser grouping, like `hll_union_agg`. */
  def cms_merge_agg(sketch: Column): Column =
    Shims.column(new CmsMergeAgg(Shims.expression(sketch)).toAggregateExpression())

  /** Merge serialized Bloom filters (bitwise OR). */
  def bloom_merge_agg(sketch: Column): Column =
    Shims.column(new BloomMergeAgg(Shims.expression(sketch)).toAggregateExpression())

  // ------------------------------------------------------------------
  // Text analysis (north-star ops — SURVEY.md §2j)
  // ------------------------------------------------------------------

  /** Lower-cased whitespace tokens, empties dropped.
    *
    * Formulated as strip-then-split rather than split-then-`filter`: with
    * `\s+` the only empty tokens come from leading/trailing whitespace,
    * so stripping it first yields the identical array (proven
    * differentially in FunctionsSpec, including tab/newline/VT edges)
    * while every operator stays codegen'd — the `filter` HOF is
    * CodegenFallback and would interpret per document on the hottest path
    * in the engine. The strip is `trim` with an explicit char set: Java's
    * `\s` (the splitter) is exactly `[ \t\n\u000B\f\r]`, so trimming that
    * set agrees with the regex strip (`^\s+|\s+$`) on every input while
    * staying a regex-free codegen'd StringTrim — no per-document regex on
    * the hottest text path (differential-tested incl. VT/FF/CR edges). */
  def tokens(text: Column): Column = {
    val t = trim(text, " \t\n\u000B\f\r")
    when(length(t) === 0, array().cast("array<string>"))
      .otherwise(split(lower(t), "\\s+"))
  }

  /** The HOF formulation of [[tokens]] (interpreted; kept as the
    * differential-testing twin). */
  def tokens_hof(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => length(t) > 0)

  /** Whitespace token count (codegen'd, no UDF). */
  def token_count(text: Column): Column = size(tokens(text))

  /**
   * Word n-gram shingles of the token array (each shingle joined by a
   * single space). `sequence` + `transform` + `slice` keeps this fully
   * inside Catalyst.
   */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) < n, array(array_join(toks, " ")))
      .otherwise(transform(
        sequence(lit(1), size(toks) - lit(n - 1)),
        i => array_join(slice(toks, i, lit(n)), " ")))

  /**
   * MinHash signature: for each of `k` hash families, the minimum
   * xxhash64 of any shingle (hash family j = xxhash64 seeded by
   * prefixing the shingle with j). Deterministic; two documents with
   * Jaccard similarity s agree on each coordinate with probability s.
   */
  def minhash_signature(shingleArr: Column, k: Int): Column =
    array((0 until k).map { j =>
      array_min(transform(shingleArr, s => xxhash64(lit(j), s)))
    }: _*)

  /**
   * LSH band keys from a minhash signature: `bands` groups of `rowsPerBand`
   * coordinates, each band hashed to one long. Near-duplicates collide on
   * at least one band with high probability; a groupBy/join on
   * (band_index, band_hash) replaces the O(n²) all-pairs comparison —
   * this is the 100 TB-scale path.
   */
  def lsh_bands(signature: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      xxhash64(lit(b), array_join(
        transform(slice(signature, b * rowsPerBand + 1, rowsPerBand),
          x => x.cast("string")), ","))
    }: _*)

  /**
   * SimHash (64-bit) over a token array: per bit, majority vote of the
   * xxhash64 of the tokens. Near-identical documents differ in few bits.
   * Pure Catalyst: aggregate over tokens accumulating 64 signed counts.
   */
  def simhash64(toks: Column): Column = {
    // bit b of the simhash = 1 iff sum over tokens of sign(bit b of hash) > 0
    val bitCols = (0 until 64).map { b =>
      val votes = aggregate(toks, lit(0L),
        (acc, t) => acc + when((shiftright(xxhash64(t), b).bitwiseAND(lit(1L))) === 1L,
          lit(1L)).otherwise(lit(-1L)))
      when(votes > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    bitCols.reduce((a, c) => a.bitwiseOR(c))
  }

  /** Hamming distance between two 64-bit simhashes. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /**
   * Deterministic document fingerprint: order-sensitive 64-bit hash of
   * the token sequence for exact-order dedup. Tokens are joined on NUL
   * (which cannot appear inside a whitespace-split token) so distinct
   * sequences cannot collide by re-bracketing ("ab","c" vs "a","bc"),
   * then hashed once with xxhash64. Both array_join and xxhash64 are
   * codegen'd, unlike an `aggregate` HOF fold which drops the whole
   * projection to interpreted mode — at 100 TB that difference is the
   * scan throughput.
   */
  def doc_fingerprint(toks: Column): Column =
    xxhash64(array_join(toks, "\u0000"))

  /**
   * Language-ID score: fraction of tokens that are stopwords of the given
   * set. A pure-SQL n-gram/stopword heuristic (both Spark and the DuckDB
   * oracle can evaluate it identically).
   */
  def stopword_ratio(toks: Column, stopwords: Seq[String]): Column =
    when(size(toks) === 0, lit(0.0)).otherwise(
      size(filter(toks, t => t.isin(stopwords.map(lit): _*))).cast(DoubleType)
        / size(toks).cast(DoubleType))

  // ------------------------------------------------------------------
  // Vector / embedding math (similarity search — SURVEY.md §2j)
  // ------------------------------------------------------------------

  /** Dot product of two float/double arrays, accumulated in double —
    * a code-generating native expression ([[VecDot]]); bit-identical to
    * the HOF formulation [[vec_dot_hof]] but stays in whole-stage codegen. */
  def vec_dot(a: Column, b: Column): Column =
    Shims.column(VecDot(Shims.expression(a), Shims.expression(b)))

  /** Reference HOF formulation of the dot product (interpreted; kept as
    * the differential-testing twin of [[vec_dot]]). */
  def vec_dot_hof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (s, x) => s + x)

  /** Nearest-codeword id of a subvector against a bounded
    * array<struct<cid,cv>> codebook in ONE codegen'd loop ([[PqArgmin]]):
    * replaces the n×M×K join+min_by encode shape — same d2 arithmetic
    * ((sv·sv + cv·cv) − 2·sv·cv, ascending-index dots), first strict
    * minimum in array order. */
  def pq_argmin(sv: Column, cbs: Column): Column =
    Shims.column(PqArgmin(Shims.expression(sv), Shims.expression(cbs)))

  /** Int8 quantization codes (BinaryType, 4× smaller than float32):
    * `clamp(round(x*scale), -127, 127)` per element — see [[VecQuantizeI8]]. */
  def vec_quantize_i8(a: Column, scale: Column): Column =
    Shims.column(VecQuantizeI8(Shims.expression(a), Shims.expression(scale)))

  /** Exact Long dot product of two int8 code vectors ([[VecDotI8]]). */
  def vec_dot_i8(a: Column, b: Column): Column =
    Shims.column(VecDotI8(Shims.expression(a), Shims.expression(b)))

  /** Quantized cosine: with a shared scale the factors cancel, so the
    * ranking needs no dequantization. */
  def cosine_sim_i8(a: Column, b: Column): Column =
    vec_dot_i8(a, b).cast(DoubleType) /
      (sqrt(vec_dot_i8(a, a).cast(DoubleType)) *
       sqrt(vec_dot_i8(b, b).cast(DoubleType)))

  /** 64-bit perceptual average-hash of a binary payload ([[PHash64]]):
    * average-pool into 64 stripes, bit = stripe mean > global mean. */
  def phash64(payload: Column): Column =
    Shims.column(PHash64(Shims.expression(payload)))

  /** Shannon entropy of a binary payload in bits/byte ([[ByteEntropy]]):
    * the content-corruption probe for opaque media columns. */
  def byte_entropy(payload: Column): Column =
    Shims.column(ByteEntropy(Shims.expression(payload)))

  /** Combined k=16 MinHash signature of a gram-hash array
    * ([[MinHashSig]]): all coordinate minima in one compiled loop. */
  def minhash_sig(gramHashes: Column): Column =
    Shims.column(MinHashSig(Shims.expression(gramHashes)))

  /** Order-8 Hilbert-curve index of an (x, y) cell ([[HilbertIndex8]]):
    * the locality-optimal clustering key (adjacent d ⇒ adjacent cell —
    * no Z-order jumps). */
  def hilbert_index8(x: Column, y: Column): Column =
    Shims.column(HilbertIndex8(Shims.expression(x), Shims.expression(y)))

  /** 1-bit sign quantization: 32 sign bits per Long word, 32× smaller
    * than float32 ([[VecSignPack32]]); Hamming over the words is the
    * SRP-LSH angular-distance estimate. */
  def sign_pack32(a: Column): Column =
    Shims.column(VecSignPack32(Shims.expression(a)))

  /** Hamming distance between two packed sign-bit word arrays:
    * sum over words of bit_count(xor). HOF formulation (generic arity);
    * fixed-dim hot paths inline the per-word form to stay in codegen. */
  def hamming_words(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y)).cast(LongType)),
      lit(0L), (s, x) => s + x)

  /** L2 norm. */
  def vec_norm(a: Column): Column = sqrt(vec_dot(a, a))

  /** Cosine similarity in double precision. */
  def cosine_sim(a: Column, b: Column): Column =
    vec_dot(a, b) / (vec_norm(a) * vec_norm(b))

  /** Squared Euclidean distance. */
  def l2_sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => {
      val d = x.cast(DoubleType) - y.cast(DoubleType); d * d
    }), lit(0.0), (s, x) => s + x)
}
