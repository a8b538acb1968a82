package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions._

/** Unit tests for the column-function surface (graft.functions). */
class FunctionsSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column): T =
    spark.range(1).select(c.as("v")).head().getAs[T]("v")

  test("tokens: lower-cases, splits on whitespace, drops empties") {
    val got = one[collection.Seq[String]](tokens(lit("  Hello   World\tFoo ")))
    assert(got === Seq("hello", "world", "foo"))
  }

  test("frameSample: only video-kind docs, sampled counts match the container") {
    // doc_ids 1,2,3,4,5: video kind = id % 3 == 2 → ids 2 and 5 only
    val docs = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e"))
      .toDF("doc_id", "text")
    val got = graft.multimodal.MediaDecode.frameSample(spark, docs).collect()
    assert(got.map(_.getLong(0)).toSeq === Seq(2L, 5L))
    // id 2: nf = 22 frames → sampled 0,10,20 = 3; id 5: nf = 25 → 3
    assert(got.map(_.getLong(1)).toSeq === Seq(3L, 3L))
    assert(got.map(_.getLong(2)).toSeq === Seq(20L, 20L))
  }

  test("shingles: 3-gram windows; short docs collapse to one shingle") {
    val toks = array(lit("a"), lit("b"), lit("c"), lit("d"))
    assert(one[collection.Seq[String]](shingles(toks, 3)) === Seq("a b c", "b c d"))
    val short = array(lit("a"), lit("b"))
    assert(one[collection.Seq[String]](shingles(short, 3)) === Seq("a b"))
  }

  test("minhash: identical token sets give identical signatures, k coordinates") {
    val df = Seq("x y z w q", "x y z w q", "totally different text here")
      .toDF("text")
      .select(minhash_signature(shingles(tokens($"text"), 2), 16).as("sig"))
    val sigs = df.collect().map(_.getAs[collection.Seq[Long]]("sig"))
    assert(sigs.forall(_.length === 16))
    assert(sigs(0) === sigs(1))
    assert(sigs(0) !== sigs(2))
  }

  test("lsh bands: equal signatures collide on every band") {
    val df = Seq("p q r s t u", "p q r s t u").toDF("text")
      .select(lsh_bands(minhash_signature(shingles(tokens($"text"), 2), 16), 4, 4).as("b"))
    val bands = df.collect().map(_.getAs[collection.Seq[Long]]("b"))
    assert(bands(0) === bands(1))
    assert(bands(0).length === 4)
  }

  test("simhash: identical texts at distance 0, disjoint texts far apart") {
    val df = Seq("alpha beta gamma delta", "alpha beta gamma delta",
        "omega psi chi phi")
      .toDF("text").select(simhash64(tokens($"text")).as("sig"))
    val s = df.collect().map(_.getLong(0))
    assert(s(0) === s(1))
    assert(java.lang.Long.bitCount(s(0) ^ s(2)) > 10)
  }

  test("hamming64: known distances") {
    assert(one[Long](hamming64(lit(0b111L), lit(0L)).cast("long")) === 3L)
    assert(one[Long](hamming64(lit(-1L), lit(0L)).cast("long")) === 64L)
  }

  test("doc_fingerprint: order-sensitive, deterministic") {
    val ab = one[Long](doc_fingerprint(array(lit("a"), lit("b"))))
    val ab2 = one[Long](doc_fingerprint(array(lit("a"), lit("b"))))
    val ba = one[Long](doc_fingerprint(array(lit("b"), lit("a"))))
    assert(ab === ab2)
    assert(ab !== ba)
  }

  test("stopword_ratio: exact fraction, zero-safe on empty") {
    val r = one[Double](stopword_ratio(
      array(lit("the"), lit("cat"), lit("sat"), lit("on")), Seq("the", "on")))
    assert(math.abs(r - 0.5) < 1e-12)
    val empty = one[Double](stopword_ratio(filter(array(lit("x")), _ => lit(false)), Seq("the")))
    assert(empty === 0.0)
  }

  test("vector math: dot, norm, cosine, l2 on known vectors") {
    val a = array(lit(1.0f), lit(2.0f), lit(2.0f))
    val b = array(lit(2.0f), lit(4.0f), lit(4.0f))
    val c = array(lit(-2.0f), lit(1.0f), lit(0.0f))
    assert(math.abs(one[Double](vec_dot(a, b)) - 18.0) < 1e-9)
    assert(math.abs(one[Double](vec_norm(a)) - 3.0) < 1e-9)
    assert(math.abs(one[Double](cosine_sim(a, b)) - 1.0) < 1e-9)  // parallel
    assert(math.abs(one[Double](vec_dot(a, c))) < 1e-9)           // orthogonal
    assert(math.abs(one[Double](cosine_sim(a, c))) < 1e-9)
    assert(math.abs(one[Double](l2_sq(a, b)) - (1 + 4 + 4)) < 1e-9)
  }

  test("exploded minhash formulation == per-row minhash_signature on documents") {
    val docs = Tables.documents(spark, GraftSpark.sf).limit(100)
      .select($"doc_id", shingles(tokens($"text"), 3).as("sh"))
    val hof = docs.select($"doc_id", minhash_signature($"sh", 16).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getAs[collection.Seq[Long]]("sig").toSeq).toMap
    val exploded = docs.select($"doc_id", explode($"sh").as("g"))
      .groupBy("doc_id")
      .agg(min(xxhash64(lit(0), $"g")).as("h0"),
        (1 until 16).map(j => min(xxhash64(lit(j), $"g")).as(s"h$j")): _*)
      .collect().map(r => r.getLong(0) -> (1 to 16).map(i => r.getLong(i))).toMap
    assert(hof === exploded)
  }

  test("exploded simhash formulation == per-row simhash64 on documents") {
    val docs = Tables.documents(spark, GraftSpark.sf).limit(100)
    val hof = docs.select($"doc_id", simhash64(tokens($"text")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val toks = docs.select($"doc_id", explode(tokens($"text")).as("t"))
      .withColumn("h", xxhash64($"t"))
    val votes = toks.groupBy("doc_id").agg(
      sum(when(shiftright($"h", 0).bitwiseAND(lit(1L)) === 1L, 1L)
        .otherwise(-1L)).as("v0"),
      (1 until 64).map(b =>
        sum(when(shiftright($"h", b).bitwiseAND(lit(1L)) === 1L, 1L)
          .otherwise(-1L)).as(s"v$b")): _*)
    val exploded = votes.select($"doc_id",
      (0 until 64).map(b =>
        when(col(s"v$b") > 0, shiftleft(lit(1L), b)).otherwise(lit(0L)))
        .reduce((a, c) => a.bitwiseOR(c)).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hof === exploded)
  }

  test("vec_dot native codegen == HOF formulation, bit-identical on embeddings") {
    val emb = Tables.embeddings(spark, GraftSpark.sf)
    val q = emb.filter($"vec_id" === 0).select($"embedding".as("qv"))
    val diffs = emb.crossJoin(q)
      .select(vec_dot($"embedding", $"qv").as("native"),
        vec_dot_hof($"embedding", $"qv").as("hof"))
      .filter($"native" =!= $"hof")
      .count()
    assert(diffs === 0L)
  }

  test("sign_pack32: known sign patterns pack to the expected words") {
    // 5 elements, one word: positives at 0 and 3 -> 0b1001; exact 0.0 is
    // NOT positive (the sign boundary both engines share)
    val w1 = one[collection.Seq[Long]](sign_pack32(
      array(lit(1.0f), lit(-1.0f), lit(0.0f), lit(2.0f), lit(-3.0f))))
    assert(w1 === Seq(9L))
    // 33 elements -> two words; position 32 lands at bit 0 of word 1
    val cols33 = (0 until 33).map(i => lit(if (i == 2 || i == 32) 1.0f else -1.0f))
    val w2 = one[collection.Seq[Long]](sign_pack32(array(cols33: _*)))
    assert(w2 === Seq(4L, 1L))
  }

  test("sign_pack32 hamming == per-position sign-disagreement count on embeddings") {
    val emb = Tables.embeddings(spark, GraftSpark.sf)
    val q = emb.filter($"vec_id" === 0).select($"embedding".as("qv"))
    val bad = emb.crossJoin(q)
      .select(
        hamming_words(sign_pack32($"embedding"), sign_pack32($"qv")).as("packed"),
        size(filter(zip_with($"embedding", $"qv",
          (x, y) => (x > 0.0f) =!= (y > 0.0f)), b => b)).cast("long").as("direct"))
      .filter($"packed" =!= $"direct").count()
    assert(bad === 0L)
  }

  test("sign_pack32 null semantics: null array -> null") {
    val r = spark.range(1)
      .select(sign_pack32(lit(null).cast("array<float>")).as("v")).head()
    assert(r.isNullAt(0))
  }

  test("vec_dot null semantics: mismatched lengths and null arrays -> null") {
    val r = spark.range(1).select(
      vec_dot(array(lit(1.0f), lit(2.0f)), array(lit(1.0f))).as("mismatch"),
      vec_dot(lit(null).cast("array<float>"), array(lit(1.0f))).as("nullarr"))
      .head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("token_count matches manual count on documents") {
    val bad = Tables.documents(spark, GraftSpark.sf)
      .select(token_count($"text").as("n"),
        size(filter(split(lower($"text"), "\\s+"), t => length(t) > 0)).as("m"))
      .filter($"n" =!= $"m").count()
    assert(bad === 0L)
  }

  test("tokens (codegen trim-split) == tokens_hof (filter HOF) on every doc") {
    val bad = Tables.documents(spark, GraftSpark.sf)
      .select(tokens($"text").as("a"), tokens_hof($"text").as("b"))
      .filter(not($"a" <=> $"b")).count()
    assert(bad === 0L)
    // edge cases the corpus may not contain — incl. tab/newline edges,
    // where ASCII-only trim() would leave a spurious empty token
    val edge = Seq("", "   ", " one  two ", "x",
        "\tTabbed lead", "trailing newline\n", "\n\t mixed \t\n",
        "inner\ttab and\nnewline", "\t\n", "a b",
        "\u000Bvertical tab\u000B", "\fform feed\r", "\r\n windows \r\n").toDF("text")
      .select(tokens($"text").as("a"), tokens_hof($"text").as("b"))
      .filter(not($"a" <=> $"b")).count()
    assert(edge === 0L)
  }

  test("int8 quantization: codes 4x smaller, dot exact, recall@10 >= 8") {
    val emb = Tables.embeddings(spark, GraftSpark.sf)
    // size: 64-dim float32 list vs 64-byte code
    val row = emb.select(vec_quantize_i8($"embedding", lit(200.0)).as("c"),
      size($"embedding").as("d")).head()
    assert(row.getAs[Array[Byte]]("c").length === row.getInt(1))

    // vec_dot_i8 == manual byte-product sum on one pair
    val pair = emb.limit(2)
      .select(vec_quantize_i8($"embedding", lit(200.0)).as("c")).collect()
    val (x, y) = (pair(0).getAs[Array[Byte]]("c"), pair(1).getAs[Array[Byte]]("c"))
    val manual = x.zip(y).map { case (a, b) => a.toLong * b.toLong }.sum
    val viaExpr = emb.limit(2)
      .agg(collect_list(vec_quantize_i8($"embedding", lit(200.0))).as("cs"))
      .select(vec_dot_i8(element_at($"cs", 1), element_at($"cs", 2)))
      .head().getLong(0)
    assert(viaExpr === manual)

    // quantized top-10 must recover >= 8 of the exact top-10
    val exact = graft.queries.VectorQueries.queries("q_knn_brute")(spark, GraftSpark.sf)
      .select("vec_id").as[Long].collect().toSet
    val quant = graft.queries.VectorQueries.quantizedTop10(spark, GraftSpark.sf)
      .select("vec_id").as[Long].collect().toSet
    assert((exact & quant).size >= 8,
      s"recall@10 too low: exact=$exact quantized=$quant")
  }

  test("lsh knn: multi-table hyperplane buckets recover >= 7 of exact top-10") {
    val exact = graft.queries.VectorQueries.queries("q_knn_brute")(spark, GraftSpark.sf)
      .select("vec_id").as[Long].collect().toSet
    val lsh = graft.queries.VectorQueries.lshTop10(spark, GraftSpark.sf)
      .select("vec_id").as[Long].collect().toSet
    assert((exact & lsh).size >= 7,
      s"LSH recall@10 too low: exact=$exact lsh=$lsh")
  }

  test("stratified sample: deterministic under fixed seed, rates within tolerance") {
    val run = () => graft.queries.TextQueries.queries("q_stratified_sample")(
      spark, GraftSpark.sf).collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val a = run()
    assert(a === run(), "same seed + layout must resample identically")
    a.foreach { case (et, sampled, total) =>
      val frac = Map("click" -> 0.1, "view" -> 0.05, "purchase" -> 1.0,
        "signup" -> 1.0, "error" -> 0.5)(et)
      val expected = frac * total
      // Bernoulli: allow 5 sigma around the mean (exact for frac=1.0)
      val tol = 5 * math.sqrt(total * frac * (1 - frac)) + 1e-9
      assert(math.abs(sampled - expected) <= tol,
        s"$et: sampled $sampled vs expected $expected ± $tol")
    }
  }

  test("observe: pipeline metrics piggyback on the job (no second pass)") {
    // production corpus builds track rows-kept/rows-dropped without
    // re-scanning; Observation collects named aggregates as the job runs
    val obs = new org.apache.spark.sql.Observation("quality_gate")
    val docs = Tables.documents(spark, GraftSpark.sf)
    val kept = docs
      .observe(obs, count(lit(1)).as("n_in"),
        sum(when(length($"text") >= 100, 1L).otherwise(0L)).as("n_long"))
      .filter(length($"text") >= 100)
      .count()
    val m = obs.get
    assert(m("n_in") === docs.count())
    assert(m("n_long") === kept)
  }

  test("inverted-index jaccard == independent brute force on a random corpus") {
    // differential check of the core dedup machinery: the engine's
    // postings-join formulation (gramHashPostings + verifyJaccard) vs a
    // from-scratch driver-side reimplementation of the same gram
    // definition (lowercased whitespace tokens, 3-gram shingles,
    // whole-doc gram under 3 tokens) on a seeded random corpus with
    // heavy term reuse (so real overlaps occur)
    val rnd = new scala.util.Random(42)
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    val docs = (0L until 100L).map { i =>
      val n = 1 + rnd.nextInt(10)
      (i, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    def grams(text: String): Set[Seq[String]] = {
      val tk = text.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      if (tk.size < 3) Set(tk) else tk.sliding(3).map(_.toSeq).toSet
    }
    val expected = (for {
      (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
      ga = grams(ta); gb = grams(tb)
      j = ga.intersect(gb).size.toDouble / ga.union(gb).size.toDouble
    } yield ((ia, ib),
      BigDecimal(j).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)).toMap

    val df = docs.toDF("doc_id", "text")
    val postings = graft.queries.TextQueries.gramHashPostings(df).distinct()
    val ids = docs.map(_._1)
    val cand = (for { a <- ids; b <- ids if a < b } yield (a, b))
      .toDF("id_a", "id_b")
    val got = graft.queries.TextQueries.verifyJaccard(cand, postings)
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => ((a, b), j) }.toMap
    assert(got.size === expected.size)
    val bad = expected.collect { case (k, v) if got(k) != v => (k, v, got(k)) }
    assert(bad.isEmpty, s"jaccard mismatches: ${bad.take(5)}")
  }

  test("minhash_sig: pure set function, codegen == driver compute, discriminates") {
    import graft.functions.MinHashSig
    val grams = Seq(11L, 42L, 7L, 999L, -3L)
    def sigOf(xs: Seq[Long]): Long = {
      val df = Seq(Tuple1(xs.toArray)).toDF("g")
      df.select(minhash_sig(col("g")).as("s")).head().getLong(0)
    }
    val s0 = sigOf(grams)
    // set semantics: order and multiplicity are invisible
    assert(sigOf(grams.reverse) === s0)
    assert(sigOf(grams ++ grams) === s0)
    // a different set almost surely differs
    assert(sigOf(grams :+ 123456L) !== s0)
    assert(sigOf(grams.tail) !== s0)
    // driver compute (interpreted path) agrees with the plan (codegen)
    val ad = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(grams.toArray)
    assert(MinHashSig.compute(ad) === s0)
    // minima are true coordinate minima (independent recompute)
    val viaCoord = {
      val mins = (0 until MinHashSig.K).map(j => grams.map(g => MinHashSig.coord(g, j)).min)
      // fold as compute does: can't re-derive privately, so just pin
      // that a singleton's signature changes when the element changes
      mins
    }
    assert(viaCoord.distinct.size > 1)
    assert(sigOf(Seq(1L)) !== sigOf(Seq(2L)))
  }

  test("minhash_sig token mode == gram-hash mode over xxhash64 3-gram chain") {
    // token mode fuses gram hashing (the exact xxhash64(t0,t1,t2) chain)
    // into the compiled loop; it must agree with hashing done by the SQL
    // xxhash64 on every corpus document, including <3-token edge cases
    val docs = Tables.documents(spark, GraftSpark.sf).select("doc_id", "text")
      .unionAll(Seq((1L, "one two"), (2L, "single"), (3L, ""), (4L, "a b c"))
        .toDF("doc_id", "text"))
    val tk = tokens(col("text"))
    val n = size(tk)
    val grams = when(n >= 3,
      transform(sequence(lit(1), n - 2), i =>
        xxhash64(element_at(tk, i), element_at(tk, i + 1), element_at(tk, i + 2))))
      .otherwise(array(xxhash64(array_join(tk, " "))))
    val both = docs.select(col("doc_id"),
      minhash_sig(tk).as("sig_tok"), minhash_sig(grams).as("sig_gram"))
      .filter(col("sig_tok") =!= col("sig_gram"))
    assert(both.count() === 0, "token-mode signature diverged from gram-hash mode")
  }

  test("phash64 / byte_entropy / minhash_sig are registered SQL functions") {
    val r = spark.sql(
      """SELECT phash64(cast('aaaabbbb' AS BINARY)) AS ph,
        |  byte_entropy(cast('aabb' AS BINARY)) AS be,
        |  minhash_sig(array('a', 'b', 'c', 'd')) AS ms_tok,
        |  minhash_sig(array(CAST(1 AS BIGINT), CAST(2 AS BIGINT))) AS ms_gram
        |""".stripMargin).head()
    assert(r.getLong(0) ===
      graft.functions.PHash64.compute("aaaabbbb".getBytes("UTF-8")))
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
    val viaCol = Seq("a b c d").toDF("text")
      .select(minhash_sig(tokens(col("text")))).head().getLong(0)
    assert(r.getLong(2) === viaCol, "SQL token-mode sig != Column API sig")
    val viaGram = Seq(Tuple1(Array(1L, 2L))).toDF("g")
      .select(minhash_sig(col("g"))).head().getLong(0)
    assert(r.getLong(3) === viaGram)
  }

  test("sign_pack32 / hilbert_index8 / cuckoo_agg+contains are registered SQL functions") {
    val r = spark.sql(
      """SELECT sign_pack32(array(CAST(1.0 AS FLOAT), CAST(-1.0 AS FLOAT))) AS sp,
        |  hilbert_index8(CAST(3 AS BIGINT), CAST(5 AS BIGINT)) AS hi
        |""".stripMargin).head()
    assert(r.getAs[collection.Seq[Long]]("sp") === Seq(1L))
    val viaCol = spark.range(1)
      .select(hilbert_index8(lit(3L), lit(5L)).as("h")).head().getLong(0)
    assert(r.getAs[Long]("hi") === viaCol)
    val cu = spark.sql(
      """WITH t AS (SELECT CAST(id AS BIGINT) AS k FROM range(100)),
        |sk AS (SELECT cuckoo_agg(k, 256) AS s FROM t)
        |SELECT sum(CAST(NOT cuckoo_contains(s, k) AS INT)) AS misses
        |FROM t CROSS JOIN sk""".stripMargin).head()
    assert(cu.getLong(0) === 0L, "SQL-built cuckoo filter lost a member")
  }
}
