package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.TextQueries
import graft.streaming.StreamingPipelines

/**
 * Round-5 corpus operators: sequence packing, context-window chunking,
 * repetition signals, dedup cluster formation, stream-stream join. Each
 * test checks the distributed implementation against an independent
 * single-threaded Scala recomputation on the collected sf0.001 corpus —
 * a differential oracle with none of the query's own machinery in it.
 */
class CorpusOpsSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark
  private val sf = GraftSpark.sf

  /** (source, doc_id, tokens) of the whole test corpus, driver-side. */
  private lazy val corpus: Seq[(String, Long, Seq[String])] =
    Tables.documents(spark, sf)
      .select(col("source"), col("doc_id"), col("text"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getString(2).trim.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)))
      .toSeq

  test("q_seq_packing matches a sequential next-fit reference") {
    // reference: per source in doc_id order, next-fit at 512 tokens
    val expected = corpus.groupBy(_._1).toSeq.flatMap { case (src, docs) =>
      var pack = 0L; var fill = 513L // sentinel > budget → first doc opens pack 1
      docs.sortBy(_._2).map { case (_, _, toks) =>
        val n = toks.size.toLong
        if (fill + n > 512L) { pack += 1L; fill = n } else fill += n
        (src, pack, n)
      }
    }.groupBy(t => (t._1, t._2))
      .map { case ((src, pack), rows) => (src, pack, rows.size.toLong, rows.map(_._3).sum) }
      .toSet
    val got = TextQueries.queries("q_seq_packing")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got === expected)
  }

  test("q_doc_chunks: stride-48 windows cover every token exactly once per window") {
    val got = TextQueries.queries("q_doc_chunks")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val byDoc = got.groupBy(_._1)
    corpus.foreach { case (_, id, toks) =>
      val n = toks.size
      val starts = 0L.to(math.max(n - 17, 0).toLong, 48L)
      val chunks = byDoc(id).sortBy(_._2)
      assert(chunks.map(_._2) === starts.indices.map(_.toLong),
        s"doc $id chunk indices")
      chunks.zip(starts).foreach { case ((_, _, len, md5got), st) =>
        val slice = toks.slice(st.toInt, st.toInt + 64)
        assert(len === math.min(64L, n - st), s"doc $id start $st length")
        val md5ref = java.security.MessageDigest.getInstance("MD5")
          .digest(slice.mkString(" ").getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        assert(md5got === md5ref, s"doc $id start $st content digest")
      }
    }
  }

  test("q_repetition_signals matches a driver-side recomputation") {
    val perDoc = corpus.filter(_._3.size >= 2).map { case (_, _, toks) =>
      val counts = toks.sliding(2).toSeq.groupBy(identity).map(_._2.size)
      val nb = counts.sum.toDouble
      (toks, counts.max / nb, counts.filter(_ > 1).sum / nb)
    }
    val langOf = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val byLang = corpus.filter(_._3.size >= 2).map { case (_, id, toks) =>
      val counts = toks.sliding(2).toSeq.groupBy(identity).map(_._2.size)
      val nb = counts.sum.toDouble
      (langOf(id), counts.max / nb, counts.filter(_ > 1).sum / nb)
    }.groupBy(_._1)
    val expected = byLang.map { case (lang, rows) =>
      def r4(x: Double) = math.rint(x * 10000) / 10000
      (lang, rows.size.toLong,
        r4(rows.map(_._2).sum / rows.size),
        r4(rows.map(_._3).sum / rows.size),
        r4(rows.map(_._3).max))
    }.toSet
    val got = TextQueries.queries("q_repetition_signals")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toSet
    assert(got === expected)
  }

  test("q_dedup_clusters labels are the connected components of the pair graph") {
    val pairs = TextQueries.queries("q_ngram_jaccard")(spark, sf)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // union-find reference
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val expected = nodes.groupBy(find).map { case (_, ms) =>
      (ms.min, ms.length.toLong, ms.max)
    }.toSet
    val got = TextQueries.queries("q_dedup_clusters")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expected)
    assert(got.forall(c => c._2 >= 2), "clusters come from pairs, so ≥ 2 members")
  }

  test("q_substring_dedup matches a brute-force shared-span scan") {
    val W = 20
    val winMap: Map[Long, Seq[(String, Int)]] = corpus.map { case (_, id, toks) =>
      id -> (if (toks.size >= W)
        (1 to toks.size - W + 1).map(p => (toks.slice(p - 1, p - 1 + W).mkString(" "), p))
      else Seq.empty)
    }.toMap
    val ids = winMap.keys.toSeq.sorted
    val expected = (for {
      i <- ids; j <- ids if i < j
    } yield {
      val bPos = winMap(j).groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
      val matches = for {
        (w, pa) <- winMap(i); pb <- bPos.getOrElse(w, Nil)
      } yield (pa, pb)
      if (matches.isEmpty) None
      else {
        val runLens = matches.groupBy { case (pa, pb) => pa - pb }.values.flatMap { ms =>
          // islands of consecutive pos_a on one diagonal
          ms.map(_._1).sorted.zipWithIndex
            .groupBy { case (p, idx) => p - idx }.values.map(_.size)
        }.toSeq
        Some((i, j, runLens.size.toLong,
          (runLens.max + W - 1).toLong,
          runLens.map(_ + W - 1).map(_.toLong).sum))
      }
    }).flatten.toSet
    val got = TextQueries.queries("q_substring_dedup")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got === expected)
    assert(got.forall(_._4 >= W), "every span is at least one window long")
  }

  test("q_span_scrub matches a brute-force interval-merge reference") {
    val W = 20
    val winMap: Map[Long, Seq[(String, Int)]] = corpus.map { case (_, id, toks) =>
      id -> (if (toks.size >= W)
        (1 to toks.size - W + 1).map(p => (toks.slice(p - 1, p - 1 + W).mkString(" "), p))
      else Seq.empty)
    }.toMap
    val nTok = corpus.map { case (_, id, toks) => id -> toks.size.toLong }.toMap
    val ids = winMap.keys.toSeq.sorted
    // ranges to remove per higher-id doc: maximal diagonal runs → [st, en]
    val ranges = (for {
      i <- ids; j <- ids if i < j
      bPos = winMap(j).groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
      (w, pa) <- winMap(i); pb <- bPos.getOrElse(w, Nil)
    } yield (j, pa - pb, pb)).groupBy { case (j, diag, _) => (j, diag) }
      .toSeq.flatMap { case ((j, _), ms) =>
        ms.map(_._3).sorted.zipWithIndex
          .groupBy { case (p, idx) => p - idx }.values
          .map(run => (j, run.map(_._1).min, run.map(_._1).max + W - 1))
      }.distinct
    val expected = ranges.groupBy(_._1).map { case (doc, rs) =>
      // interval merge
      val sorted = rs.map(r => (r._2, r._3)).sortBy(identity)
      val merged = sorted.foldLeft(List.empty[(Int, Int)]) {
        case (acc @ ((s0, e0) :: rest), (s1, e1)) =>
          if (s1 <= e0) (s0, math.max(e0, e1)) :: rest else (s1, e1) :: acc
        case (Nil, r) => r :: Nil
      }
      val removed = merged.map { case (s0, e0) => (e0 - s0 + 1).toLong }.sum
      (doc, merged.size.toLong, nTok(doc), removed, nTok(doc) - removed)
    }.toSet
    val got = TextQueries.queries("q_span_scrub")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got === expected)
    assert(got.forall(_._5 >= 0), "never remove more tokens than the doc has")
  }

  test("stream-stream join equals its batch twin") {
    val streamed = StreamingPipelines.streamStreamJoin(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ev = Tables.events(spark, sf)
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("cts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("ts").as("pts"))
    val batch = c.join(p, col("cu") === col("pu")
        && col("pts") >= col("cts")
        && col("pts") <= col("cts") + expr("INTERVAL 2 HOURS"))
      .groupBy(col("cu")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("q_lm_score matches a driver-side MLE bigram model") {
    val rows = graft.queries.TextQueries.queries("q_lm_score")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    // driver model: global bigram + left-token counts, then score docs
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0),
        r.getString(1).trim.toLowerCase.split("\\s+").filter(_.nonEmpty)))
    val cg = scala.collection.mutable.Map.empty[(String, String), Long]
    docs.foreach { case (_, tk) =>
      tk.sliding(2).foreach {
        case Array(a, b) => cg((a, b)) = cg.getOrElse((a, b), 0L) + 1
        case _ =>
      }
    }
    val cl = cg.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    rows.foreach { case (docId, nBg, avgLp, ppl) =>
      val tk = docs.find(_._1 == docId).get._2
      val lps = tk.sliding(2).collect {
        case Array(a, b) => math.log(cg((a, b)).toDouble / cl(a))
      }.toSeq
      assert(lps.length.toLong == nBg)
      val want = lps.sum / lps.length
      assert(math.abs(avgLp - want) < 1e-3, s"doc $docId: $avgLp vs $want")
      assert(math.abs(ppl - math.exp(-want)) < math.exp(-want) * 1e-2)
      assert(avgLp <= 1e-9)
    }
  }

  test("q_dedup_incremental verdicts agree with the full pair graph") {
    val inc = TextQueries.queries("q_dedup_incremental")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    val deltaCount = Tables.documents(spark, sf)
      .filter(col("doc_id") % 10 === 0).count()
    assert(inc.length == deltaCount)
    inc.foreach { case (id, st, jac, base) =>
      assert(id % 10 == 0, "only delta docs may appear")
      base.foreach(b => assert(b % 10 != 0, "best match must come from the base"))
      if (st == "dup") assert(jac.exists(_ >= 0.8) && base.nonEmpty)
      else assert(st == "new" && jac.forall(_ < 0.8))
    }
    // completeness: every delta-base pair the FULL pair graph scores at
    // >= 0.8 must surface as a 'dup' verdict for its delta end — the
    // incremental path may never miss a duplicate the batch path finds
    val statusOf = inc.map(t => t._1 -> t._2).toMap
    val crossPairs = TextQueries.jaccardPairs(spark, sf)
      .select("id_a", "id_b").collect()
      .flatMap { r =>
        val (a, b) = (r.getLong(0), r.getLong(1))
        (if (a % 10 == 0 && b % 10 != 0) Seq(a) else Nil) ++
          (if (b % 10 == 0 && a % 10 != 0) Seq(b) else Nil)
      }
    crossPairs.foreach(d =>
      assert(statusOf(d) == "dup", s"delta doc $d missed by incremental dedup"))
  }

  test("q_ppl_contrast: the reference language keeps at a far higher rate") {
    // the operator's point: with the reference LM trained on English,
    // English docs must look in-domain (ppl_ref < ppl_gen) far more often
    // than any other language — measured ~0.78 vs ≤0.10 keep-rate at both
    // gate scales; asserted with margin so corpus regeneration noise
    // can't flake it while a broken model (rates converging) still fails
    val rows = SparkEntry.queries("q_ppl_contrast")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val rate = rows.map { case (l, n, k) => l -> k.toDouble / n }.toMap
    assert(rate.contains("en"), s"missing en row: ${rows.toSeq}")
    rate.filter(_._1 != "en").foreach { case (lang, r) =>
      assert(rate("en") > r + 0.3,
        s"en keep-rate ${rate("en")} not clearly above $lang's $r")
    }
  }

  test("q_bm25_topk matches a driver-side BM25 recomputation") {
    val qTerms = Seq("spark", "join", "vector")
    val docs = corpus.map { case (_, id, toks) => (id, toks) }
    val n = docs.size.toDouble
    val dl = docs.map { case (id, t) => id -> t.size.toLong }.toMap
    val avgdl = dl.values.sum.toDouble / dl.size
    val tf = docs.flatMap { case (id, toks) =>
      toks.filter(qTerms.contains).map(t => (id, t)) }
      .groupBy(identity).map { case ((id, t), xs) => (id, t, xs.size.toLong) }.toSeq
    val df = tf.groupBy(_._2).map { case (t, xs) => t -> xs.size.toLong }
    val expected = tf.groupBy(_._1).map { case (id, rows) =>
      val sE6 = rows.map { case (_, t, f) =>
        val idf = math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5))
        math.round(idf * (f * 2.2)
          / (f + 1.2 * (0.25 + (0.75 * dl(id)) / avgdl)) * 1e6)
      }.sum
      val bm25 = BigDecimal(sE6 / 1e6)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      (id, bm25, rows.size.toLong)
    }.toSeq.sortBy { case (id, s, _) => (-s, id) }.take(20)
    val got = SparkEntry.queries("q_bm25_topk")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(got === expected)
    // the gate must rank something: a corpus where no query term occurs
    // would make this test vacuous
    assert(got.nonEmpty && got.head._2 > 0.0)
  }

  test("q_minhash_recall: banding finds every exact pair on this corpus") {
    val r = SparkEntry.queries("q_minhash_recall")(spark, sf).collect()
    assert(r.length == 1 && r(0).getBoolean(2),
      s"recall contract must hold: ${r.toSeq}")
    // the exact pair graph this corpus carries is non-trivial — an empty
    // ground truth would make the recall gate vacuous
    assert(r(0).getLong(1) > 0, "exact pair set is empty; gate is vacuous")
  }

  test("q_line_dedup matches a driver-side boilerplate recomputation") {
    val raw = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq ++
      graft.queries.TextQueries.plantedLineDocs
    def chunksOf(t: String): Seq[String] =
      t.split(" ", -1).toSeq.grouped(10).map(_.mkString(" ")).toSeq
    val docChunks = raw.map { case (id, t) => (id, chunksOf(t)) }
    val boiler = docChunks
      .flatMap { case (id, cs) =>
        cs.filter(_.split(" ", -1).length == 10).distinct.map(c => (c, id)) }
      .groupBy(_._1)
      .collect { case (c, xs) if xs.map(_._2).distinct.size >= 3 => c }
      .toSet
    val expected = docChunks.map { case (id, cs) =>
      (id, cs.filterNot(boiler).mkString(" "), cs.count(boiler).toLong)
    }.sortBy(_._1)
    val got = SparkEntry.queries("q_line_dedup")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got === expected)
    // planted gate: the 4-doc boilerplate chunk is stripped everywhere,
    // the 2-doc control chunk survives, and the organic corpus itself
    // contributes at least one removed chunk (non-vacuous beyond plants)
    assert(got.filter(x => x._1 >= 9200001L && x._1 <= 9200004L)
      .forall(_._3 == 1L))
    assert(got.filter(_._1 >= 9200011L).forall(_._3 == 0L))
    assert(got.exists(x => x._1 < 9200001L && x._3 > 0L))
  }

  test("q_adamic_adar matches a driver-side wedge recomputation on the union graph") {
    // Rebuild the union graph from the engine's OWN edge relations
    // (corpus pairs = q_ngram_jaccard output; chain edges = the 7
    // consecutive planted-chain pairs, whose path shape q_bfs_distance
    // proves independently), then score every non-edge wedge in plain
    // Scala and compare the full top-20.
    val corpus = TextQueries.queries("q_ngram_jaccard")(spark, sf)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val chain = (0 until 7).map(k => (-108L + k, -107L + k))
    val pairs = (corpus ++ chain).toSet
    val adj = pairs.toSeq.flatMap(p => Seq((p._1, p._2), (p._2, p._1)))
    val deg = adj.groupBy(_._1).map { case (z, xs) => z -> xs.size }
    val byZ = adj.groupBy(_._1)
    val cand = scala.collection.mutable.Map.empty[(Long, Long), (Int, Double)]
    for ((z, xs) <- byZ if deg(z) <= 64; (_, a) <- xs; (_, b) <- xs
         if a < b && !pairs.contains((a, b))) {
      val (cn, sc) = cand.getOrElse((a, b), (0, 0.0))
      cand((a, b)) = (cn + 1, sc + 1.0 / math.log(deg(z).toDouble))
    }
    val expected = cand.toSeq
      .map { case ((a, b), (cn, sc)) =>
        (a, b, cn.toLong, BigDecimal(sc).setScale(4,
          BigDecimal.RoundingMode.HALF_UP).toDouble) }
      .sortBy { case (a, b, _, sc) => (-sc, a, b) }.take(20)
    val got = TextQueries.queries("q_adamic_adar")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == expected.toSeq)
    // the 6 distance-2 chain pairs must all be present with exactly one
    // common neighbor — the planted open-wedge guarantee
    val chainCands = got.filter(_._1 <= -101L)
    assert(chainCands.length >= 6 && chainCands.forall(_._3 == 1L))
  }
}
