package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{byte_entropy, cosine_sim, hamming64, minhash_signature,
  phash64, shingles, sign_pack32, tokens}

/**
 * Multimodal-column plumbing (SURVEY.md §2j): opaque `binary` payloads +
 * typed metadata, with decode/feature-extract as a per-partition batch
 * stage. As of round 9 the decode path runs REAL JDK codecs
 * ([[graft.multimodal.MediaDecode]]: javax.imageio PNG,
 * javax.sound.sampled WAV, a framed-PNG video container); the
 * Spark-side plumbing — binary column, schema, partition-batched typed
 * transform, post-decode analytics — was real from round 1.
 */
object MultimodalQueries {

  type Q = (SparkSession, String) => DataFrame

  /**
   * Planted payload texts for the perceptual-dedup gate (the planted-
   * batch policy of q_dedup_canonical): the corpus payloads hash to
   * effectively random 64-bit aHashes, so no hamming ≤ 3 pair exists to
   * find — a dedup gate that can never fire. The plant: a high-contrast
   * striped payload, a 1-byte perturbation of it (stripe means barely
   * move → same aHash: a perceptual duplicate that is NOT a byte
   * duplicate — exactly what perceptual hashing exists to catch), and
   * its inverted stripes (hamming 64: the negative control proving the
   * threshold rejects).
   */
  private val phBase = ("a" * 10 + "z" * 10) * 32
  private[graft] val phPlanted: Seq[(Long, String)] = Seq(
    (9200001L, phBase),
    (9200002L, phBase.updated(305, 'c')),
    (9200003L, ("z" * 10 + "a" * 10) * 32))

  val queries: Map[String, Q] = Map(

    // --- perceptual-hash media dedup (VERDICT r8 #4): aHash every
    // payload with the codegen'd [[graft.functions.PHash64]], collapse
    // EXACT-hash classes, then block candidate pairs on 4 × 16-bit hash
    // bands over the class REPRESENTATIVES (pigeonhole: a pair within
    // hamming ≤ 3 differs in ≤ 3 bands, so it MUST share one of 4 —
    // blocking is complete by construction, and the bounded witness
    // audit proves it empirically, the q_simhash_neardup design), then
    // verify rep candidates with the exact hamming distance.
    //
    // WIDTH IS PINNED, the CLASS COLLAPSE is the scale dial (round 14,
    // VERDICT r13 #5): 4 × 16 bits is the ≤3-errors partition — fewer
    // bands loses the hamming-≤3 completeness guarantee, and narrower
    // bands (8 × 8-bit keeps the guarantee) shrink the key space to 256
    // buckets/band, i.e. makes occupancy WORSE. What actually exploded
    // at 100× was not band entropy but EXACT-hash duplication: 500k
    // media collapse to 20.9k distinct aHashes (replicated boilerplate
    // — aHash is insensitive to the per-copy token tags), so media-level
    // banding read 14876 buckets over cap (max occ 3264) and the
    // planted pair survived only by id-order luck. Deduping the hash
    // BEFORE banding — the production exact-dedup-first rule — makes
    // band occupancy a function of DISTINCT hashes (duplication-
    // invariant): measured at 100×, rep-level overflow is 4 buckets
    // (max occ 146) and the planted pair survives ALL FOUR shared
    // bands organically (occ 5/56/92/38). Same-class pairs are exact
    // perceptual duplicates (hamming 0) and enumerate through the same
    // capped enumerator keyed on the hash itself, so a mega dup-class
    // stays ≤ cap²/2 pairs with the loss counted, never silent.
    // Output = data-derived media count + guarantee flags (hashes
    // aren't SQL-expressible; the planted-pair flag makes the gate
    // bite). Gate scale: classes are singletons, so rep-banding ≡ the
    // r8 media-banding — flags, oracle, and hashes unchanged.
    "q_phash_dedup" -> ((s, d) => {
      import s.implicits._
      val media = Tables.documents(s, d)
        .select(col("doc_id").as("media_id"), col("text").as("txt"))
        .unionAll(phPlanted.toDF("media_id", "txt"))
        .select(col("media_id"), phash64(encode(col("txt"), "UTF-8")).as("ph"))
        .localCheckpoint() // one hash pass, fanned out to class + audit
      // ONE class-stats pass (rep + occupancy per distinct hash) feeds
      // everything the class route needs; a bounded 1-row collect on its
      // max occupancy picks the route (VERDICT r14 #3 — the singleton
      // fast path). maxCls = 1 ⟹ the class collapse is an identity:
      // reps ≡ media (a projection, no shuffle), hamming-0 pairs can't
      // exist, and the rep-resolution joins are skipped — provably
      // identical behavior, which is why one bounded agg may decide.
      // NOTE the path is DORMANT on every shipped corpus: the planted
      // perceptual-dup pair is hamming-0 by construction (measured —
      // the 1-byte stripe perturbation lands on the same aHash), so
      // maxCls ≥ 2 everywhere. The measured full-route saving instead
      // comes from the dup-mass prefilter below: class-pair enumeration
      // runs ONLY over classes that actually hold duplicates (cocc ≥ 2
      // — 1 class at sf0.1, 20.9k at 100×), never the whole corpus;
      // singleton classes yield no pairs and can never overflow, so the
      // filter is output-exact at every scale.
      val clsStats = media.groupBy("ph")
        .agg(min("media_id").as("rep_id"), count(lit(1)).as("cocc"))
        .localCheckpoint() // consumed by bands, verify joins, and audit
      val singleton = clsStats.agg(max("cocc")).head.getLong(0) == 1L
      // exact-hash classes: capped hamming-0 pair enumeration + min-id
      // representative per distinct hash (skipped when provably empty)
      val (classPairs, classOv) =
        if (singleton)
          (media.select(col("media_id").as("id_a"),
              col("media_id").as("id_b")).limit(0),
            s.range(1).select(lit(0L).as("overflow_buckets")))
        else Blocking.cappedBucketPairs(
          media.join(broadcast(
              clsStats.filter(col("cocc") >= 2).select("ph")), "ph")
            .select(col("ph"), col("media_id")),
          Seq("ph"), "media_id", Blocking.BandCap)
      val reps =
        if (singleton) media.select(col("ph"), col("media_id").as("rep_id"))
        else clsStats.select("ph", "rep_id")
      val bands = reps.select(col("rep_id"),
        posexplode(array((0 until 4).map(b =>
          shiftright(col("ph"), b * 16).bitwiseAND(lit(0xFFFFL))): _*))
          .as(Seq("band", "bkey")))
      // capped enumeration (Blocking.BandCap): bounded per-bucket work
      // under adversarial skew, overflow accounting in the output row
      val (repCand, repOv) = Blocking.cappedBucketPairs(
        bands, Seq("band", "bkey"), "rep_id", Blocking.BandCap)
      val pa = reps.select(col("rep_id").as("id_a"), col("ph").as("ph_a"))
      val pb = reps.select(col("rep_id").as("id_b"), col("ph").as("ph_b"))
      val repPairs = repCand.join(pa, "id_a").join(pb, "id_b")
        .select(col("id_a"), col("id_b"),
          hamming64(col("ph_a"), col("ph_b")).as("hd"))
        .filter(col("hd") <= 3)
      // the dedup verdict: cross-class near-dup rep pairs ∪ same-class
      // exact pairs (disjoint by construction: two reps never share a
      // hash). A member pair (a,b) of different classes is covered by
      // (rep(a), rep(b)) — class membership carries it, the standard
      // representative semantics of exact-dedup-then-near-dup.
      val pairs = repPairs.select("id_a", "id_b").unionAll(classPairs)
      // bounded witness audit (q_simhash_neardup design), CAP-AWARE at
      // BOTH levels: all-pairs over a deterministic ≤ ~1400-row sample;
      // a sampled hamming-≤3 pair must be REACHABLE through the shipped
      // structure — same class (both members kept by an under-cap
      // class) → classPairs, or distinct classes whose reps share at
      // least one UNDER-CAP rep-band bucket → repPairs. An under-cap
      // bucket/class keeps ALL its members, so the pigeonhole argument
      // survives the caps intact; a pair whose every route overflowed
      // is exactly the surfaced-recall-loss case overflow_buckets
      // accounts for. Constant cost at any corpus size.
      val occ = bands.groupBy("band", "bkey").agg(count(lit(1)).as("occ"))
      val step = media.agg(
        greatest(lit(1L), floor(count(lit(1)) / 1400.0).cast("long")).as("step"))
      val sampled = media.crossJoin(broadcast(step))
        .filter(pmod(col("media_id"), col("step")) === 0)
      // singleton route: every media is its own rep — no resolution join
      val sub =
        if (singleton) sampled
          .select(col("media_id"), col("ph"), col("media_id").as("rep_id"))
        else sampled.join(reps, "ph")
          .select(col("media_id"), col("ph"), col("rep_id"))
      val sampledPairs = sub.toDF("id_a", "ph_a", "rep_a")
        .crossJoin(sub.toDF("id_b", "ph_b", "rep_b"))
        .filter(col("id_a") < col("id_b"))
        .filter(hamming64(col("ph_a"), col("ph_b")) <= 3)
        .localCheckpoint() // two audit routes read the sampled set
      // singleton route: ph_a === ph_b with id_a < id_b would need two
      // distinct media sharing a hash — provably empty when maxCls = 1
      val refSameClass =
        if (singleton) sampledPairs.select("id_a", "id_b").limit(0)
        else sampledPairs.filter(col("ph_a") === col("ph_b"))
          .join(clsStats.select(col("ph").as("ph_a"), col("cocc")), "ph_a")
          .filter(col("cocc") <= Blocking.BandCap)
          .select("id_a", "id_b").distinct()
      val refCrossClass = sampledPairs.filter(col("ph_a") =!= col("ph_b"))
        .select(
          least(col("rep_a"), col("rep_b")).as("id_a"),
          greatest(col("rep_a"), col("rep_b")).as("id_b"),
          col("ph_a"), col("ph_b"))
        .select(col("id_a"), col("id_b"),
          posexplode(array((0 until 4).map(b => struct(
            shiftright(col("ph_a"), b * 16).bitwiseAND(lit(0xFFFFL)).as("ka"),
            shiftright(col("ph_b"), b * 16).bitwiseAND(lit(0xFFFFL)).as("kb"))): _*))
            .as(Seq("band", "kk")))
        .filter(col("kk.ka") === col("kk.kb"))
        .select(col("id_a"), col("id_b"), col("band"), col("kk.ka").as("bkey"))
        .join(occ, Seq("band", "bkey"))
        .filter(col("occ") <= Blocking.BandCap)
        .select("id_a", "id_b").distinct()
      val nMissing = refSameClass.unionAll(refCrossClass)
        .join(pairs, Seq("id_a", "id_b"), "left_anti")
        .agg(count(lit(1)).as("n_missing"))
      // planted-pair membership through REP RESOLUTION, not raw ids
      // (ADVICE r14): filtering `pairs` for (9200001, 9200002) silently
      // assumed each plant is its class's min-id — if a lower-id organic
      // doc ever shared a planted hash, the emitted pair would carry the
      // organic rep id and the flag would flip false despite correct
      // dedup. The representative semantics the dedup itself uses (lines
      // above): a member pair is found iff both land in the SAME exact
      // class (class membership carries it) or their two classes' reps
      // are linked by a hamming-≤3 rep pair.
      val plantMembers = media.filter(col("media_id").isin(9200001L, 9200002L))
      val plantReps = (if (singleton)
          plantMembers.withColumn("rep_id", col("media_id"))
        else plantMembers.join(reps, "ph"))
        .agg(
          max(when(col("media_id") === 9200001L, col("rep_id"))).as("r1"),
          max(when(col("media_id") === 9200002L, col("rep_id"))).as("r2"))
        .select(col("r1"), col("r2"),
          least(col("r1"), col("r2")).as("id_a"),
          greatest(col("r1"), col("r2")).as("id_b"))
        .localCheckpoint() // 1 row, read by two consumers below
      val plantedLinked = repPairs
        .join(broadcast(plantReps.select("id_a", "id_b")), Seq("id_a", "id_b"))
        .agg((count(lit(1)) >= 1).as("rep_linked"))
      // EMISSION witness, not structural inference (ADVICE r15): the
      // plants are hamming-0, so a bare same-class predicate is true on
      // every shipped corpus and would stay true through a broken
      // classPairs/cappedBucketPairs wiring. Instead require the pair
      // to appear in the EMITTED structure itself: the raw member pair
      // in classPairs (the same-class route enumerates member ids, so
      // raw-id membership is robust even if a lower-id organic doc
      // joins the class), or the rep-resolved pair in repPairs (the
      // cross-class route). An over-cap class correctly reads false
      // here — that is the surfaced-recall-loss case overflow_buckets
      // accounts for, and the honest answer.
      val plantedClassEmit = classPairs
        .filter(col("id_a") === 9200001L && col("id_b") === 9200002L)
        .agg((count(lit(1)) >= 1).as("class_emitted"))
      val plantedFound = plantedClassEmit
        .crossJoin(plantedLinked)
        .select((col("class_emitted") || col("rep_linked"))
          .as("planted_pair_found"))
      val negRejected = media.filter(col("media_id").isin(9200001L, 9200003L))
        .agg((bit_count(min("ph").bitwiseXOR(max("ph"))) > 3).as("neg_rejected"))
      media.agg(count(lit(1)).as("n_media"))
        .crossJoin(nMissing)
        .crossJoin(plantedFound).crossJoin(negRejected)
        .crossJoin(broadcast(repOv))
        .crossJoin(broadcast(classOv.select(col("overflow_buckets").as("ov_cls"))))
        .select(lit("ahash").as("method"), lit(3).as("max_hamming"),
          col("n_media"),
          (col("n_missing") === 0).as("blocking_complete"),
          col("planted_pair_found"), col("neg_rejected"),
          // one accounting column, both capped levels: overflowing
          // rep-band buckets + overflowing exact-dup classes
          (col("overflow_buckets") + col("ov_cls")).as("overflow_buckets"))
    }),

    // --- cross-modal dedup fusion (VERDICT r9 #6): ONE verdict per
    // candidate pair from THREE independent evidence channels the
    // engine already computes — minhash-banded text Jaccard, sign-
    // blocked embedding cosine, band-blocked perceptual payload hash —
    // majority rule (≥ 2 of 3 votes). Every channel generates
    // candidates BLOCKED (band / sign-bucket / hash-band equi-joins
    // that grow with occupied keys, never all-pairs), exactly the three
    // production pipelines' shapes. The multimodal corpus is the
    // (documents ⋈ embeddings) id intersection with payload =
    // utf-8(text); plants: two full duplicates (all three channels must
    // vote) and a single-channel negative control (identical embedding,
    // alien text/payload — exactly 1 vote, must be REJECTED, which is
    // the point of fusion: one noisy channel cannot delete a document).
    // Output = guarantee-flag row (channel hashes aren't SQL-
    // expressible; the planted votes and rejection are).
    "q_multimodal_dedup" -> ((s, d) => {
      import s.implicits._
      val textA = "planted multimodal duplicate item sharing text embedding " +
        "and payload evidence across all three fusion channels"
      val textB = "alien negative control content with zero gram overlap " +
        "entirely unrelated words everywhere bananas umbrellas xylophones"
      val v1 = Tables.embeddings(s, d).filter(col("vec_id") === 1)
        .select(col("embedding").as("pe"))
      val plants = Seq((9300001L, textA), (9300002L, textA), (9300003L, textB))
        .toDF("id", "text")
        .crossJoin(broadcast(v1))
        .select(col("id"), col("text"), col("pe").as("embedding"))
      val items = Tables.documents(s, d).select(col("doc_id").as("id"), col("text"))
        .join(Tables.embeddings(s, d).select(col("vec_id").as("id"), col("embedding")),
          "id")
        .unionByName(plants)
        .withColumn("payload", encode(col("text"), "UTF-8"))
        .localCheckpoint() // three channel consumers, one materialization

      // The three fusion channels are INDEPENDENT until the vote union,
      // but each one materializes eagerly (capped-blocking checkpoints),
      // so built sequentially the query pays ~50 driver-latency-bound
      // jobs back to back while 32 cores idle (measured round 16:
      // taskTime 5.9 s vs 5.1 s wall — driver-bound, not compute-bound).
      // Build them on futures so their jobs overlap (the guide's
      // overlap-independent-jobs rule); each future returns its
      // channel's evidence + overflow DataFrames, all checkpointed
      // exactly as before — same relations, same results, jobs
      // interleaved instead of serialized.
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration.Duration

      // channel 1: text — minhash banding (4 bands × 4 coords) →
      // exact-Jaccard verify on the bounded candidates (gram arrays
      // joined back by id, not carried through the bucket shuffle)
      // capped enumeration per channel (Blocking.BandCap): bounded
      // per-bucket work under adversarial skew; the three channels'
      // overflow counts sum into one accounting column on the flag row
      def bucketPairs(buckets: DataFrame, key: Seq[String]): (DataFrame, DataFrame) =
        Blocking.cappedBucketPairs(buckets, key, "id", Blocking.BandCap)
      val fText = Future { scala.concurrent.blocking {
        val grams = items.select(col("id"),
            array_distinct(shingles(tokens(col("text")), 3)).as("g"))
          .withColumn("sig", minhash_signature(col("g"), 16))
          .localCheckpoint()
        val tbuckets = grams.select(col("id"), posexplode(array((0 until 4).map(b =>
            hash(slice(col("sig"), b * 4 + 1, 4), lit(b))): _*)).as(Seq("band", "bkey")))
        val ga = grams.select(col("id").as("id_a"), col("g").as("ga"))
        val gb = grams.select(col("id").as("id_b"), col("g").as("gb"))
        val (textCand, textOv) = bucketPairs(tbuckets, Seq("band", "bkey"))
        val textEv = textCand
          .join(ga, "id_a").join(gb, "id_b")
          .filter(size(array_intersect(col("ga"), col("gb"))) * lit(1.0) >=
            lit(0.8) * size(array_union(col("ga"), col("gb"))))
          .select(col("id_a"), col("id_b"), lit("text").as("channel"))
        (textEv, textOv)
      } }

      // channel 2: embedding — block on the full packed sign pattern
      // (the cos≈1 near-dup regime; the general-θ dial is the L×P
      // hyperplane machinery of q_embed_neardup), verify exact cosine
      val fEmbed = Future { scala.concurrent.blocking {
        val signs = items.select(col("id"), sign_pack32(col("embedding")).as("sg"))
        val ea = items.select(col("id").as("id_a"), col("embedding").as("emb_a"))
        val eb = items.select(col("id").as("id_b"), col("embedding").as("emb_b"))
        val (embedCand, embedOv) = bucketPairs(
          signs.select(col("id"), col("sg")), Seq("sg"))
        val embedEv = embedCand
          .join(ea, "id_a").join(eb, "id_b")
          .filter(cosine_sim(col("emb_a"), col("emb_b")) >= 0.9)
          .select(col("id_a"), col("id_b"), lit("embed").as("channel"))
        (embedEv, embedOv)
      } }

      // channel 3: payload — the q_phash_dedup aHash band blocking,
      // with the SAME exact-dedup-first rule (round 15; the r14
      // q_phash_dedup lesson applied to this site after the regenerated
      // 10× corpus tripped it): aHash is insensitive to the per-copy
      // token tags, so replicated boilerplate multiplies raw-member band
      // occupancy past the cap (3 overflowing buckets at 10×) while the
      // DISTINCT-hash occupancy stays scale-stable. Collapse hamming-0
      // classes first (capped pair enumeration = the same-class
      // evidence), band the REPRESENTATIVES, verify rep pairs with the
      // exact hamming distance, and expand cross-class rep links back to
      // member pairs through the cap-bounded class membership (≤ cap
      // lowest-id members per class — the over-cap classes are exactly
      // the ones classOv already counts, so the expansion adds no silent
      // loss).
      val fPhash = Future { scala.concurrent.blocking {
      val phs = items.select(col("id"), phash64(col("payload")).as("ph"))
        .localCheckpoint()
      // dup-mass prefilter (the q_phash_dedup rule): class-pair
      // enumeration and the member-rank window run only over classes
      // that actually hold duplicates — singleton classes yield no
      // pairs, never overflow, and their sole member IS their rep
      val clsStatsP = phs.groupBy("ph")
        .agg(min("id").as("rep_id"), count(lit(1)).as("cocc"))
        .localCheckpoint() // banding + verify joins + member expansion
      val dupPhsP = broadcast(clsStatsP.filter(col("cocc") >= 2).select("ph"))
      val (classEvP, classOvP) = Blocking.cappedBucketPairs(
        phs.join(dupPhsP, "ph").select(col("ph"), col("id")),
        Seq("ph"), "id", Blocking.BandCap)
      val repsP = clsStatsP.select("ph", "rep_id")
      val pbuckets = repsP.select(col("rep_id"),
        posexplode(array((0 until 4).map(b =>
          shiftright(col("ph"), b * 16).bitwiseAND(lit(0xFFFFL))): _*))
          .as(Seq("band", "bkey")))
      val (phashCand, phashOv) = Blocking.cappedBucketPairs(
        pbuckets, Seq("band", "bkey"), "rep_id", Blocking.BandCap)
      val rpa = repsP.select(col("rep_id").as("id_a"), col("ph").as("ph_a"))
      val rpb = repsP.select(col("rep_id").as("id_b"), col("ph").as("ph_b"))
      val repLinksP = phashCand
        .join(rpa, "id_a").join(rpb, "id_b")
        .filter(hamming64(col("ph_a"), col("ph_b")) <= 3)
        .select(col("id_a").as("rep_a"), col("id_b").as("rep_b"))
      // cap-bounded class membership for the member expansion: dup
      // classes rank through the window; singleton members are their
      // own reps straight off the stats relation (no window, no join)
      val memRk = org.apache.spark.sql.expressions.Window
        .partitionBy("ph").orderBy("id")
      val membersP = phs.join(dupPhsP, "ph")
        .withColumn("rk", row_number().over(memRk))
        .filter(col("rk") <= Blocking.BandCap)
        .join(repsP, "ph")
        .select(col("rep_id"), col("id"))
        .unionAll(clsStatsP.filter(col("cocc") === 1)
          .select(col("rep_id"), col("rep_id").as("id")))
      val crossEvP = repLinksP
        .join(membersP.select(col("rep_id").as("rep_a"), col("id").as("ma")), "rep_a")
        .join(membersP.select(col("rep_id").as("rep_b"), col("id").as("mb")), "rep_b")
        .select(least(col("ma"), col("mb")).as("id_a"),
          greatest(col("ma"), col("mb")).as("id_b"))
      val phashEv = classEvP.unionAll(crossEvP).distinct()
        .select(col("id_a"), col("id_b"), lit("phash").as("channel"))
      (phashEv, phashOv, classOvP)
      } }

      // one await over the zipped futures (ADVICE r16): a channel failure
      // surfaces as soon as it happens instead of after the earlier
      // channels drain, and the blocking{} markers above let the global
      // pool spawn compensating threads so blocked Spark actions can't
      // serialize the channels on a low-core machine
      val (textEv, textOv, embedEv, embedOv, phashEv, phashOv, classOvP) =
        Await.result(
          fText.zip(fEmbed).zip(fPhash).map { case (((tE, tO), (eE, eO)),
              (pE, pO, cO)) => (tE, tO, eE, eO, pE, pO, cO) },
          Duration.Inf)

      val votes = textEv.unionByName(embedEv).unionByName(phashEv)
        .groupBy("id_a", "id_b")
        .agg(count_distinct(col("channel")).as("v"),
          max(col("channel") === "text").as("tv"),
          max(col("channel") === "embed").as("ev"),
          max(col("channel") === "phash").as("pv"))
      val isPlanted = col("id_a") === 9300001L && col("id_b") === 9300002L
      val isNeg = col("id_b") === 9300003L &&
        col("id_a").isin(9300001L, 9300002L)
      val overflowAll = textOv.select(col("overflow_buckets").as("o1"))
        .crossJoin(embedOv.select(col("overflow_buckets").as("o2")))
        .crossJoin(phashOv.select(col("overflow_buckets").as("o3")))
        // both capped levels of channel 3 (bands + exact-dup classes),
        // the q_phash_dedup accounting shape
        .crossJoin(classOvP.select(col("overflow_buckets").as("o4")))
        .select((col("o1") + col("o2") + col("o3") + col("o4"))
          .as("overflow_buckets"))
      votes.agg(
          coalesce(max(when(isPlanted, col("v"))), lit(0L)).as("planted_votes"),
          coalesce(max(when(isPlanted, col("tv"))), lit(false)).as("text_vote"),
          coalesce(max(when(isPlanted, col("ev"))), lit(false)).as("embed_vote"),
          coalesce(max(when(isPlanted, col("pv"))), lit(false)).as("phash_vote"),
          coalesce(max(when(isNeg, col("v"))), lit(0L)).as("neg_votes"))
        .crossJoin(broadcast(overflowAll))
        .select(lit("fusion3").as("method"), col("planted_votes"),
          col("text_vote"), col("embed_vote"), col("phash_vote"),
          (col("planted_votes") >= 2).as("planted_found"),
          col("neg_votes"),
          (col("neg_votes") < 2).as("neg_rejected"),
          col("overflow_buckets"))
    }),

    // --- real image resize (round 9, enabled by the real codec): PNG →
    // decode → NEAREST half-size resize → re-encode → decode again —
    // the thumbnail step of a media pipeline, with the second decode
    // proving the resized bytes are a real container. Nearest sampling
    // keeps the oracle closed-form: target row y samples source row 2y,
    // so the two-band source yields ceil(h/4) rows of the top value and
    // the rest bottom, and every output statistic is an exact integer
    // formula. The corpus mean divides one exact integer pixel sum by
    // one exact count (single IEEE division — no sum-order leakage).
    "q_media_resize" -> ((s, d) => {
      import s.implicits._
      val ids = Tables.documents(s, d).filter(col("doc_id") % 3 === 0)
        .select(col("doc_id")).as[Long]
      val resized = ids.mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { id =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(graft.multimodal.MediaDecode.synthPng(id)))
          val half = graft.multimodal.MediaDecode.resizeHalf(img)
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(half, "png", bos)
          // decode the RE-ENCODED container and take integer pixel sums
          val back = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bos.toByteArray))
          val (w, h) = (back.getWidth, back.getHeight)
          val raster = back.getRaster
          var sum = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { sum += raster.getSample(x, y, 0); x += 1 }
            y += 1
          }
          (id, w, h, sum, w.toLong * h)
        }
      }.toDF("media_id", "w", "h", "px_sum", "n_px")
      resized.agg(
        count(lit(1)).as("n_images"),
        round(sum(col("w").cast("long")).cast("double") / count(lit(1)), 4)
          .as("avg_w"),
        round(sum(col("h").cast("long")).cast("double") / count(lit(1)), 4)
          .as("avg_h"),
        round(sum("px_sum").cast("double") / sum("n_px"), 4).as("mean_px"))
    }),

    // --- byte-entropy media quality gate: Shannon bits/byte of every
    // payload via the codegen'd [[graft.functions.ByteEntropy]]
    // expression — the content-corruption probe (truncated/padded
    // media → 0, encrypted/bit-rot → 8, structured content in
    // between). Pure per-row map over the scan (no shuffle, O(256)
    // state) + one bounded agg. Planted controls make the gate bite:
    // a constant payload must score ~0, an exact 0..255 uniform
    // payload ~8, and the corpus text payloads must land strictly
    // between — thresholds the driver checks through literal-TRUE
    // flags (the histogram logs aren't SQL-expressible).
    "q_media_entropy" -> ((s, d) => {
      import s.implicits._
      val planted = Seq(
        (9300001L, Array.fill(256)(65.toByte)),
        (9300002L, Array.tabulate(256)(_.toByte))).toDF("media_id", "payload")
      val media = Tables.documents(s, d)
        .select(col("doc_id").as("media_id"),
          encode(col("text"), "UTF-8").as("payload"))
        .unionAll(planted)
      media.select(col("media_id"), byte_entropy(col("payload")).as("h"))
        .agg(count(lit(1)).as("n_media"),
          min(when(col("media_id") === 9300001L, col("h"))).as("h_const"),
          min(when(col("media_id") === 9300002L, col("h"))).as("h_uni"),
          min(when(col("media_id") < 9300000L, col("h"))).as("h_min"),
          max(when(col("media_id") < 9300000L, col("h"))).as("h_max"))
        .select(col("n_media"),
          (abs(col("h_const")) < 1e-9).as("const_zero_ok"),
          (abs(col("h_uni") - 8.0) < 1e-9).as("uniform_max_ok"),
          (col("h_min") > 0.5 && col("h_max") < 7.5).as("corpus_between_ok"))
    }),

    // --- binaryFile source scan (2a, the multimodal INGEST path): a
    // directory of opaque media files read with Spark's `binaryFile`
    // format into (path, length, content) — how image/audio corpora
    // actually enter a 100 TB pipeline before any decode. The fixture
    // is written EXECUTOR-SIDE (foreachPartition, one file per row of
    // the id-sampled subset — the layout a crawler leaves), ids are
    // recovered from filenames, and the gate proves lossless intake:
    // every file's bytes equal the source payload (exact byte compare
    // AND phash64 agreement with the in-plan encode — tying the intake
    // to the perceptual-dedup lane), lengths equal source sizes.
    "q_binaryfile_scan" -> ((s, d) => {
      val io = graft.GraftIO.root + "/binfiles"
      val conf = new org.apache.spark.util.SerializableConfiguration(
        s.sparkContext.hadoopConfiguration)
      val fsRoot = org.apache.hadoop.fs.FileSystem.get(
        s.sparkContext.hadoopConfiguration)
      fsRoot.delete(new org.apache.hadoop.fs.Path(io), true)
      fsRoot.mkdirs(new org.apache.hadoop.fs.Path(io))
      val sample = Tables.documents(s, d).filter(col("doc_id") % 50 === 0)
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      sample.repartition(4).foreachPartition {
        (rows: Iterator[org.apache.spark.sql.Row]) =>
          val fs = org.apache.hadoop.fs.FileSystem.get(conf.value)
          rows.foreach { r =>
            val out = fs.create(new org.apache.hadoop.fs.Path(
              s"$io/doc_${r.getLong(0)}.bin"), true)
            out.write(r.getAs[Array[Byte]](1)); out.close()
          }
      }
      val files = s.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin").load(io)
        .select(
          regexp_extract(col("path"), "doc_(\\d+)\\.bin$", 1).cast("long")
            .as("doc_id"),
          col("length"), col("content"))
      files.join(sample, "doc_id")
        .agg(count(lit(1)).as("n_files"),
          sum(col("length")).as("total_bytes"),
          min(col("content") === col("payload")).as("bytes_ok"),
          min(graft.functions.phash64(col("content")) ===
            graft.functions.phash64(col("payload"))).as("phash_ok"),
          min(col("length") === octet_length(col("payload"))).as("length_ok"))
    }),

    // binary payload plumbing: byte sizes aggregate (✦ oracle)
    "q_binary_payloads" -> ((s, d) => Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        encode(col("text"), "UTF-8").as("payload"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n"),
        sum(octet_length(col("payload"))).as("total_bytes"),
        max(octet_length(col("payload"))).as("max_bytes"))
      .orderBy("lang")),

    // full decode pipeline over REAL JDK codecs (VERDICT r9 #2): binary
    // containers (PNG via javax.imageio, WAV via javax.sound.sampled, a
    // length-prefixed PNG-frame stream for video) synthesized
    // executor-side from media_id, decoded per-partition-batched, then
    // per-kind analytics (✦: every decoded dimension / frame count /
    // mean sample value is recomputed by the oracle from the generation
    // formulas — a decode that stops reading real bytes breaks the hash)
    "q_media_decode" -> ((s, d) =>
      graft.multimodal.MediaDecode.decodeStats(s, Tables.documents(s, d))),

    // frame sampling over the video containers: length-prefix SEEK past
    // 9 of every 10 frames (no decode), real PNG decode of the sampled
    // frames only (✦: sampled indices + per-frame fill values are
    // formula-derived, so the oracle replays them exactly)
    "q_frame_sample" -> ((s, d) =>
      graft.multimodal.MediaDecode.frameSample(s, Tables.documents(s, d))))

  val oracleSql: Map[String, String] = Map(
    // guarantee-flag row (aHash values aren't SQL-expressible): n_media
    // is real (corpus + the 3 planted payloads); flags pinned
    "q_phash_dedup" ->
      """SELECT 'ahash' AS method, 3 AS max_hamming,
        |  count(*) + 3 AS n_media, true AS blocking_complete,
        |  true AS planted_pair_found, true AS neg_rejected,
        |  0::BIGINT AS overflow_buckets
        |FROM documents""".stripMargin,

    // intake counts/bytes are data-derived; the byte/phash/length
    // equality flags are literal TRUE (lossless intake by construction)
    "q_binaryfile_scan" ->
      """SELECT count(*) AS n_files,
        |  sum(octet_length(encode(text)))::BIGINT AS total_bytes,
        |  true AS bytes_ok, true AS phash_ok, true AS length_ok
        |FROM documents WHERE doc_id % 50 = 0""".stripMargin,

    // guarantee-flag row (the per-payload histogram entropy isn't
    // SQL-expressible): n_media is real (corpus + 2 planted controls)
    "q_media_entropy" ->
      """SELECT count(*) + 2 AS n_media, true AS const_zero_ok,
        |  true AS uniform_max_ok, true AS corpus_between_ok
        |FROM documents""".stripMargin,

    // fusion guarantee-flag row: the planted duplicate pair must carry
    // all three channel votes; the single-channel negative control must
    // carry exactly one and be rejected by the majority rule
    "q_multimodal_dedup" ->
      """SELECT 'fusion3' AS method, 3::BIGINT AS planted_votes,
        |  true AS text_vote, true AS embed_vote, true AS phash_vote,
        |  true AS planted_found, 1::BIGINT AS neg_votes,
        |  true AS neg_rejected, 0::BIGINT AS overflow_buckets""".stripMargin,

    // nearest-neighbor half-resize of the two-band PNG: target row y
    // samples source row 2y → ceil(h/4) top rows; every statistic is an
    // exact integer formula (w//2, h//2, and the per-image pixel sum
    // (w//2) * (tt*a + (h2-tt)*b))
    "q_media_resize" ->
      """WITH img AS (
        |  SELECT doc_id,
        |    (16 + doc_id % 48) // 2 AS w2,
        |    (16 + 2 * ((doc_id // 7) % 16)) // 2 AS h2,
        |    ((16 + 2 * ((doc_id // 7) % 16)) + 3) // 4 AS tt,
        |    doc_id % 256 AS a, (doc_id * 7) % 256 AS b
        |  FROM documents WHERE doc_id % 3 = 0)
        |SELECT count(*) AS n_images,
        |  round(sum(w2)::DOUBLE / count(*), 4) AS avg_w,
        |  round(sum(h2)::DOUBLE / count(*), 4) AS avg_h,
        |  round(sum(w2 * (tt * a + (h2 - tt) * b))::DOUBLE
        |    / sum(w2 * h2), 4) AS mean_px
        |FROM img""".stripMargin,

    // real-codec decode: the oracle replays the generation formulas the
    // executors feed the codecs (two-band PNG mean = (top+bot)/2 because
    // the height is even and PNG is lossless; WAV mean = the constant
    // amplitude; video stats from the first 8×8 frame + container count)
    "q_media_decode" ->
      """SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |            ELSE 'video' END AS kind,
        |  count(*) AS n, count(*) AS n_ok,
        |  round(avg(CASE doc_id % 3 WHEN 0 THEN 16 + doc_id % 48
        |            WHEN 1 THEN 0 ELSE 8 END), 4) AS avg_w,
        |  round(avg(CASE doc_id % 3 WHEN 0 THEN 16 + 2 * ((doc_id // 7) % 16)
        |            WHEN 1 THEN 1 ELSE 8 END), 4) AS avg_h,
        |  round(avg(CASE doc_id % 3 WHEN 0 THEN 1
        |            WHEN 1 THEN 1000 + doc_id % 3000
        |            ELSE 20 + doc_id % 50 END), 4) AS avg_units,
        |  round(avg(CASE doc_id % 3
        |            WHEN 0 THEN ((doc_id % 256) + (doc_id * 7 % 256)) / 2.0
        |            WHEN 1 THEN 64 + doc_id % 128
        |            ELSE doc_id % 256 END), 4) AS avg_px
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_frame_sample" ->
      """WITH v AS (SELECT doc_id AS media_id, 20 + doc_id % 50 AS nf
        |           FROM documents WHERE doc_id % 3 = 2),
        |s AS (SELECT media_id, unnest(generate_series(0, nf - 1, 10)) AS k
        |      FROM v)
        |SELECT media_id, count(*) AS n_sampled,
        |  max(k)::BIGINT AS last_frame,
        |  round(avg((media_id + k) % 256), 4) AS avg_px
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_binary_payloads" ->
      """SELECT lang, count(*) AS n,
        |  sum(octet_length(encode(text)))::BIGINT AS total_bytes,
        |  max(octet_length(encode(text)))::BIGINT AS max_bytes
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin)
}
