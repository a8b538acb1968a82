package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured-recall probe AND mechanical quality gate of the ANN lane.
  *
  * Probe mode (`runMain graft.queries.AnnRecallProbe [sfDir ...]`):
  * RAW recall@10 of every approximate ANN path against the exact
  * brute-force top-10, over the UNplanted corpus of a given directory.
  * On the shipped near-uniform corpus raw recall is data-limited
  * (1–3/10 — nothing to find); on the GenClustered sets (10 genuine
  * Gaussian clusters) it measures real cluster recovery. The CONTRACT
  * gates stay pinned on the planted-cluster pigeonhole floors and are
  * untouched by this probe.
  *
  * Gate mode (`--gate [dir50 dir500]`, driven by tools/recall_probe.sh
  * — VERDICT r13 #1): the round-8 IVFPQ ADC shipped a BIASED estimator
  * for five rounds and every hash gate stayed green, because pigeonhole
  * floors certify "not catastrophically broken", not "correctly
  * estimating". This mode re-measures the §clustered-recall matrix on
  * the 50- and 500-member clustered corpora and FAILS (exit 1) if any
  * row drops below its pinned floor. The FIXED-depth rows (r128/r256)
  * are the estimator-quality sentinels: the r14 adaptive default depth
  * (512 on these corpora) would mask a re-introduced bias (the biased
  * ADC also read 10/10 at depth 512), but at r256 the biased form read
  * 4/10 vs the unbiased 8/10 — exactly the regression this gate trips
  * on. Floors are the exact values measured on the round-14 tree: every
  * computation here is deterministic (seeded-xxhash geometry, no RNG),
  * so a drop of even 1 is a code change, not noise.
  */
object AnnRecallProbe {

  /** (method, builder) rows of the matrix. Default rows measure the
    * shipped ADAPTIVE depth; _rN rows pin the depth explicitly. */
  private def methods(spark: SparkSession, d: String)
      : Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
    "ivf_np2"      -> (() => VectorQueries.ivfTop10(spark, d)),
    "lsh_l12p4"    -> (() => VectorQueries.lshTop10(spark, d)),
    "int8"         -> (() => VectorQueries.quantizedTop10(spark, d)),
    "pq_m8k16"     -> (() => VectorQueries.pqTop10(spark, d)),
    // 8-bit codebook (round 13): the other axis of the recall-vs-
    // depth trade. Measured on 500-member clusters: bit-width
    // LEFT-SHIFTS the depth curve (r128: 7 vs 3; r256: 9 vs 4) but
    // cannot rescue a shortlist far below the tie set (r64: 3 = 3)
    "pq8_m8k256"   -> (() => VectorQueries.pq8Top10(spark, d)),
    "ivfpq_np2"    -> (() => VectorQueries.ivfpqTop10(spark, d)),
    // deep-rerank twins: the recall-vs-depth curve (round 13) — a
    // cluster LARGER than the shortlist saturates 4-bit ADC codes
    // (near-ties rank ~randomly), so depth must cover the tie set
    "pq_r512"      -> (() => VectorQueries.pqTop10(spark, d, rerank = 512)),
    "ivfpq_r512"   -> (() => VectorQueries.ivfpqTop10(spark, d, rerank = 512)),
    // the other two cells of the 8-bit matrix: depth-512 twin, and
    // a 3-step-Lloyd (near-converged) codebook — does training
    // quality substitute for depth inside tight clusters?
    "pq8_r512"     -> (() => VectorQueries.pq8Top10(spark, d, rerank = 512)),
    "pq8_s3"       -> (() => VectorQueries.pq8Top10(spark, d, steps = 3)),
    "pq_r128"      -> (() => VectorQueries.pqTop10(spark, d, rerank = 128)),
    "pq_r256"      -> (() => VectorQueries.pqTop10(spark, d, rerank = 256)),
    "pq8_r128"     -> (() => VectorQueries.pq8Top10(spark, d, rerank = 128)),
    "pq8_r256"     -> (() => VectorQueries.pq8Top10(spark, d, rerank = 256)),
    // 8-bit RESIDUAL codebooks (per-cell k≤256, hash-order seeds):
    // the full IVFADC production shape — does the left-shift hold
    // when codes quantize residuals inside coarse cells?
    "ivfpq8_np2"   -> (() => VectorQueries.ivfpqTop10(spark, d, kCodes = 256)),
    "ivfpq_r128"   -> (() => VectorQueries.ivfpqTop10(spark, d, rerank = 128)),
    "ivfpq_r256"   -> (() => VectorQueries.ivfpqTop10(spark, d, rerank = 256)),
    "ivfpq8_r128"  -> (() => VectorQueries.ivfpqTop10(spark, d, rerank = 128, kCodes = 256)),
    "ivfpq8_r256"  -> (() => VectorQueries.ivfpqTop10(spark, d, rerank = 256, kCodes = 256)),
    "nsw_beam_t3"  -> (() => VectorQueries.graphTop10Raw(spark, d)))

  /** Pinned raw_hits@10 floors, measured on the round-14 tree (adaptive
    * default depth). 50-member clusters: every method reads 10/10 —
    * anything less is a regression. 500-member clusters: the default
    * rows resolve to depth 512 (adaptive) and read 10/10; the
    * fixed-depth rows pin the measured recall-vs-depth curve, which is
    * where a biased estimator shows first (see the class doc). */
  private val floors50: Map[String, Long] = Map(
    "ivf_np2" -> 10, "lsh_l12p4" -> 10, "int8" -> 10, "pq_m8k16" -> 10,
    "pq8_m8k256" -> 10, "ivfpq_np2" -> 10, "pq_r512" -> 10,
    "ivfpq_r512" -> 10, "pq8_r512" -> 10, "pq8_s3" -> 10, "pq_r128" -> 10,
    "pq_r256" -> 10, "pq8_r128" -> 10, "pq8_r256" -> 10, "ivfpq8_np2" -> 10,
    "ivfpq_r128" -> 10, "ivfpq_r256" -> 10, "ivfpq8_r128" -> 10,
    "ivfpq8_r256" -> 10, "nsw_beam_t3" -> 10)

  private val floors500: Map[String, Long] = Map(
    "ivf_np2" -> 10, "lsh_l12p4" -> 10, "int8" -> 10,
    // adaptive defaults (depth 512 on this corpus)
    "pq_m8k16" -> 10, "pq8_m8k256" -> 10, "ivfpq_np2" -> 10,
    "ivfpq8_np2" -> 10,
    // explicit depth-512 and 3-step-Lloyd rows
    "pq_r512" -> 10, "ivfpq_r512" -> 10, "pq8_r512" -> 10, "pq8_s3" -> 10,
    // the estimator-quality sentinels: intermediate depths, where the
    // round-8 biased ADC read 3/4 (ivfpq r128/r256) vs these floors
    "pq_r128" -> 3, "pq_r256" -> 4, "pq8_r128" -> 7, "pq8_r256" -> 9,
    "ivfpq_r128" -> 5, "ivfpq_r256" -> 8, "ivfpq8_r128" -> 10,
    "ivfpq8_r256" -> 10,
    "nsw_beam_t3" -> 7)

  /** Runs the matrix over one dir; returns (method → (raw, inCluster)). */
  private def measure(spark: SparkSession, d: String)
      : Seq[(String, Long, Long)] = {
    val exact = VectorQueries.bruteTop10(spark, d).localCheckpoint()
    val labeled = graft.Tables.embeddings(spark, d)
      .select(col("vec_id"), col("label"))
      .crossJoin(broadcast(graft.Tables.embeddings(spark, d)
        .filter(col("vec_id") === 0).select(col("label").as("qlabel"))))
      .filter(col("label") === col("qlabel"))
      .select("vec_id").localCheckpoint()
    val rows = methods(spark, d).map { case (name, f) =>
      val top = f().select("vec_id").localCheckpoint()
      val hits = top.join(exact, "vec_id").count()
      // in-cluster@10 separates CLUSTER RECOVERY (did the index land
      // in the right region?) from exact-rank resolution: in a tight
      // cluster every member is a near-tie, so a quantized path can
      // recover the cluster perfectly yet reorder near-identical
      // cosines below exact-set overlap.
      val inCluster = top.join(labeled, "vec_id").count()
      println(f"[annrecall] $name%-12s raw_hits@10 = $hits  in_cluster@10 = $inCluster")
      (name, hits, inCluster)
    }
    // context row: how concentrated is the exact answer? On the
    // clustered sets all 10 exact neighbors share the query's cluster.
    val sameLabel = exact
      .join(graft.Tables.embeddings(spark, d), "vec_id")
      .crossJoin(broadcast(graft.Tables.embeddings(spark, d)
        .filter(col("vec_id") === 0).select(col("label").as("qlabel"))))
      .filter(col("label") === col("qlabel")).count()
    println(s"[annrecall] exact-top10 in query's label/cluster: $sameLabel/10")
    rows
  }

  /** Mega-tie-set floors for `--tieset` (VERDICT r14 #7, measured
    * honestly): on a corpus whose QUERY CLUSTER alone dwarfs the 512
    * depth cap (10×10k members, σ=0.045), NO selection rule reading
    * ≤512 exact vectors can recover the exact top-10 — the cluster's
    * order-statistic cosine gaps (~1e-3 between rank 10 and rank 512)
    * sit below the per-candidate ADC estimation noise (~1e-2), so the
    * ordering information is not in the codes, for 4-bit, 8-bit,
    * 3-step-Lloyd AND residual (ivfpq8) variants alike (measured
    * 1/2/0/4 out of 10 on the r15 tree). The VERDICT r14 #7 target
    * (flat PQ8 ≥ 9/10 here) is therefore unreachable at the stated
    * cost bound; what the observed-ambiguity estimator DOES deliver,
    * and what these floors pin, is (a) the measured values as
    * regression floors and (b) DETECTION: the estimator must resolve
    * ambiguity ≫ the cap on this corpus — the loud-accounting norm the
    * blocking caps follow (a capped answer is fine, a silently capped
    * one is not). */
  private val tiesetFloors: Map[String, Long] = Map(
    "pq_m8k16" -> 1, "pq8_m8k256" -> 2, "pq8_s3" -> 0, "ivfpq8_np2" -> 4)

  /** The --tieset detection floor: observed ambiguity must exceed the
    * depth cap by at least this factor on the mega-tie-set corpus
    * (the true ambiguity is the 10k query cluster). */
  private val tiesetAmbiguityFloor = 2L * 512

  def main(args: Array[String]): Unit = {
    val gate = args.headOption.contains("--gate")
    val tieset = args.headOption.contains("--tieset")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    if (tieset) {
      val dir = args.lift(1).getOrElse("/tmp/sfc10k")
      println(s"\n[annrecall] tieset dir=$dir (observed-depth evidence row)")
      val exact = VectorQueries.bruteTop10(spark, dir).localCheckpoint()
      var ambiguity = Map.empty[String, (Int, Long)]
      val rows = Seq(
        "pq_m8k16"   -> (() => VectorQueries.pqTop10(spark, dir)),
        "pq8_m8k256" -> (() => VectorQueries.pq8Top10(spark, dir)),
        "pq8_s3"     -> (() => VectorQueries.pq8Top10(spark, dir, steps = 3)),
        "ivfpq8_np2" -> (() => VectorQueries.ivfpqTop10(spark, dir, kCodes = 256))).map {
        case (name, f) =>
          VectorQueries.lastObservedAmbiguity.remove()
          val hits = f().select("vec_id").join(exact, "vec_id").count()
          val amb = VectorQueries.lastObservedAmbiguity.get()
          ambiguity += name -> amb
          println(f"[annrecall] $name%-12s raw_hits@10 = $hits  " +
            f"resolved_depth = ${amb._1}  observed_ambiguity = ${amb._2}")
          name -> hits
      }.toMap
      println("\n| method | 10k-member-tie-set raw@10 (floor) | resolved depth | observed ambiguity |")
      println("|---|---|---|---|")
      rows.toSeq.sortBy(_._1).foreach { case (n, h) =>
        println(s"| $n | $h (>=${tiesetFloors(n)}) | ${ambiguity(n)._1} | ${ambiguity(n)._2} |")
      }
      var fails = rows.collect { case (n, h) if h < tiesetFloors(n) =>
        s"RECALLGATE FAIL kind=tieset method=$n got=$h floor=${tiesetFloors(n)}"
      }.toList
      // detection: the flat-PQ estimator must LOUDLY measure the regime
      // it cannot serve (ambiguity ≫ cap), never silently floor it
      val pq8Amb = ambiguity("pq8_m8k256")._2
      if (pq8Amb < tiesetAmbiguityFloor)
        fails ::= s"RECALLGATE FAIL kind=tieset detection: pq8 observed " +
          s"ambiguity $pq8Amb < $tiesetAmbiguityFloor — the mega-tie-set " +
          s"regime went undetected"
      if (fails.nonEmpty) {
        fails.foreach(println)
        spark.stop(); sys.exit(1)
      }
      println(s"RECALLGATE ok -- ${tiesetFloors.size} tieset floors held, " +
        s"regime detected (pq8 ambiguity $pq8Amb >= $tiesetAmbiguityFloor)")
      spark.stop(); return
    }

    if (gate) {
      val rest = args.drop(1)
      val dir50 = rest.lift(0).getOrElse("/tmp/sfc0.01")
      val dir500 = rest.lift(1).getOrElse("/tmp/sfc10x")
      var fails = List.empty[String]
      val results = for ((dir, kind, floors) <-
          Seq((dir50, "c50", floors50), (dir500, "c500", floors500))) yield {
        println(s"\n[annrecall] dir=$dir kind=$kind")
        val rows = measure(spark, dir)
        rows.foreach { case (name, hits, _) =>
          floors.get(name).foreach { floor =>
            if (hits < floor)
              fails ::= s"RECALLGATE FAIL kind=$kind method=$name got=$hits floor=$floor"
          }
        }
        kind -> rows
      }
      // the §clustered-recall markdown table, regenerated mechanically
      // (paste into BASELINE.md when a floor legitimately moves)
      val by50 = results.head._2.map(r => r._1 -> r._2).toMap
      val by500 = results(1)._2.map(r => r._1 -> r._2).toMap
      println("\n| method | 50-member raw@10 (floor) | 500-member raw@10 (floor) |")
      println("|---|---|---|")
      results.head._2.foreach { case (name, _, _) =>
        println(s"| $name | ${by50(name)} (>=${floors50(name)}) | " +
          s"${by500(name)} (>=${floors500(name)}) |")
      }
      if (fails.nonEmpty) {
        fails.reverse.foreach(println)
        spark.stop()
        sys.exit(1)
      }
      println(s"RECALLGATE ok -- ${floors50.size + floors500.size} floors held")
    } else {
      val dirs = if (args.nonEmpty) args.toSeq
        else Seq("/root/testdata/sf0.01", "/tmp/sfc0.01")
      dirs.foreach { d =>
        println(s"\n[annrecall] dir=$d")
        measure(spark, d)
      }
    }
    spark.stop()
  }
}
