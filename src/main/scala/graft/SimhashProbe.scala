package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (round 15): the simhash pair-contract calibrator.
  *
  * q_simhash_neardup's r10 `pairs_vocab_ok` floor (unigram Jaccard ≥
  * 0.45 over emitted pairs) was CORPUS calibration, and the 10× sweep
  * falsified it the same way the r10 sf0.1 sweep falsified the old 0.8
  * floor: frequency-skewed pairs (dominant shared token, long tail of
  * distinct rare tokens) legitimately land within hamming 3 while their
  * unweighted token-SET overlap drops without bound as the tail grows.
  * SimHash is an LSH for WEIGHTED cosine (Charikar 2002: P[bit differs]
  * = θ/π), so the scale-true pair contract is a weighted-cosine floor —
  * hamming ≤ 3 of 64 bounds the estimated angle, and a binomial tail
  * bound turns that into a cosine floor that holds at EVERY corpus.
  *
  * This probe prints, for a list of dirs: every emitted pair's unigram
  * Jaccard AND token-frequency cosine (asc) — the numbers that pick the
  * shipped floor. `runMain graft.SimhashProbe [dir ...]`. */
object SimhashProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1", "/tmp/sf1")
    for (d <- dirs) {
      println(s"=== $d ===")
      val pairs = queries.TextQueries.simhashPairs(spark, d)
        .select("id_a", "id_b").localCheckpoint()
      val n = pairs.count()
      println(s"  emitted hamming<=3 pairs: $n")
      if (n > 0) {
        val uni = queries.TextQueries.verifyJaccard(pairs,
          Tables.documents(spark, d)
            .select(col("doc_id"), explode(graft.functions.tokens(col("text"))).as("t"))
            .select(col("doc_id"), xxhash64(col("t")).as("gh")).distinct())
        val wcos = queries.TextQueries.weightedCosine(spark, d, pairs)
        val merged = uni.select("id_a", "id_b", "jaccard")
          .join(wcos, Seq("id_a", "id_b"))
          .orderBy("wcos")
          .as[(Long, Long, Double, Double)].collect()
        println(s"  (id_a, id_b, uni_jaccard, weighted_cos) asc by wcos:")
        merged.take(10).foreach(t => println(s"    $t"))
        println(s"  min uni_jaccard = ${merged.map(_._3).min}, " +
          s"min weighted_cos = ${merged.map(_._4).min}")
      }
    }
    spark.stop()
  }
}
