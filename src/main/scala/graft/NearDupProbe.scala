package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Measurement tool for the near-dup / ANN guarantee floors (the numbers
 * behind the `recall_ok`/`pairs_sim_ok` gate flags): prints, per SF,
 * the ANN recall@10 of each approximate method, the minhash-verified
 * pair set vs the exact Jaccard pair set, and the simhash pairs'
 * exact-Jaccard distribution + high-sim capture. Results recorded in
 * BASELINE.md; the flags' thresholds must sit strictly below/above these.
 */
object NearDupProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val sfs = if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
    for (d <- sfs) {
      println(s"=== $d ===")
      val exact = queries.VectorQueries.bruteTop10(spark, d)
        .as[Long].collect().toSet
      for ((nm, df) <- Seq(
          "ivf" -> queries.VectorQueries.ivfTop10(spark, d),
          "lsh" -> queries.VectorQueries.lshTop10(spark, d),
          "int8" -> queries.VectorQueries.quantizedTop10(spark, d),
          "pq" -> queries.VectorQueries.pqTop10(spark, d),
          "ivfpq" -> queries.VectorQueries.ivfpqTop10(spark, d))) {
        val got = df.select("vec_id").as[Long].collect().toSet
        println(s"  ann $nm recall@10 = ${(exact & got).size}")
      }
      // planted-cluster recalls (the corpus the r9 gates run on)
      val exactP = queries.VectorQueries.bruteTop10(spark, d, planted = true)
        .as[Long].collect().toSet
      println(s"  planted exact top-10 all-planted = ${exactP.forall(_ > 9200000L)}")
      for ((nm, df) <- Seq(
          "ivf" -> queries.VectorQueries.ivfTop10(spark, d, planted = true),
          "lsh" -> queries.VectorQueries.lshTop10(spark, d, planted = true),
          "pq" -> queries.VectorQueries.pqTop10(spark, d, planted = true),
          "ivfpq" -> queries.VectorQueries.ivfpqTop10(spark, d, planted = true))) {
        val got = df.select("vec_id").as[Long].collect().toSet
        println(s"  ann $nm PLANTED recall@10 = ${(exactP & got).size} " +
          s"(all-planted=${got.forall(_ > 9200000L)})")
      }
      val mh = SparkEntry.queries("q_minhash_neardup")(spark, d)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val ex = SparkEntry.queries("q_ngram_jaccard")(spark, d)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      println(s"  minhash-verified pairs = ${mh.size}, exact pairs = ${ex.size}, " +
        s"missed = ${(ex -- mh).size}, extra = ${(mh -- ex).size}")
      val sim = SparkEntry.queries("q_simhash_neardup")(spark, d).collect()
      println(s"  simhash flags row: ${sim.mkString}")
      // detail: jaccard distribution of simhash pairs + capture of high-sim pairs
      val simPairs = queries.TextQueries.simhashPairs(spark, d)
      val postings = queries.TextQueries.postingsOf(spark, d)
      val verified = queries.TextQueries.verifyJaccard(simPairs, postings)
        .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect()
        .sortBy(_._3)
      println(s"  simhash pair jaccards (asc): ${verified.take(8).map(_._3).mkString(",")} ... n=${verified.length}")
      val exJ = SparkEntry.queries("q_ngram_jaccard")(spark, d)
        .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect()
      val simSet = verified.map(t => (t._1, t._2)).toSet
      val missed09 = exJ.filter(t => t._3 >= 0.9 && !simSet.contains((t._1, t._2)))
      println(s"  exact j>=0.9 pairs = ${exJ.count(_._3 >= 0.9)}, missed by simhash = ${missed09.length}: ${missed09.take(6).mkString(",")}")
      val missed95 = exJ.filter(t => t._3 >= 0.95 && !simSet.contains((t._1, t._2)))
      println(s"  exact j>=0.95 pairs = ${exJ.count(_._3 >= 0.95)}, missed = ${missed95.length}")
      // (a) blocking completeness: blocked pairs == all-pairs hamming<=3
      val sigs = queries.TextQueries.simhashSigs(spark, d)
      val sa = sigs.toDF("id_a", "sig_a")
      val sb = sigs.toDF("id_b", "sig_b")
      val allPairs = sa.crossJoin(sb).filter(col("id_a") < col("id_b"))
        .filter(graft.functions.hamming64(col("sig_a"), col("sig_b")) <= 3)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      println(s"  all-pairs hamming<=3 = ${allPairs.size}, blocked = ${simSet.size}, equal = ${allPairs == simSet}")
      // (b) unigram token-set jaccard of the simhash pairs
      val uniPost = Tables.documents(spark, d)
        .select(col("doc_id"), explode(graft.functions.tokens(col("text"))).as("t"))
        .select(col("doc_id"), xxhash64(col("t")).as("gh")).distinct()
      val uni = queries.TextQueries.verifyJaccard(simPairs, uniPost)
        .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().sortBy(_._3)
      println(s"  simhash pair UNIGRAM jaccards (asc): ${uni.take(8).map(_._3).mkString(",")}")
    }
    spark.stop()
  }
}
