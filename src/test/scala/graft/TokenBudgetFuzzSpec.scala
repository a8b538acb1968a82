package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Differential fuzz of q_token_budget's histogram-cutoff greedy
  * contract (round 12): seeded random corpora — SPARSE random doc_ids
  * (stressing the id-range bucket-offset rank far from the dense
  * 0..n testdata shape), random lengths (many length groups, boundary
  * sometimes empty when the budget lands exactly on a group edge),
  * random languages — against an independent driver-side evaluation of
  * the contract: keep whole length-groups longest-first while their
  * cumulative token mass fits floor(50% · total), then the
  * floor(rem / b_len) LOWEST-id docs of the single boundary group.
  * The DuckDB oracle already checks the shipped corpora at three
  * scales; this covers the data shapes they lack. */
class TokenBudgetFuzzSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark

  private def greedy(docs: Seq[(Long, String, Int)]): Map[String, (Long, Long)] = {
    // docs = (doc_id, lang, n_tok); mirror the histogram-cutoff contract
    val total = docs.map(_._3.toLong).sum
    val budget = total / 2
    val byLen = docs.groupBy(_._3).toSeq.sortBy(-_._1) // length desc
    var cum = 0L
    val kept = Seq.newBuilder[(Long, String, Int)]
    var boundaryDone = false
    byLen.foreach { case (len, group) =>
      if (!boundaryDone) {
        val mass = len.toLong * group.size
        if (cum + mass <= budget) { kept ++= group; cum += mass }
        else {
          val k = ((budget - cum) / len).toInt // ties by lowest doc_id
          kept ++= group.sortBy(_._1).take(k)
          boundaryDone = true // histogram cutoff: smaller lengths dropped
        }
      }
    }
    kept.result().groupBy(_._2).view
      .mapValues(g => (g.size.toLong, g.map(_._3.toLong).sum)).toMap
  }

  for (seed <- Seq(7, 101, 9001)) {
    test(s"random sparse-id corpus matches the independent greedy (seed $seed)") {
      import spark.implicits._
      val rnd = new scala.util.Random(seed)
      val n = 150 + rnd.nextInt(100)
      val langs = Array("ar", "de", "en", "fr")
      val ids = scala.collection.mutable.LinkedHashSet.empty[Long]
      while (ids.size < n) ids += math.abs(rnd.nextLong()) % 1000000000000L
      val docs = ids.toSeq.map { id =>
        val t = 1 + rnd.nextInt(12)
        (id, (0 until t).map(j => s"w${id % 97}_$j").mkString(" "),
          langs(rnd.nextInt(4)), t)
      }
      val dir = Files.createTempDirectory(s"graft_tb_fuzz_$seed").toString
      docs.map { case (id, text, lang, _) =>
        (id, text, lang, "web", text.length.toLong)
      }.toDF("doc_id", "text", "lang", "source", "n_chars")
        .repartition(4).write.parquet(s"$dir/documents.parquet")

      val expected = greedy(docs.map(d => (d._1, d._3, d._4)))
      val got = SparkEntry.queries("q_token_budget")(spark, dir).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(got === expected, s"seed $seed: got $got expected $expected")
    }
  }
}
