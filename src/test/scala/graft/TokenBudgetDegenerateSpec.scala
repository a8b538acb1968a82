package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** The q_token_budget degenerate-length case (VERDICT r11 #4, fixed
  * round 12): a PRE-CHUNKED corpus where every document has exactly the
  * packing length — the common LLM-pipeline shape — makes the boundary
  * tie set THE WHOLE CORPUS. The old plan ranked that tie set through a
  * partition-less Window.orderBy(doc_id) (one task holds the corpus);
  * the bucket-offset rank must (a) produce exactly the greedy-scan
  * answer end-to-end and (b) keep every window in the executed plan
  * partitioned. Driven through the real contract query over a real
  * parquet directory, not a unit of the helper. */
class TokenBudgetDegenerateSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark

  test("uniform-length corpus: greedy answer exact, no partition-less window") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_tb_degenerate").toString
    val T = 7    // every doc has exactly T whitespace tokens
    val n = 101
    val langs = Array("de", "en", "fr")
    val docs = (0 until n).map { i =>
      // T distinct words per doc (content differs, LENGTH does not)
      val text = (0 until T).map(j => s"w${i}_$j").mkString(" ")
      (i.toLong, text, langs(i % 3), "web", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.repartition(4).write.parquet(s"$dir/documents.parquet")

    // greedy contract, computed independently: keep longest-first (one
    // length group), ties by doc_id, while cumulative tokens fit 50% of
    // the corpus mass → the floor(budget/T) LOWEST doc_ids
    val budget = n.toLong * T / 2           // floor(0.5 * n*T)
    val keepN = (budget / T).toInt          // all ties have length T
    val expected = (0 until keepN).map(i => langs(i % 3))
      .groupBy(identity).view.mapValues(ids => (ids.size.toLong, ids.size.toLong * T))
      .toMap

    val df = SparkEntry.queries("q_token_budget")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // every windowspecdefinition must open with a partition column (an
    // ORDER-only spec prints its sort direction in the first argument)
    "windowspecdefinition\\(([^,)]+)".r.findAllMatchIn(plan).foreach { m =>
      assert(!m.group(1).contains(" ASC") && !m.group(1).contains(" DESC"),
        s"partition-less window over the degenerate tie set:\n$plan")
    }
    val got = df.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === expected,
      s"greedy prefix mismatch: got $got expected $expected (keepN=$keepN)")
  }
}
