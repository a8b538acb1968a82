package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Per-operator smoke coverage (SURVEY.md §5.2): every named query in the
 * driver contract runs at sf0.001 without throwing, and the ones whose
 * semantics guarantee output produce rows. (Value-level correctness is
 * covered by the DuckDB oracle gate; sketch accuracy by SketchSpec.)
 */
class QuerySmokeSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark

  // Queries that may legitimately return zero rows at tiny scale
  // (near-dup / threshold filters over only 500 docs).
  private val mayBeEmpty = Set(
    "q_ngram_jaccard", "q_simhash_neardup", "q_minhash_neardup",
    "q_embed_neardup", "q_doc_fingerprint", "q_dedup_canonical",
    "q_contamination")

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, GraftSpark.sf)
      assert(df.schema.fields.nonEmpty, "empty schema")
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q_shard_write is retry-stable (same rows land in the same shard)") {
    // shard assignment is a pure function of the row, so a re-run (a
    // retried write at 100 TB) must produce the identical audit
    val a = SparkEntry.queries("q_shard_write")(spark, GraftSpark.sf)
      .collect().map(_.toSeq).toSeq
    val b = SparkEntry.queries("q_shard_write")(spark, GraftSpark.sf)
      .collect().map(_.toSeq).toSeq
    assert(a === b, "re-running the shard write changed the layout")
  }

  test("every oracleSql key has a matching queries entry") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle SQL without query impl: $orphans")
  }
}
