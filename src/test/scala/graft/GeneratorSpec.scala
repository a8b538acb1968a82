package graft

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.pos_ngrams

/**
 * PosNGrams custom Generator (§2i UDTF): differential against the
 * composable transform+posexplode formulation, the SQL LATERAL VIEW
 * surface, and analysis-time rejection of bad arguments.
 */
class GeneratorSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark
  private val sf = GraftSpark.sf

  test("pos_ngrams equals the materialize-then-posexplode formulation") {
    import graft.functions.tokens
    val toks = Tables.documents(spark, sf)
      .select(col("doc_id"), tokens(col("text")).as("tk"))
    val viaGen = toks
      .select(col("doc_id"), pos_ngrams(col("tk"), 3).as(Seq("pos", "gram")))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted
    val viaCompose = toks
      .filter(size(col("tk")) >= 3)
      .select(col("doc_id"), posexplode(transform(
        sequence(lit(0), size(col("tk")) - 3),
        i => concat_ws(" ", element_at(col("tk"), i + 1),
          element_at(col("tk"), i + 2), element_at(col("tk"), i + 3)))))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted
    assert(viaGen.nonEmpty)
    assert(viaGen.toSeq == viaCompose.toSeq)
  }

  test("pos_ngrams works through SQL LATERAL VIEW") {
    Graft.register(spark)
    Tables.documents(spark, sf).createOrReplaceTempView("docs_gen")
    val n = spark.sql("""
      SELECT count(*) FROM docs_gen
      LATERAL VIEW pos_ngrams(split(lower(text), '\\s+'), 2) t AS pos, gram
    """).collect()(0).getLong(0)
    assert(n > 0)
  }

  test("pos_ngrams skips null tokens like concat_ws (single separator)") {
    val df = spark.sql("SELECT array('a', CAST(NULL AS STRING), 'b') AS tk")
    val out = df.select(pos_ngrams(col("tk"), 3).as(Seq("pos", "gram"))).collect()
    assert(out.length == 1)
    assert(out(0).getString(1) == "a b",
      s"null token must be skipped, got '${out(0).getString(1)}'")
    // and it matches the composable concat_ws formulation exactly
    val want = df.selectExpr("concat_ws(' ', tk[0], tk[1], tk[2]) AS g")
      .collect()(0).getString(0)
    assert(out(0).getString(1) == want)
  }

  test("pos_ngrams emits nothing for short or null arrays") {
    val df = spark.sql(
      "SELECT * FROM VALUES (array('a','b')), (CAST(NULL AS ARRAY<STRING>)) AS t(tk)")
    val out = df.select(pos_ngrams(col("tk"), 3).as(Seq("pos", "gram"))).collect()
    assert(out.isEmpty)
  }

  test("pos_ngrams rejects non-constant or non-positive n at analysis time") {
    val docs = Tables.documents(spark, sf).select(split(col("text"), " ").as("tk"))
    intercept[AnalysisException] {
      docs.select(pos_ngrams(col("tk"), 0).as(Seq("pos", "gram"))).collect()
    }
  }
}
