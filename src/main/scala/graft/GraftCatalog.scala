package graft

import org.apache.spark.sql.SparkSession

/**
 * SQL view layer (SURVEY.md §2 "user surface" polish): registers the
 * testdata tables and any contract query as temp views, so the whole
 * engine is demoable from pure `spark.sql` — a user can
 * `SELECT * FROM q_agg_pricing` or join a query view against a base
 * table without touching the Scala Column API. Combined with the
 * injected sketch functions (GraftExtensions), SQL is a first-class
 * entry point.
 *
 * Laziness: a temp view wraps the query's UNEXECUTED logical plan, so
 * for ordinary queries registration costs nothing and each SELECT plans
 * and optimizes end-to-end like any SQL view. The exceptions are the
 * queries that embed eager preparation (the streaming pipelines run
 * their stream to completion; the iterative queries — dedup clusters,
 * BPE learning — drive their loop) at DataFrame-construction time:
 * registering those views pays that cost up front, which is why bulk
 * registration is split into [[registerBatchViews]] (everything
 * non-streaming) and per-name [[registerView]] (anything, on demand).
 */
object GraftCatalog {

  val tableNames: Seq[String] = Seq("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "events", "documents",
    "embeddings")

  /** Register the 10 testdata tables as temp views named as in DuckDB. */
  def registerTables(spark: SparkSession, sfDir: String): Unit =
    tableNames.foreach(t => Tables(spark, sfDir, t).createOrReplaceTempView(t))

  /** Register one contract query as a temp view under its own name. */
  def registerView(spark: SparkSession, sfDir: String, name: String): Unit =
    SparkEntry.queries(name)(spark, sfDir).createOrReplaceTempView(name)

  /** Register every non-streaming contract query as a temp view (the
    * streaming queries execute their pipeline at construction — register
    * those individually when wanted). */
  def registerBatchViews(spark: SparkSession, sfDir: String): Unit =
    SparkEntry.queries.keys.filterNot(_.startsWith("q_stream_")).toSeq.sorted
      .foreach(registerView(spark, sfDir, _))
}
