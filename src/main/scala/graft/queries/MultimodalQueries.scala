package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/**
 * Multimodal-column plumbing (SURVEY.md §2j): opaque `binary` payloads +
 * typed metadata, with decode/feature-extract as a per-partition batch
 * stage. The decode itself is STUBBED (no image/audio libs in this
 * container — see [[graft.multimodal.MediaDecode.decodeStub]]); the
 * Spark-side plumbing — binary column, schema, partition-batched typed
 * transform, post-decode analytics — is real and tested.
 */
object MultimodalQueries {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(

    // binary payload plumbing: byte sizes aggregate (✦ oracle)
    "q_binary_payloads" -> ((s, d) => Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        encode(col("text"), "UTF-8").as("payload"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n"),
        sum(octet_length(col("payload"))).as("total_bytes"),
        max(octet_length(col("payload"))).as("max_bytes"))
      .orderBy("lang")),

    // full decode pipeline: binary → per-partition batched stub decode →
    // typed metadata → analytics (✦: the counts/bytes/contract-flag
    // outputs are SQL-expressible; the stub's fake dimensions are checked
    // against the decoder contract, not their hash values)
    "q_media_decode" -> ((s, d) =>
      graft.multimodal.MediaDecode.decodeStats(s, Tables.documents(s, d))),

    // frame-sampling shape: explode synthetic frame indices per media row,
    // the plan shape of video frame extraction (✦: every-10th-frame
    // sampling reduces to integer arithmetic on the payload size)
    "q_frame_sample" -> ((s, d) =>
      graft.multimodal.MediaDecode.frameSample(s, Tables.documents(s, d))))

  val oracleSql: Map[String, String] = Map(
    "q_media_decode" ->
      """SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |            ELSE 'video' END AS kind,
        |  count(*) AS n,
        |  sum(octet_length(encode(text)))::BIGINT AS total_bytes,
        |  sum((octet_length(encode(text)) > 0)::BIGINT)::BIGINT AS n_ok,
        |  true AS dims_ok
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_frame_sample" ->
      """SELECT doc_id AS media_id,
        |  ((nf + 9) // 10)::BIGINT AS n_sampled,
        |  (((nf - 1) // 10) * 10)::BIGINT AS last_frame
        |FROM (SELECT doc_id, octet_length(encode(text)) // 10 AS nf
        |      FROM documents)
        |WHERE nf > 0 ORDER BY media_id""".stripMargin,

    "q_binary_payloads" ->
      """SELECT lang, count(*) AS n,
        |  sum(octet_length(encode(text)))::BIGINT AS total_bytes,
        |  max(octet_length(encode(text)))::BIGINT AS max_bytes
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin)
}
