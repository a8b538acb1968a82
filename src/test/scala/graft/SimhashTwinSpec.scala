package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.TextQueries
import graft.functions.tokens

/** Pins the lower-id-twin scenario for the simhash lane's planted flag
  * (VERDICT r15 #4). The lane emits RAW doc ids (no collapse stage), so
  * [[TextQueries.simhashEmitId]] is the identity — and the planted pair
  * (9400001, 9400002) must appear in the emitted relation EVEN WHEN a
  * lower-id exact twin of plant 9400001 exists in the corpus. If a
  * collapse/rep stage is ever added to the emission path (the twin
  * would become the pair's representative and the raw-id pair would
  * vanish from emission), this spec fails — forcing whoever adds the
  * stage to route its resolution through simhashEmitId so the flag
  * moves with the emitted-id space (the phash lane's ADVICE-r14 rule).
  */
class SimhashTwinSpec extends AnyFunSuite {

  test("planted pair survives a lower-id exact twin through simhashEmitId") {
    val s = GraftSpark.spark
    import s.implicits._
    // corpus = the three plants + an exact lower-id twin of plant
    // 9400001 (identical text → identical signature, Jaccard 1.0 with
    // both plants) + unrelated filler so blocking has company
    val twin = (100L, TextQueries.simPlanted.head._2)
    val filler = (1 to 20).map(i =>
      (i.toLong + 200L, (0 until 50).map(j => s"fill${i}w$j").mkString(" ")))
    val docs = (TextQueries.simPlanted :+ twin).++(filler).toDF("doc_id", "text")

    val sigs = TextQueries.simhashSigsOf(docs)
    val (pairs, _) = TextQueries.simhashPairsFromSigs(sigs)
    val uniPostings = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("t"))
      .select(col("doc_id"), xxhash64(col("t")).as("gh")).distinct()
    val emitted = TextQueries.verifyJaccard(pairs, uniPostings)
      .filter(col("jaccard") >= TextQueries.SimhashVerifyFloor)

    val pA = TextQueries.simhashEmitId(lit(9400001L))
    val pB = TextQueries.simhashEmitId(lit(9400002L))
    val plantRows = emitted
      .filter(col("id_a") === least(pA, pB) && col("id_b") === greatest(pA, pB))
      .count()
    assert(plantRows === 1L,
      "planted pair must be emitted under its resolved ids despite the twin")

    // the twin itself pairs with BOTH plants (J = 1.0 with 9400001,
    // ≥ floor with 9400002) — the raw-id emission contract
    val twinRows = emitted
      .filter(col("id_a") === 100L &&
        col("id_b").isin(9400001L, 9400002L))
      .count()
    assert(twinRows === 2L, "twin pairs with both plants under raw ids")

    // the vocab-disjoint control must never be emitted, twin or not
    val pN = TextQueries.simhashEmitId(lit(9400003L))
    assert(emitted.filter(col("id_a") === pN || col("id_b") === pN).count() === 0L)
  }
}
