package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.VectorQueries

/**
 * Graph-traversal ANN (q_knn_graph): cluster-seeded beam search over
 * the LSH-built kNN graph. The load-bearing claim is that EDGE
 * TRAVERSAL finds the planted cluster — the entry set is deliberately
 * smaller than the answer, so a zero-round probe must stay under the
 * floor while the 3-round beam clears it.
 */
class GraphAnnSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark
  private val sf = GraftSpark.sf

  test("beam search clears the floor; the 4-seed entry alone cannot") {
    val brute = VectorQueries.bruteTop10(spark, sf, planted = true)
      .collect().map(_.getLong(0)).toSet
    assert(brute.forall(_ > 9200000L), s"exact top-10 not all-planted: $brute")
    val beam = VectorQueries.graphTop10(spark, sf)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val beamRecall = (beam & brute).size
    info(s"graph beam recall@10 = $beamRecall/10 at $sf")
    assert(beamRecall >= 8, s"beam recall $beamRecall under the floor 8")
    // rounds = 0: visited = the 4 entry seeds only → at most 4 hits.
    // This is what upgrades the gate from "entry found the cluster" to
    // "TRAVERSAL found the cluster".
    val entryOnly = VectorQueries.graphTop10(spark, sf, rounds = 0)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val entryRecall = (entryOnly & brute).size
    info(s"entry-only recall@10 = $entryRecall/10")
    assert(entryRecall < 8,
      s"entry alone must NOT clear the floor (got $entryRecall) — " +
        "otherwise the gate never exercises traversal")
    assert(entryOnly.size <= 4, s"rounds=0 must visit only the seeds: $entryOnly")
  }

  test("gate row is deterministic and true") {
    val rows = SparkEntry.queries("q_knn_graph")(spark, sf).collect()
    assert(rows.length == 1 && rows(0).getBoolean(3),
      s"recall_ok must hold: ${rows.toSeq}")
    val again = SparkEntry.queries("q_knn_graph")(spark, sf).collect()
    assert(again.toSeq.toString === rows.toSeq.toString)
  }
}
