package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.RelationalQueries

/**
 * Driver-side differential for the derived-partsupp TPC-H rows
 * (q_tpch_q2 / q_tpch_q11): recompute the partsupp synthesis formulas
 * and the spec-shaped logic in plain single-threaded Scala over the
 * sf0.001 dims and compare row-for-row — an oracle independent of BOTH
 * Spark and DuckDB — plus pin the structural invariants the queries
 * rely on (4 distinct candidate suppliers per part, tie-free
 * within-part supply costs, so Q2's min join-back can never fan out).
 */
class PartsuppTpchSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark
  private val sf = GraftSpark.sf

  // the derivedPartsupp formulas, reimplemented from the doc comment
  private case class Ps(partkey: Long, suppkey: Long, availqty: Long,
      costcents: Long) {
    def supplycost: Double = costcents / 100.0
  }
  private def partsupp(partkeys: Seq[Long], nSupp: Long): Seq[Ps] =
    for { p <- partkeys; j <- 0L to 3L } yield
      Ps(p, (p * 7 + j * 13) % nSupp, (p * 11 + j * 17) % 50 + 1,
        (p * 31 + j * 47) % 10000 + 100)

  private lazy val parts = spark.read.parquet(s"$sf/part.parquet")
    .select("p_partkey", "p_brand", "p_type", "p_size").collect()
    .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getInt(3)))
  private lazy val suppliers = spark.read.parquet(s"$sf/supplier.parquet")
    .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal").collect()
    .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getDouble(3)))
  private lazy val nationRegion: Map[Int, (String, Int)] =
    spark.read.parquet(s"$sf/nation.parquet").collect()
      .map(r => r.getInt(0) -> (r.getString(1), r.getInt(2))).toMap
  private lazy val europeRegionKey: Int =
    spark.read.parquet(s"$sf/region.parquet").collect()
      .find(_.getString(1) == "EUROPE").get.getInt(0)
  private lazy val europeSupp: Set[Long] = suppliers.collect {
    case (sk, _, nk, _) if nationRegion(nk)._2 == europeRegionKey => sk
  }.toSet

  test("every part gets 4 distinct candidate suppliers with tie-free costs") {
    val ps = partsupp(parts.map(_._1), suppliers.length.toLong)
    ps.groupBy(_.partkey).foreach { case (p, rows) =>
      assert(rows.map(_.suppkey).distinct.size === 4,
        s"part $p must have 4 distinct suppliers")
      assert(rows.map(_.costcents).distinct.size === 4,
        s"part $p must have 4 distinct supply costs (Q2 tie-freedom)")
      assert(rows.forall(r => r.suppkey >= 0 && r.suppkey < suppliers.length))
      assert(rows.forall(r => r.availqty >= 1 && r.availqty <= 50))
    }
  }

  test("q_tpch_q2 equals the driver-side correlated-min recomputation") {
    val ps = partsupp(parts.map(_._1), suppliers.length.toLong)
    val suppByKey = suppliers.map(s => s._1 -> s).toMap
    val filtered = parts.filter(p => p._3 == "STANDARD" && p._4 <= 25)
    val expected = filtered.flatMap { case (pk, brand, _, _) =>
      val elig = ps.filter(r => r.partkey == pk && europeSupp(r.suppkey))
      if (elig.isEmpty) None
      else {
        val m = elig.minBy(_.costcents)
        val (_, sname, nk, bal) = suppByKey(m.suppkey)
        Some((bal, sname, nationRegion(nk)._1, pk, brand, m.supplycost))
      }
    }.sortBy(t => (-t._1, t._3, t._2, t._4)).take(100).toSeq
    val got = RelationalQueries.queries("q_tpch_q2")(spark, sf).collect()
      .map(r => (r.getDouble(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getString(4), r.getDouble(5))).toSeq
    assert(got === expected)
    assert(got.map(_._4).distinct.size === got.size,
      "one row per part: a within-part cost tie would fan the join out")
  }

  test("q_tpch_q11 equals the driver-side global-share recomputation") {
    val ps = partsupp(parts.map(_._1), suppliers.length.toLong)
    val byPart = ps.filter(r => europeSupp(r.suppkey))
      .groupBy(_.partkey)
      .map { case (p, rows) =>
        p -> rows.map(r => r.availqty * r.costcents).sum }
    val total = byPart.values.sum
    val n = byPart.size.toLong
    val expected = byPart.toSeq
      .filter { case (_, v) => v * n * 2 > total * 3 }
      .map { case (p, v) =>
        (p, BigDecimal(v / 100.0).setScale(4,
          BigDecimal.RoundingMode.HALF_UP).toDouble) }
      .sortBy { case (p, v) => (-v, p) }
    val got = RelationalQueries.queries("q_tpch_q11")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got === expected)
    assert(got.nonEmpty && got.size < n,
      "the threshold must genuinely split the parts (non-vacuous gate)")
  }
}
