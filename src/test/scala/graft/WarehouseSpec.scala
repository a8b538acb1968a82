package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.WarehouseQueries

/**
 * Warehouse / layout lane: differential checks (salted join vs plain
 * join, Welford-over-window vs var_samp) plus the plan/semantics facts
 * each operator's 100 TB story rests on (dimension bounding for
 * Z-order, broadcast-not-window for feature scaling, SMJ for the
 * salted join, recursion depth for the calendar spine).
 */
class WarehouseSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark
  private val sf = GraftSpark.sf

  private def run(name: String) = WarehouseQueries.queries(name)(spark, sf)

  private def collectPlan(p: SparkPlan): Seq[SparkPlan] = {
    val self = p match {
      case a: AdaptiveSparkPlanExec => collectPlan(a.executedPlan)
      case other => Seq(other)
    }
    self ++ p.children.flatMap(collectPlan) ++
      p.subqueries.flatMap(collectPlan)
  }

  test("q_salted_join equals the plain unsalted join") {
    val salted = run("q_salted_join").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val fact = Tables.lineitem(spark, sf).select(
      when(col("l_linenumber") === 1, 0L).otherwise(col("l_orderkey")).as("k"),
      col("l_quantity"), col("l_returnflag"))
    val dim = Tables.orders(spark, sf)
      .select(col("o_orderkey").as("k"), col("o_totalprice").as("price"))
      .unionAll(spark.range(1).select(lit(0L).as("k"), lit(100.0).as("price")))
    val plain = fact.join(dim, "k")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        round(sum(col("l_quantity") * col("price")) / 1e6, 2).as("w"))
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(salted.toSeq == plain.toSeq)
  }

  test("q_salted_join plans a shuffle join, not a broadcast (the skew story)") {
    val plan = run("q_salted_join").queryExecution.executedPlan
    val ops = collectPlan(plan).map(_.getClass.getSimpleName)
    assert(ops.exists(_.contains("SortMergeJoin")),
      s"expected SortMergeJoin in: $ops")
  }

  test("q_window_udaf: Welford frame variance equals builtin var_samp everywhere") {
    val rows = run("q_window_udaf").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val wf = Option(r.get(3)).map(_.asInstanceOf[Double])
      val vs = Option(r.get(4)).map(_.asInstanceOf[Double])
      assert(wf == vs, s"welford=$wf builtin=$vs at row $r")
    }
  }

  test("q_zorder_layout: z-buckets bound BOTH dimensions, linear only one") {
    // needs sf0.01: at sf0.001 the suppkey domain (~10 keys) is smaller
    // than one 64-wide z-cell, so every layout trivially bounds it
    val rows = WarehouseQueries.queries("q_zorder_layout")(spark, "/root/testdata/sf0.01").collect()
      .map(r => (r.getString(0), r.getLong(2),
        r.getLong(4) - r.getLong(3), r.getLong(6) - r.getLong(5)))
    val (z, lin) = rows.partition(_._1 == "zorder")
    assert(z.nonEmpty && lin.nonEmpty)
    // 16 z-buckets tile the 256x256 grid into 64x64 cells: every
    // z-bucket's span in EACH dim is < 64; a linear bucket spans the
    // full 256 range of the second dim (given enough rows to fill it).
    z.foreach { case (_, _, pSpan, sSpan) =>
      assert(pSpan < 64 && sSpan < 64, s"z-bucket spans p=$pSpan s=$sSpan")
    }
    val maxLinS = lin.map(_._4).max
    assert(maxLinS > 64, s"linear layout should leave suppkey unbounded, max span $maxLinS")
  }

  test("q_feature_scale broadcasts the stats agg — no Window operator") {
    val plan = run("q_feature_scale").queryExecution.executedPlan
    val ops = collectPlan(plan).map(_.getClass.getSimpleName)
    assert(ops.exists(_.contains("BroadcastHashJoin")), s"no broadcast in $ops")
    assert(!ops.exists(_.contains("WindowExec")), s"unexpected window in $ops")
  }

  test("q_feature_scale: zscore mean ~0 and minmax within [0,1] per segment") {
    val rows = run("q_feature_scale").collect()
      .map(r => (r.getString(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, mm) => assert(mm >= 0.0 && mm <= 1.0) }
  }

  test("q_drift_psi: finite PSI and halves partition the stream") {
    val rows = run("q_drift_psi").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val total = rows.map(r => r._2 + r._3).sum
    val nEvents = Tables.events(spark, sf).count()
    assert(total == nEvents)
    rows.foreach { case (t, a, b, psi) =>
      assert(a > 0 && b > 0, s"empty half for $t")
      assert(!psi.isNaN && !psi.isInfinite)
      assert(psi >= 0.0, s"PSI contribution is non-negative, got $psi for $t")
    }
  }

  test("q_scd2_dimension: versions are contiguous and change-compressed") {
    val rows = run("q_scd2_dimension").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getAs[java.time.LocalDateTime](3),
        Option(r.getAs[java.time.LocalDateTime](5))))
    rows.groupBy(_._1).foreach { case (cust, vs) =>
      val sorted = vs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.size).toSeq,
        s"non-contiguous versions for $cust")
      // consecutive versions differ in the tracked attribute
      sorted.toSeq.sliding(2).foreach {
        case Seq(a, b) =>
          assert(a._3 != b._3, s"uncompressed run for $cust at v${b._2}")
          // validity chain: effective_to of v equals effective_from of v+1
          assert(a._5.contains(b._4), s"broken validity chain for $cust")
        case _ =>
      }
      assert(sorted.last._5.isEmpty, s"current version must be open-ended for $cust")
    }
  }

  test("q_scd2_lookup matches a per-customer sequential timeline scan") {
    val got = run("q_scd2_lookup").collect()
      .map(r => (Option(r.getString(0)), r.getLong(1))).toMap
    // driver-side recompute: walk each customer's (date, key, prio)
    // observations in order, compress to version starts, then binary-
    // search each lineitem's shipdate against the starts
    val orders = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getAs[java.time.LocalDateTime](2), r.getString(3)))
    val custOf = orders.map(o => o._1 -> o._2).toMap
    val timeline: Map[Long, Seq[(java.time.LocalDateTime, String)]] =
      orders.groupBy(_._2).view.mapValues { os =>
        val sorted = os.sortBy(o => (o._3.toString, o._1))
        val starts = scala.collection.mutable.ArrayBuffer.empty[(java.time.LocalDateTime, String)]
        var prev: String = null
        sorted.foreach { o =>
          if (o._4 != prev) { starts += ((o._3, o._4)); prev = o._4 }
        }
        starts.toSeq
      }.toMap
    val lineitems = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_shipdate").collect()
      .map(r => (r.getLong(0), r.getAs[java.time.LocalDateTime](1)))
    val want = scala.collection.mutable.Map.empty[Option[String], Long]
      .withDefaultValue(0L)
    lineitems.foreach { case (ok, ship) =>
      val versions = timeline(custOf(ok))
      val inEffect = versions.takeWhile(v => !v._1.isAfter(ship)).lastOption
      want(inEffect.map(_._2)) += 1
    }
    assert(got.view.mapValues(identity).toMap == want.toMap)
  }

  test("q_group_sample: contiguous ranks, bounded size, rerun-identical") {
    val q = graft.queries.CurationQueries.queries("q_group_sample")
    val rows = q(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val perLang = Tables.documents(spark, sf).groupBy("lang").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1 to rs.length).toSeq)
      assert(rs.length == math.min(50, perLang(lang)))
      assert(rs.map(_._3).distinct.length == rs.length)
    }
    val rerun = q(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(rows.toSeq == rerun.toSeq)
  }

  test("q_interval_overlap: binned equi-join equals direct overlap scan") {
    val got = run("q_interval_overlap").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val day = 86400L
    val orders = Tables.orders(spark, sf)
      .select(col("o_orderkey"), unix_date(col("o_orderdate").cast("date")).cast("long").as("dd"))
      .collect().map(r => (r.getLong(1) * day, r.getLong(1) * day + 10 * day))
    val parts = Tables.part(spark, sf).select("p_partkey").collect()
      .map(_.getLong(0)).filter(_ % 5 == 0)
    val want = parts.map { p =>
      val cs = 788918400L + (p % 700) * day
      val ce = cs + 14 * day
      p -> orders.count { case (os, oe) => os < ce && cs < oe }.toLong
    }.filter(_._2 > 0).toMap
    assert(got == want)
  }

  test("q_recursive_cte: one row per month between order bounds, counts total") {
    val rows = run("q_recursive_cte").collect()
    val n = rows.length
    assert(rows.map(_.getInt(1)).toSeq == (0 until n).toSeq)
    val totalOrders = rows.map(_.getLong(2)).sum
    assert(totalOrders == Tables.orders(spark, sf).count())
  }

  test("q_entropy_quality: entropy bounded by ln(n_types), ttr in (0,1]") {
    val rows = run("q_entropy_quality").collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (nTok, nTyp, ent, ttr) =>
      // +5e-5: the query rounds entropy to 4 decimals, which can tip it
      // just past the exact ln(n_types) ceiling
      assert(ent >= -1e-9 && ent <= math.log(nTyp.toDouble) + 5e-5,
        s"entropy $ent outside [0, ln($nTyp)]")
      assert(ttr > 0.0 && ttr <= 1.0)
      assert(nTyp <= nTok)
    }
  }

  test("q_deletion_vectors: base untouched, sidecar tiny, deletes merged at read") {
    val rows = run("q_deletion_vectors").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(4), "base files changed — the delete rewrote data")
    }
    // the economics that justify the mechanism: the sidecar is a
    // fraction of the base bytes (here <5%; at 100 TB it's ~0.0001%)
    def bytesUnder(p: String): Long = {
      val fs = org.apache.hadoop.fs.FileSystem
        .get(spark.sparkContext.hadoopConfiguration)
      val path = new org.apache.hadoop.fs.Path(p)
      fs.listStatus(path).filter(_.isFile).map(_.getLen).sum
    }
    val baseSz = bytesUnder(graft.GraftIO.root + "/delvec/data")
    val dvSz = bytesUnder(graft.GraftIO.root + "/delvec/deletes")
    assert(dvSz * 20 < baseSz, s"sidecar $dvSz not small vs base $baseSz")
    // merge-on-read, not rewrite: the BASE still physically holds every
    // deleted row, and the sidecar covers exactly that set
    val nDeleted = rows.head.getLong(3)
    val stillInBase = spark.read.parquet(graft.GraftIO.root + "/delvec/data")
      .filter(col("o_orderkey") % 1000 === 7).count()
    assert(stillInBase === nDeleted,
      "deleted rows missing from base — a rewrite happened")
    assert(spark.read.parquet(graft.GraftIO.root + "/delvec/deletes").count() === nDeleted)
    val nLive = rows.map(_.getLong(1)).sum
    val total = Tables.orders(spark, sf).count()
    assert(nLive + nDeleted === total, "live + deleted != base rows")
  }

  test("q_xml_funcs roundtrip preserves key/status/price exactly") {
    val got = run("q_xml_funcs").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    val want = Tables.orders(spark, sf)
      .filter(col("o_orderkey") % 11 === 0)
      .select(col("o_orderkey"), col("o_orderstatus"), round(col("o_totalprice"), 2))
      .orderBy("o_orderkey").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(0)))
    assert(got.toSeq == want.toSeq)
  }
}
