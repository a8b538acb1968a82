package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.RelationalQueries

/**
 * q_fuzzy_join: the PassJoin-blocked edit-distance join checked against
 * a driver-side brute force (every probe × every canon, classic DP
 * Levenshtein) — if either blocking channel dropped a real pair, the
 * brute force has it and the comparison fails. Also pins the planted
 * classes: every single-substitution probe (custkey%7==3) must match
 * its own canon at distance 1, and every double-substitution negative
 * control (custkey%7==5, one edit per half) must be absent.
 */
class FuzzyJoinSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark
  private val sf = GraftSpark.sf

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def lev(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = dp(0); dp(0) = j
      for (i <- 1 to a.length) {
        val cur = dp(i)
        dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(a.length)
  }

  test("q_fuzzy_join equals the brute force and pins the planted classes") {
    val keys = Tables.customer(spark, sf).select("c_custkey")
      .collect().map(_.getLong(0)).sorted
    val canon = keys.map(k => k -> md5hex(s"ent:$k").take(12)).toMap
    def sub(name: String, pos: Int) = // 1-based, hex never contains 'x'
      name.substring(0, pos - 1) + "x" + name.substring(pos)
    val probes =
      keys.filter(_ % 7 == 3).map { k =>
        (k, sub(canon(k), (k % 12).toInt + 1))
      } ++ keys.filter(_ % 7 == 5).map { k =>
        val m = (k % 6).toInt
        (k, sub(sub(canon(k), m + 1), m + 7))
      }
    val brute = (for {
      (pk, pn) <- probes
      (ck, cn) <- canon
      d = lev(pn, cn) if d <= 1
    } yield (pk, ck, d)).toSet

    val got = RelationalQueries.queries("q_fuzzy_join")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(4))).toSet
    assert(got === brute, "blocked join != brute force")

    val planted = keys.filter(_ % 7 == 3).toSet
    planted.foreach { k =>
      assert(got.contains((k, k, 1)), s"planted typo $k not matched")
    }
    val negatives = keys.filter(_ % 7 == 5).toSet
    assert(got.forall { case (pk, _, _) => !negatives(pk) },
      "a double-substitution negative control matched at ED<=1")
    assert(got.forall(_._3 == 1), "self-pairs at distance 0 should not exist")
  }

  test("q_fuzzy_join_ed2 equals the brute force and pins every planted family") {
    val keys = Tables.customer(spark, sf).select("c_custkey")
      .collect().map(_.getLong(0)).sorted
    val canon = keys.map(k => k -> md5hex(s"ent:$k").take(12)).toMap
    def sub(name: String, pos: Int) =
      name.substring(0, pos - 1) + "x" + name.substring(pos)
    def del(name: String, pos: Int) =
      name.substring(0, pos - 1) + name.substring(pos)
    def ins(name: String, pos: Int) = // 'x' after position pos (0 = prefix)
      name.substring(0, pos) + "x" + name.substring(pos)
    // the six probe families, driver-side twins of the query synthesis
    val probes =
      keys.filter(_ % 11 == 3).map(k => (k, sub(canon(k), (k % 12).toInt + 1))) ++
      keys.filter(_ % 11 == 4).map(k => (k, del(canon(k), (k % 12).toInt + 1))) ++
      keys.filter(_ % 11 == 5).map(k => (k, ins(canon(k), (k % 12).toInt))) ++
      keys.filter(_ % 11 == 6).map { k =>
        val c = canon(k)
        // deletion in seg 1, then substitution at original 10+(k%3)
        val afterDel = del(c, (k % 4).toInt + 1) // len 11
        // original position 10+(k%3) sits at 9+(k%3) after the deletion
        (k, sub(afterDel, 9 + (k % 3).toInt))
      } ++
      keys.filter(_ % 11 == 7).map { k =>
        val m = (k % 4).toInt
        (k, sub(sub(sub(canon(k), m + 1), m + 5), m + 9)) // ED=3 control
      } ++
      keys.filter(_ % 11 == 8).map(k => (k, del(del(canon(k), 7), 2)))
    // planted-distance sanity of the driver synthesis itself
    probes.foreach { case (k, pn) =>
      val expected = (k % 11).toInt match {
        case 3 | 4 | 5 => 1
        case 6 | 8 => 2
        case 7 => 3
      }
      assert(lev(pn, canon(k)) === expected,
        s"family ${k % 11} probe $k has wrong planted distance")
    }

    val brute = (for {
      (pk, pn) <- probes
      (ck, cn) <- canon
      dd = lev(pn, cn) if dd <= 2
    } yield (pk, ck, dd)).toSet
    val got = RelationalQueries.queries("q_fuzzy_join_ed2")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(4))).toSet
    assert(got === brute, "blocked tau=2 join != brute force")

    // every positive family matches its own canon at its planted distance
    Seq(3L -> 1, 4L -> 1, 5L -> 1, 6L -> 2, 8L -> 2).foreach { case (f, dd) =>
      keys.filter(_ % 11 == f).foreach { k =>
        assert(got.contains((k, k, dd)), s"family $f probe $k not matched at ED=$dd")
      }
    }
    // the ED=3 control never matches anything
    val negatives = keys.filter(_ % 11 == 7).toSet
    assert(got.forall { case (pk, _, _) => !negatives(pk) },
      "an ED=3 negative control matched at ED<=2")
  }
}
