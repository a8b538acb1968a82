package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Joins

/** saltedJoin must be result-identical to the plain equi-join while
  * spreading each key over `buckets` reducer partitions. */
class SaltedJoinSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark
  import spark.implicits._

  test("salted join == plain join on lineitem x orders") {
    val li = Tables.lineitem(spark, GraftSpark.sf)
    val ord = Tables.orders(spark, GraftSpark.sf)
      .withColumnRenamed("o_orderkey", "l_orderkey")
      .select("l_orderkey", "o_orderpriority")

    val plain = li.join(ord, "l_orderkey")
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"),
        round(sum("l_extendedprice"), 2).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet

    val salted = Joins.saltedJoin(li, ord, "l_orderkey",
        xxhash64($"l_partkey", $"l_linenumber"), 8)
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"),
        round(sum("l_extendedprice"), 2).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet

    assert(salted === plain)
  }

  test("salting actually spreads a hot key across buckets") {
    val hot = Seq.fill(1000)(1L).toDF("k")
      .withColumn("payload", monotonically_increasing_id())
    val dim = Seq((1L, "x")).toDF("k", "v")
    val salted = Joins.saltedJoin(hot, dim, "k", xxhash64($"payload"), 8)
    assert(salted.count() === 1000L)
    // distinct salt values the hot key was spread over
    val spread = hot.select(pmod(xxhash64($"payload"), lit(8L)).cast("int").as("s"))
      .distinct().count()
    assert(spread >= 6, s"hot key landed in only $spread of 8 buckets")
  }
}
