package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew-mitigation join helpers (the "salting for skew" scale path; AQE's
 * runtime skew-join split covers sort-merge joins automatically, salting
 * is the declarative fallback for pathological keys or non-SMJ shapes).
 */
object Joins {

  /**
   * Equi-join where `left`'s hot keys are spread over `buckets` salt
   * buckets and `right` is replicated once per bucket, so one pathological
   * key no longer lands on one reducer.
   *
   * `salt` must be a deterministic column over `left` (e.g.
   * `xxhash64(col("some_high_card_col"))`) — rand() would break retries
   * and plan reuse. Result is identical to `left.join(right, key)`:
   * every (key, salt) pair meets the replicated right exactly once.
   *
   * Cost model: right side grows ×buckets (use only when right is the
   * small side — the usual shape, since skew lives in the big fact).
   */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salt: Column, buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val saltedLeft = left.withColumn("__graft_salt",
      pmod(salt, lit(buckets.toLong)).cast("int"))
    val saltedRight = right.withColumn("__graft_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedLeft.join(saltedRight, Seq(key, "__graft_salt"))
      .drop("__graft_salt")
  }
}
