package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join helpers for skewed workloads (SURVEY.md §2.2 / 100 TB posture).
  *
  * AQE's skew-join split handles most cases automatically; `saltedJoin`
  * is the explicit fallback for joins AQE cannot split (e.g. when the
  * skew is on the build side of a non-broadcast join, or under
  * `foreachBatch` where per-batch AQE re-planning is cold each time).
  */
object Joins {

  /** Equi-join with key salting: the left (large, skewed) side gets a
    * deterministic per-row salt in [0, saltFactor); the right side is
    * exploded `saltFactor`× so every (key, salt) pair finds its match.
    * The result is row-identical to the plain equi-join — salting only
    * changes the shuffle distribution, splitting each hot key across
    * `saltFactor` reducers.
    *
    * Cost: right side duplicated `saltFactor`× — use for big-big joins
    * where the right side is the smaller (but not broadcastable) input.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    // Right/full outer joins would emit one null-padded row per
    // unmatched SALT COPY of a right row (saltFactor× duplication);
    // swap the sides and use a left join instead.
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti", "cross")
        .contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports inner/left/semi/anti/cross join types, not $joinType")
    // Deterministic salt from the full left row (not rand(): results
    // must be reproducible run-to-run).
    val leftSalt = pmod(hash(left.columns.map(col).toSeq: _*), lit(saltFactor))
    val l = left.withColumn("_salt", leftSalt)
    val r = right.withColumn("_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    l.join(r, keys :+ "_salt", joinType).drop("_salt")
  }

  /** Broadcast-hint helper with a size guard: broadcast the right side
    * only when its row count is below `maxRows` (a driver-side count on
    * the SMALL side only — never the large input).
    */
  def broadcastIfSmall(right: DataFrame, maxRows: Long = 1000000L): DataFrame = {
    val probe = math.min(maxRows + 1, Int.MaxValue.toLong).toInt
    if (right.limit(probe).count() <= maxRows) broadcast(right) else right
  }

  /** Range-bucketed join: equi-join on a coarse bucket of a time column
    * plus a residual range predicate — turns a pure theta join
    * (cartesian at scale) into an equi-join shuffle. Correct for ANY
    * residual with `|leftTs − rightTs| ≤ maxSpanSec`: the left side
    * probes its own bucket plus both adjacent buckets, so matches in
    * either time direction are found.
    */
  def bucketedRangeJoin(left: DataFrame, right: DataFrame,
                        leftTs: String, rightTs: String,
                        maxSpanSec: Long, residual: Column): DataFrame = {
    val lBucket = floor(unix_timestamp(col(leftTs)).cast("double") / maxSpanSec).cast("long")
    val lb = left.withColumn("_b",
      explode(array(lBucket - 1, lBucket, lBucket + 1)))
    val rb = right.withColumn("_b",
      floor(unix_timestamp(col(rightTs)).cast("double") / maxSpanSec).cast("long"))
    lb.join(rb, lb("_b") === rb("_b") && residual).drop("_b")
  }
}
