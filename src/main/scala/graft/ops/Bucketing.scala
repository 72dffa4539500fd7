package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (co-located) joins — the last deferred scale item from
  * SURVEY.md §7.3.1.
  *
  * A big–big equi-join normally shuffles BOTH sides on the join key
  * every time it runs. Writing each side once as a bucketed table
  * (`bucketBy(n, key)`) makes the on-disk layout itself hash-partitioned
  * on the key, so every later join (or aggregation) on that key reads
  * the buckets co-located and the plan has ZERO Exchange nodes — the
  * shuffle is paid once at write time and amortized over every query.
  * At 100 TB this is the difference between re-shuffling the fact table
  * per query and never shuffling it at all; the bucket count would be
  * sized to the cluster (e.g. 4096), here it is caller-chosen.
  *
  * The reference has no analogous feature (its pages are keyed by
  * series, not join key); this is part of the engine's Spark-first
  * scale posture, like `Joins.saltedJoin`.
  */
object Bucketing {

  /** Write `df` as a managed parquet table bucketed AND sorted by
    * `keys`. Overwrite-idempotent: re-running replaces the table.
    */
  def saveBucketed(df: DataFrame, table: String, keys: Seq[String],
                   numBuckets: Int): Unit = {
    require(keys.nonEmpty, "bucketing needs at least one key")
    require(numBuckets > 0, "numBuckets must be positive")
    df.write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)
  }

  /** Join two tables previously written with [[saveBucketed]] on the
    * same keys and bucket count. The `merge` hint pins sort-merge (the
    * strategy whose required distribution the bucketed layout already
    * satisfies), so the planner neither broadcasts the smaller side nor
    * inserts an Exchange — callers asserting exchange-free plans get a
    * deterministic shape regardless of table size.
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   leftKeys: Seq[String], rightKeys: Seq[String],
                   joinType: String = "inner"): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    val cond = leftKeys.zip(rightKeys)
      .map { case (lk, rk) => l(lk) === r(rk) }
      .reduce(_ && _)
    l.hint("merge").join(r, cond, joinType)
  }
}
