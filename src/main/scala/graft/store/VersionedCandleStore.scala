package graft.store

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Candle

/** Append-only, versioned candle store: every commit stamps its rows
  * with a monotonically increasing `tx_id`, and reads reconstruct the
  * table AS OF any transaction — the Spark-native materialization of
  * the reference's `LastTxId` versioning (`page/header.go:13-23`: every
  * page records the last transaction applied to it) and its persistent
  * tx counter (`wal/counter.go:13-94`), which [[CandleStore]]'s
  * overwrite-in-place upsert deliberately flattens away.
  *
  * Layout: `path/data` is the same Hive-partitioned Parquet layout as
  * [[CandleStore]] plus a `tx_id` data column (row-group stats prune
  * as-of filters); `path/_txlog` is a tiny append-only journal with one
  * row per commit — the persistent-counter analog: `latestTxId` reads
  * the journal, never the data.
  *
  * Scale posture (100 TB): commits are pure appends of the deduped
  * batch (no read-modify-write of existing partitions at all — cheaper
  * than [[CandleStore.upsert]]); the cost moves to reads, which fold
  * history with one hash aggregation over the partitions they scan.
  * [[compact]] bounds that fold: it squashes history up to the latest
  * tx back to one version per key. The classic LSM trade, chosen per
  * table by how history-hungry its readers are.
  */
final class VersionedCandleStore(spark: SparkSession, val path: String) {

  private val dataPath = s"$path/data"
  private val txLogPath = s"$path/_txlog"

  private def exists(p: String): Boolean = {
    val hp = new org.apache.hadoop.fs.Path(p)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(hp) && fs.listStatus(hp).nonEmpty
  }

  /** Highest committed tx id (0 when empty) — journal-only read. */
  def latestTxId: Long =
    if (!exists(txLogPath)) 0L
    else spark.read.parquet(txLogPath).agg(max("tx_id")).head().getLong(0)

  /** The commit journal: (tx_id, n_rows) per commit, the reference's
    * persistent counter + WAL index analog.
    */
  def txLog(): DataFrame =
    if (!exists(txLogPath))
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("tx_id",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("n_rows",
            org.apache.spark.sql.types.LongType, nullable = false))))
    else spark.read.parquet(txLogPath)

  /** Commit one batch as the next transaction; returns its tx id.
    * Within-batch duplicates resolve exactly as [[CandleStore.upsert]]
    * (higher ordinal wins, else content tie-break); cross-batch
    * last-wins happens at read time via tx ordering.
    */
  def commit(batch: DataFrame, ordinalCol: Option[String] = None): Long = {
    val tx = latestTxId + 1
    val contentStruct = struct(col("open"), col("high"), col("low"),
      col("close"), col("volume"), col("bit_fields"))
    val batchOrd = ordinalCol.map(c => col(c).cast("long")).getOrElse(lit(0L))
    val deduped = batch
      .withColumn("ts", date_trunc("second", col("ts")).cast("timestamp"))
      .withColumn("year", year(col("ts")))
      .withColumn("_ord", batchOrd)
      .withColumn("_c", contentStruct)
      .drop(ordinalCol.toSeq: _*)
      .groupBy((Candle.keyCols ++ Seq("ts", "year")).map(col): _*)
      .agg(max_by(col("_c"), struct(col("_ord"), col("_c"))).as("_w"))
      .select("market", Candle.keyCols.tail ++ Seq("ts", "year", "_w.*"): _*)
      .withColumn("tx_id", lit(tx))
    val written = CandleStore.withMicrosTimestamps(deduped) {
      deduped
        .hint("rebalance", Candle.partitionCols: _*)
        .sortWithinPartitions((Candle.partitionCols :+ "ts").map(col): _*)
        .write
        .partitionBy(Candle.partitionCols: _*)
        .mode(SaveMode.Append)
        .parquet(dataPath)
      deduped.count()
    }
    // Journal entry AFTER the data append: a torn commit (data written,
    // journal not) is invisible to readers that resolve `latestTxId`
    // from the journal and filter `tx_id <= latest` — redo-on-retry
    // converges, mirroring the reference's committed-only replay
    // (`wal/flusher.go:110-128`).
    import spark.implicits._
    Seq((tx, written)).toDF("tx_id", "n_rows")
      .coalesce(1).write.mode(SaveMode.Append).parquet(txLogPath)
    tx
  }

  /** The table as of transaction `txId` (inclusive): per (series key,
    * ts), the row from the highest tx ≤ txId wins. One hash aggregation
    * (map-side combine), no sort window; commits dedup within batch, so
    * (key, ts, tx_id) is unique and the fold is deterministic.
    */
  def scanAsOf(txId: Long): DataFrame = {
    val contentStruct = struct(col("open"), col("high"), col("low"),
      col("close"), col("volume"), col("bit_fields"))
    spark.read.parquet(dataPath)
      // journal-gated: ignore data from torn commits beyond the journal
      .where(col("tx_id") <= least(lit(txId), lit(latestTxId)))
      .withColumn("_c", contentStruct)
      .groupBy((Candle.keyCols ++ Seq("ts", "year")).map(col): _*)
      .agg(max_by(col("_c"), col("tx_id")).as("_w"))
      .select("market", Candle.keyCols.tail ++ Seq("ts", "year", "_w.*"): _*)
  }

  /** Latest committed state. */
  def scan(): DataFrame = scanAsOf(Long.MaxValue)

  /** Squash history: rewrite the data to exactly one version per key at
    * `latestTxId` (the reference's WAL group flush, op M3 — fold
    * accumulated log into clean pages). As-of reads earlier than the
    * squash point afterwards see the squashed state; the journal is
    * kept, so tx ids keep increasing monotonically.
    */
  def compact(): Long = {
    val latest = latestTxId
    if (latest == 0L) return 0L
    val squashed = scanAsOf(latest).withColumn("tx_id", lit(latest))
    val tmp = s"$path/_compact-$latest"
    CandleStore.withMicrosTimestamps(squashed) {
      squashed
        .hint("rebalance", Candle.partitionCols: _*)
        .sortWithinPartitions((Candle.partitionCols :+ "ts").map(col): _*)
        .write.partitionBy(Candle.partitionCols: _*)
        .mode(SaveMode.Overwrite).parquet(tmp)
    }
    val fs = new org.apache.hadoop.fs.Path(dataPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dataPath), true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), new org.apache.hadoop.fs.Path(dataPath))
    latest
  }
}

object VersionedCandleStore {
  def apply(spark: SparkSession, path: String): VersionedCandleStore =
    new VersionedCandleStore(spark, path)
}
