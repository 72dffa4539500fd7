package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series operators over event/candle data.
  *
  * The reference stores raw bars and leaves analytics to callers; these
  * are the operations its data model exists to serve (`CandleLength` at
  * `page/index.go:22`, daily prefix-sum index at `page/index.go:11-17`).
  * All are single-shuffle, partition-parallel plans — no driver loops, no
  * collects — so they hold at 100 TB given a sane partitioning of the
  * input (series key and/or time).
  */
object TimeSeries {

  /** Epoch-second bucket start for a tumbling window of `widthSec`.
    * BIGINT (not a window struct) so results stay engine-portable.
    * `floor` (not cast-truncation) so pre-1970 timestamps bucket
    * correctly: epoch -1800 at width 3600 → -3600, matching
    * `date_trunc`, where truncation toward zero would give 0.
    */
  def bucketStart(ts: Column, widthSec: Long): Column =
    floor(unix_timestamp(ts).cast("double") / widthSec).cast("long") * widthSec

  /** Resample raw ticks/events into OHLCV candles of `widthSec` per key:
    * open = value at min ts, high = max, low = min, close = value at max
    * ts, volume = sum, n = count. One partial-aggregated shuffle on
    * (keys, bucket) — map-side combine keeps it scan-bound at scale.
    *
    * Determinism note: open/close pick the value at the extreme
    * timestamp; if two ticks share (keys, tsCol) exactly, the pick among
    * them is arbitrary — feed unique timestamps per key (exchange feeds
    * are) or pre-aggregate duplicates first.
    */
  def candlesFromTicks(ticks: DataFrame, tsCol: String, valueCol: String,
                       volumeCol: Option[String], keys: Seq[String],
                       widthSec: Long): DataFrame = {
    val v = col(valueCol)
    val vol = volumeCol.map(c => sum(col(c))).getOrElse(count(lit(1)).cast("double"))
    ticks
      .withColumn("bucket", bucketStart(col(tsCol), widthSec))
      .groupBy((keys.map(col) :+ col("bucket")): _*)
      .agg(
        min_by(v, col(tsCol)).as("open"),
        max(v).as("high"),
        min(v).as("low"),
        max_by(v, col(tsCol)).as("close"),
        vol.as("volume"),
        count(lit(1)).as("n"))
  }

  /** Re-aggregate candles to a coarser bar length (1m→5m/1h/1d): open =
    * open of earliest bar, high = max(high), low = min(low), close =
    * close of latest bar, volume = sum (`page/header.go:17` semantics —
    * a candle of length L covers [bucket, bucket+L)).
    */
  def resampleCandles(candles: DataFrame, tsCol: String, toWidthSec: Long,
                      keys: Seq[String]): DataFrame =
    candles
      .withColumn("bucket", bucketStart(col(tsCol), toWidthSec))
      .groupBy((keys.map(col) :+ col("bucket")): _*)
      .agg(
        min_by(col("open"), col(tsCol)).as("open"),
        max("high").as("high"),
        min("low").as("low"),
        max_by(col("close"), col(tsCol)).as("close"),
        sum("volume").as("volume"))

  /** As-of join: for each left row, the latest right row with
    * `right.ts <= left.ts`, matched per `by` key. Implemented as
    * union + last(ignoreNulls) over one window — a SINGLE shuffle on the
    * key, instead of the naive range-join (which explodes at scale).
    * Right rows at exactly-equal ts are visible to the left row.
    *
    * @param valueCols right columns to carry; emitted as `asof_<name>`.
    */
  def asofJoin(left: DataFrame, right: DataFrame, by: Seq[String],
               leftTs: String, rightTs: String,
               valueCols: Seq[String]): DataFrame =
    asofJoinOpts(left, right, by, leftTs, rightTs, valueCols)

  /** As-of join with direction and tolerance.
    *
    * @param forward false = nearest right row at-or-BEFORE the left ts
    *   (default; mora-style latest-candle lookup); true = nearest
    *   at-or-AFTER.
    * @param toleranceSec when set, matches farther than this many
    *   seconds from the left ts resolve to NULL (pandas merge_asof
    *   semantics). Applied on whole-second differences.
    */
  def asofJoinOpts(left: DataFrame, right: DataFrame, by: Seq[String],
                   leftTs: String, rightTs: String, valueCols: Seq[String],
                   forward: Boolean = false,
                   toleranceSec: Option[Long] = None): DataFrame = {
    val matched = asofImpl(left, right, by, leftTs, rightTs, valueCols, forward)
    toleranceSec match {
      case None => matched.drop("_asof_ts")
      case Some(tol) =>
        val dist =
          if (forward) unix_timestamp(col("_asof_ts")) - unix_timestamp(col(leftTs))
          else unix_timestamp(col(leftTs)) - unix_timestamp(col("_asof_ts"))
        valueCols.foldLeft(matched) { (df, c) =>
          df.withColumn(s"asof_$c",
            when(col("_asof_ts").isNotNull && dist <= tol, col(s"asof_$c")))
        }.drop("_asof_ts")
    }
  }

  private def asofImpl(left: DataFrame, right: DataFrame, by: Seq[String],
                       leftTs: String, rightTs: String,
                       valueCols: Seq[String], forward: Boolean): DataFrame = {
    require(valueCols.nonEmpty, "asofJoin needs at least one value column")
    val leftCols = left.columns
    // Right values travel inside a non-null marker STRUCT (with the
    // matched right ts): last(..., ignoreNulls) must skip only the left
    // rows' placeholders, not right rows whose carried value is
    // genuinely NULL — a bare column can't distinguish the two (a null
    // right value would be forward-filled past, returning a stale older
    // value). The carried ts serves tolerance checks.
    def structType(c: String) = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("t",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("v", right.schema(c).dataType)))
    val l = left
      .withColumn("_ts", col(leftTs))
      .withColumn("_side", lit(1))
      .select((by.map(col) :+ col("_ts") :+ col("_side")) ++
        valueCols.map(c => lit(null).cast(structType(c)).as(s"_v_$c")) ++
        leftCols.filterNot(by.contains).map(c => col(c).as(s"_l_$c")): _*)
    val r = right
      .withColumn("_ts", col(rightTs))
      .withColumn("_side", lit(0))
      .select((by.map(col) :+ col("_ts") :+ col("_side")) ++
        valueCols.map(c =>
          struct(col(rightTs).cast("timestamp").as("t"), col(c).as("v")).as(s"_v_$c")) ++
        leftCols.filterNot(by.contains).map(c => lit(null).cast(left.schema(c).dataType).as(s"_l_$c")): _*)
    // Backward: scan time ascending — the last right row seen is the
    // nearest at-or-before. Forward: scan DESCENDING — the last right
    // row seen is the nearest at-or-after. Either way `_side asc` puts
    // the right row first at equal ts, so equality matches.
    val order =
      if (forward) Seq(col("_ts").desc, col("_side").asc)
      else Seq(col("_ts").asc, col("_side").asc)
    val w = Window.partitionBy(by.map(col): _*)
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = l.unionByName(r)
      .select(
        (by.map(col) :+ col("_ts") :+ col("_side")) ++
          leftCols.filterNot(by.contains).map(c => col(s"_l_$c")) ++
          (valueCols.map(c =>
            last(col(s"_v_$c"), ignoreNulls = true).over(w).getField("v").as(s"asof_$c")) :+
            last(col(s"_v_${valueCols.head}"), ignoreNulls = true).over(w)
              .getField("t").as("_asof_ts")): _*)
      .where(col("_side") === 1)
    joined.select(
      (by.map(col) :+ col("_ts").as(leftTs) :+ col("_asof_ts")) ++
        leftCols.filterNot(c => by.contains(c) || c == leftTs).map(c => col(s"_l_$c").as(c)) ++
        valueCols.map(c => col(s"asof_$c")): _*)
  }

  /** Gap detection: rows whose distance to the previous row in the same
    * series exceeds `thresholdSec` (reference callers do this over raw
    * pages; the daily index `page/index.go:11-17` exists to find them).
    */
  def gaps(df: DataFrame, tsCol: String, keys: Seq[String],
           thresholdSec: Long, tieBreak: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((col(tsCol) +: tieBreak.map(col)).map(_.asc): _*)
    df.withColumn("prev_ts", lag(col(tsCol), 1).over(w))
      .withColumn("gap_sec",
        unix_timestamp(col(tsCol)) - unix_timestamp(col("prev_ts")))
      .where(col("gap_sec") > thresholdSec)
  }

  /** Volume-weighted average price per group. */
  def vwap(df: DataFrame, priceCol: String, qtyCol: String,
           keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg((sum(col(priceCol) * col(qtyCol)) / sum(col(qtyCol))).as("vwap"),
        sum(col(qtyCol)).as("total_qty"))

  /** Moving aggregate over the last `nRows` rows per key (ordered by ts
    * with explicit tie-break columns for determinism).
    */
  def movingAvg(df: DataFrame, valueCol: String, tsCol: String,
                keys: Seq[String], nRows: Int,
                tieBreak: Seq[String] = Nil): DataFrame = {
    val order = (col(tsCol) +: tieBreak.map(col)).map(_.asc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
      .rowsBetween(-(nRows - 1), Window.currentRow)
    val wc = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("mavg", avg(col(valueCol)).over(w))
      .withColumn("csum", sum(col(valueCol)).over(wc))
  }

  /** Technical indicators over per-series candle frames — the workload
    * a mora user runs on top of the store. All window-expressible
    * (single shuffle on the series key, rows-frame windows):
    * SMA(n), Donchian channel (rolling high/low of n), rate-of-change
    * vs n rows back, and SMA-smoothed RSI(n) (Cutler's RSI — the
    * Wilder's-EMA variant is [[ema]], which windows can't express).
    * First n−1 rows of a series emit nulls for roc/rsi (insufficient
    * history) and partial-window SMA/Donchian, matching SQL semantics
    * on both engines.
    */
  def indicators(df: DataFrame, closeCol: String, tsCol: String,
                 keys: Seq[String], n: Int, rocN: Int = 5): DataFrame = {
    val order = col(tsCol).asc
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order)
      .rowsBetween(-(n - 1), Window.currentRow)
    val wLag = Window.partitionBy(keys.map(col): _*).orderBy(order)
    val c = col(closeCol)
    val prev = lag(c, 1).over(wLag)
    val gain = when(prev.isNull, lit(null)).otherwise(greatest(c - prev, lit(0.0)))
    val loss = when(prev.isNull, lit(null)).otherwise(greatest(prev - c, lit(0.0)))
    // rsi needs the avg gain/loss of the last n CHANGES — rows 2..n+1;
    // computed over the same n-row frame on the change columns.
    val df2 = df
      .withColumn("_gain", gain)
      .withColumn("_loss", loss)
    val avgGain = avg(col("_gain")).over(w)
    val avgLoss = avg(col("_loss")).over(w)
    val lagged = lag(c, rocN).over(wLag)
    df2
      .withColumn("sma", avg(c).over(w))
      .withColumn("donchian_hi", max(c).over(w))
      .withColumn("donchian_lo", min(c).over(w))
      .withColumn("roc",
        when(lagged.isNull || lagged === 0.0, lit(null))
          .otherwise((c - lagged) / lagged * 100.0))
      .withColumn("rsi",
        when(avgLoss.isNull, lit(null))
          .when(avgLoss === 0.0, lit(100.0))
          .otherwise(lit(100.0) - lit(100.0) / (lit(1.0) + avgGain / avgLoss)))
      .drop("_gain", "_loss")
  }

  /** Wilder-style exponential moving average — the indicator windows
    * CANNOT express (each row depends on the previous EMA value, an
    * unbounded recursion). One shuffle on the series key, then a
    * STREAMING fold over each partition's (key, ts, value)-sorted rows —
    * no per-group materialization, spill-friendly, and key columns keep
    * their original types. The value column is a deterministic
    * tie-break for equal timestamps, so the output is independent of
    * input partitioning. Emits every input column plus `ema`.
    */
  def ema(df: DataFrame, valueCol: String, tsCol: String,
          keys: Seq[String], alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha must be in (0, 1]")
    val outSchema = df.schema.add("ema", org.apache.spark.sql.types.DoubleType)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val keyIdx = keys.map(df.schema.fieldIndex)
    val vIdx = df.schema.fieldIndex(valueCol)
    df.repartition(keys.map(col): _*)
      .sortWithinPartitions(
        (keys.map(col) :+ col(tsCol) :+ col(valueCol)).map(_.asc): _*)
      .mapPartitions { it =>
        var curKey: Seq[Any] = null
        var e = Double.NaN
        it.map { r =>
          val k = keyIdx.map(r.get)
          if (curKey == null || k != curKey) { curKey = k; e = Double.NaN }
          val v = r.get(vIdx) match {
            case n: java.lang.Number => n.doubleValue()
            case other => sys.error(s"non-numeric $valueCol: $other")
          }
          e = if (e.isNaN) v else alpha * v + (1 - alpha) * e
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ e)
        }
      }(enc)
  }

  /** Daily cumulative row counts per key — the reference's intra-page
    * prefix-sum index (`PageIndex.ApplyDailyCount`, `page/index.go:11-17`:
    * "rows before this day") as a declared query. `cum_before` counts
    * rows strictly before the day, matching the reference exactly.
    */
  def dailyCumulativeCounts(df: DataFrame, tsCol: String,
                            keys: Seq[String]): DataFrame = {
    val daily = df
      .withColumn("day", to_date(col(tsCol)))
      .groupBy((keys.map(col) :+ col("day")): _*)
      .agg(count(lit(1)).as("day_count"))
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, -1)
    daily.withColumn("cum_before",
      coalesce(sum("day_count").over(w), lit(0L)))
  }

  /** Gap-fill: densify each series onto a regular `stepSec` grid between
    * its min and max timestamp, forward-filling `fillCols` from the last
    * present row (`<col>_filled`); `is_gap` marks generated rows. The
    * grid is generated per key (explode of a bounded sequence — no
    * driver loop) and the fill is one window per key: scales with
    * (series × buckets), shuffles once on the key.
    */
  def gapFill(candles: DataFrame, tsCol: String, keys: Seq[String],
              stepSec: Long, fillCols: Seq[String]): DataFrame = {
    val bounds = candles.groupBy(keys.map(col): _*)
      .agg(min(col(tsCol)).as("_min_ts"), max(col(tsCol)).as("_max_ts"))
    val grid = bounds.select((keys.map(col) :+
      explode(sequence(col("_min_ts"), col("_max_ts"),
        expr(s"INTERVAL $stepSec SECONDS"))).as(tsCol)): _*)
    // FULL outer: grid points union the input's own timestamps, so rows
    // off the (min + k*step) grid are preserved, not silently dropped.
    // `is_gap` comes from a presence marker, not value-nullness — a
    // present row with a NULL fill value is still a present row.
    val joined = grid
      .join(candles.withColumn("_present", lit(true)), keys :+ tsCol, "full_outer")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(tsCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    fillCols.foldLeft(joined
        .withColumn("is_gap", col("_present").isNull).drop("_present")) {
      (df, c) => df.withColumn(s"${c}_filled", last(col(c), ignoreNulls = true).over(w))
    }
  }

  /** Batch sessionization: group events into sessions separated by gaps
    * > `gapSec` (the batch analog of Structured Streaming's
    * `session_window`, declared in SURVEY.md §2.3).
    */
  def sessionize(df: DataFrame, tsCol: String, keys: Seq[String],
                 gapSec: Long, tieBreak: Seq[String] = Nil): DataFrame = {
    val order = (col(tsCol) +: tieBreak.map(col)).map(_.asc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    val flagged = df
      .withColumn("_prev", lag(col(tsCol), 1).over(w))
      .withColumn("_new_session",
        when(col("_prev").isNull ||
          unix_timestamp(col(tsCol)) - unix_timestamp(col("_prev")) > gapSec, 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum("_new_session").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged
      .groupBy((keys.map(col) :+ col("session_id")): _*)
      .agg(min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"))
  }
}
