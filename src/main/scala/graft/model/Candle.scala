package graft.model

import java.sql.Timestamp

import org.apache.spark.sql.types._

/** One OHLCV bar.
  *
  * Mirrors the reference's record (`common/candle.go:27-39`): a
  * `TimelessCandle {Open,High,Low,Close,Volume float64; BitFields uint32}`
  * plus a UTC second-precision timestamp, keyed by the 3-part series key
  * `(MarketCode, Code, CandleLength)` (`page/index.go:19-28`) with the
  * calendar year as the storage partition (`common/candle.go:70-80`).
  *
  * `bit_fields` is a uint32 in the reference; we widen to Long (BIGINT)
  * to avoid sign loss. `candle_length` is the bar duration in seconds
  * (`page/header.go:17`, e.g. 60 = 1-minute bars).
  */
final case class Candle(
    market: String,
    code: String,
    candle_length: Int,
    ts: Timestamp,
    open: Double,
    high: Double,
    low: Double,
    close: Double,
    volume: Double,
    bit_fields: Long
)

object Candle {
  /** Series-key columns: rows are unique per (key, ts) after ingest
    * (`page/page.go:95-142`).
    */
  val keyCols: Seq[String] = Seq("market", "code", "candle_length")

  /** Storage partition columns, in the reference's directory-nesting
    * order `{market}/{length}/{code}/{year}` (`disk/resolver.go:15-17`).
    */
  val partitionCols: Seq[String] = Seq("market", "candle_length", "code", "year")

  val schema: StructType = StructType(Seq(
    StructField("market", StringType, nullable = false),
    StructField("code", StringType, nullable = false),
    StructField("candle_length", IntegerType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("open", DoubleType, nullable = false),
    StructField("high", DoubleType, nullable = false),
    StructField("low", DoubleType, nullable = false),
    StructField("close", DoubleType, nullable = false),
    StructField("volume", DoubleType, nullable = false),
    StructField("bit_fields", LongType, nullable = false)
  ))
}
