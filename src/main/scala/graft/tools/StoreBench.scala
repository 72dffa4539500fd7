package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.store.CandleStore

/** Candle-store ingest throughput at volume: generates N minute-bars
  * across several series-years with `spark.range` (distributed — no
  * driver materialization), then times (1) the initial upsert, (2) an
  * overlapping re-upsert (merge path), (3) a point lookup and range
  * scan off the resulting table.
  * `sbt "runMain graft.tools.StoreBench [nRows]"`.
  */
object StoreBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(5000000L)
    val spark = GraftSession.builder(appName = "graft-storebench").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Files.createTempDirectory("graft-storebench").toString + "/t"

    def candles(offset: Long, rows: Long) = spark.range(rows)
      .select(
        lit("UPBIT").as("market"),
        concat(lit("SYM"), (col("id") % 4).cast("string")).as("code"),
        lit(60).as("candle_length"),
        timestamp_seconds(lit(1609459200L) + (col("id") + offset) / 4 * 60).as("ts"),
        (rand(42) * 100).as("open"), (rand(43) * 100 + 100).as("high"),
        (rand(44) * 50).as("low"), (rand(45) * 100).as("close"),
        (rand(46) * 10).as("volume"), lit(0L).as("bit_fields"))

    val store = CandleStore(spark, dir)
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[storebench] $name%-28s ${sec}%8.2f s  (${n / sec / 1e6}%.2f M rows/s)")
      r
    }
    time("initial upsert")(store.upsert(candles(0, n)))
    time("overlapping re-upsert")(store.upsert(candles(n / 2, n)))
    val years = store.scan().select("year").distinct().count()
    println(s"[storebench] rows=${store.scan().count()} series-years=${
      store.listSeries().count()} years=$years")
    time("point lookup")(
      store.readPage("UPBIT", "SYM0", 60, 2021).count())
    time("range scan 1 month")(
      store.rangeScan("UPBIT", "SYM1", 60,
        java.sql.Timestamp.valueOf("2021-03-01 00:00:00"),
        java.sql.Timestamp.valueOf("2021-04-01 00:00:00")).count())
    spark.stop()
  }
}
