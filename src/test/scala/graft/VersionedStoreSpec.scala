package graft

import java.sql.Timestamp

import graft.model.Candle
import graft.store.VersionedCandleStore

/** Versioned store semantics: tx-stamped appends, as-of reads, journal
  * counter, compaction (reference LastTxId + persistent counter,
  * `page/header.go:13-23`, `wal/counter.go:13-94`).
  */
class VersionedStoreSpec extends SparkSpec {
  import spark.implicits._

  private def c(code: String, t: String, o: Double): Candle =
    Candle("UPBIT", code, 60, ts(t), o, o + 1, o - 1, o + 0.5, 10.0, 0L)

  test("as-of reads reconstruct every historical state; scan is latest") {
    val st = VersionedCandleStore(spark, tmpDir("vstore") + "/v")
    assert(st.latestTxId == 0L)
    val t1 = st.commit(Seq(c("BTC", "2022-01-01 10:00:00", 1),
      c("BTC", "2022-01-01 10:01:00", 2)).toDF())
    val t2 = st.commit(Seq(c("BTC", "2022-01-01 10:01:00", 20), // overwrite
      c("ETH", "2021-06-01 00:00:00", 5)).toDF())               // new key
    val t3 = st.commit(Seq(c("BTC", "2022-01-01 10:00:00", 100)).toDF())
    assert((t1, t2, t3) == ((1L, 2L, 3L)) && st.latestTxId == 3L)

    def opens(df: org.apache.spark.sql.DataFrame): Map[(String, Timestamp), Double] =
      df.select("code", "ts", "open").collect()
        .map(r => (r.getString(0), r.getTimestamp(1)) -> r.getDouble(2)).toMap

    assert(opens(st.scanAsOf(1L)) == Map(
      ("BTC", ts("2022-01-01 10:00:00")) -> 1.0,
      ("BTC", ts("2022-01-01 10:01:00")) -> 2.0))
    assert(opens(st.scanAsOf(2L)) == Map(
      ("BTC", ts("2022-01-01 10:00:00")) -> 1.0,
      ("BTC", ts("2022-01-01 10:01:00")) -> 20.0,
      ("ETH", ts("2021-06-01 00:00:00")) -> 5.0))
    assert(opens(st.scan()) == Map(
      ("BTC", ts("2022-01-01 10:00:00")) -> 100.0,
      ("BTC", ts("2022-01-01 10:01:00")) -> 20.0,
      ("ETH", ts("2021-06-01 00:00:00")) -> 5.0))
    // as-of beyond the journal == latest (journal-gated)
    assert(opens(st.scanAsOf(99L)) == opens(st.scan()))
    // journal records one row per commit
    assert(st.txLog().select("tx_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("within-batch ordinal last-wins matches CandleStore.upsert semantics") {
    val st = VersionedCandleStore(spark, tmpDir("vstore-ord") + "/v")
    val batch = Seq(
      (0L, c("BTC", "2022-01-01 10:00:00", 11)),
      (1L, c("BTC", "2022-01-01 10:00:00", 22))
    ).toDF("ord", "c").select($"ord", $"c.*")
    st.commit(batch, ordinalCol = Some("ord"))
    assert(st.scan().select("open").as[Double].head() == 22.0)
  }

  test("compact squashes history to one version per key, scan unchanged") {
    val st = VersionedCandleStore(spark, tmpDir("vstore-compact") + "/v")
    st.commit(Seq(c("BTC", "2022-01-01 10:00:00", 1)).toDF())
    st.commit(Seq(c("BTC", "2022-01-01 10:00:00", 2)).toDF())
    st.commit(Seq(c("BTC", "2022-01-01 10:00:00", 3)).toDF())
    val before = st.scan().collect().toSeq
    assert(st.compact() == 3L)
    assert(st.scan().collect().toSeq == before)
    // exactly one stored version remains
    assert(spark.read.parquet(st.path + "/data").count() == 1)
    // the counter keeps going after compaction
    assert(st.commit(Seq(c("BTC", "2022-01-01 10:00:00", 4)).toDF()) == 4L)
    assert(st.scan().select("open").as[Double].head() == 4.0)
  }
}
