package graft

import java.nio.{ByteBuffer, ByteOrder}
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.sources.MoraWal
import graft.sources.MoraWal._

/** mora WAL-log interop: golden byte-layout checks against the
  * reference writer (`command/command.go:67-92`, `command/insert.go:
  * 62-88`, `common/candle_io.go:8-31`), a hand-synthesized log decoded
  * by the reader, flusher-exact committed-tx gating
  * (`wal/flusher.go:95-137`), torn-tail tolerance, and the full
  * migrate-from-mora composition (pages + WAL tail).
  */
class MoraWalSpec extends SparkSpec {
  import spark.implicits._

  private val T0 = 1704067200L // 2024-01-01 00:00:00 UTC

  private def c(ts: Long, v: Double, bits: Long = 0L) =
    WalCandle(ts, v, v + 1, v - 1, v + 0.5, v * 10, bits)

  test("encodeCommand emits the exact reference byte layout, " +
      "understated insert body_size included") {
    val ins = WalInsert(42L, "KRX", "005930", 3600, 2024,
      Seq(c(T0 + 5, 1.5, bits = 0xA1B2C3D4L), c(T0 + 65, 2.5, bits = 1L)))
    val b = encodeCommand(ins)
    // actual written size: 16 envelope + 38 head + 2*52 candles
    assert(b.length == 16 + 38 + 2 * 52)
    val le = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    // envelope: body_size CLAIMS 38 + 48*2 (the reference's BinarySize
    // quirk, insert.go:91-93) even though 38 + 52*2 bytes follow
    assert(le.getInt(0) == 38 + 48 * 2, "claimed body size")
    assert(le.getLong(4) == 42L, "tx id")
    assert(le.getInt(12) == 2, "insert type id")
    // insert head
    assert((le.getShort(16) & 0xffff) == 2024, "year")
    assert(le.getInt(18) == 3600, "candle_length")
    assert(b.slice(22, 32).toSeq ==
      ("KRX".getBytes("UTF-8") ++ new Array[Byte](7)).toSeq, "market null-pad")
    assert(b.slice(32, 50).toSeq ==
      ("005930".getBytes("UTF-8") ++ new Array[Byte](12)).toSeq, "code null-pad")
    assert(le.getInt(50) == 2, "count")
    // candle 0 at offset 54: ts i64 LE, bit_fields u32 BIG-endian, ohlcv f64 LE
    assert(le.getLong(54) == T0 + 5, "ts LE")
    val be = ByteBuffer.wrap(b).order(ByteOrder.BIG_ENDIAN)
    assert((be.getInt(62).toLong & 0xffffffffL) == 0xA1B2C3D4L, "bit_fields BE")
    assert(le.getDouble(66) == 1.5 && le.getDouble(74) == 2.5 &&
      le.getDouble(82) == 0.5 && le.getDouble(90) == 2.0 &&
      le.getDouble(98) == 15.0, "ohlcv LE")
    // candle 1 starts 52 B later
    assert(le.getLong(54 + 52) == T0 + 65)
    // commit: empty body, type 1
    val cm = encodeCommand(WalCommit(42L))
    assert(cm.length == 16)
    val cle = ByteBuffer.wrap(cm).order(ByteOrder.LITTLE_ENDIAN)
    assert(cle.getInt(0) == 0 && cle.getLong(4) == 42L && cle.getInt(12) == 1)
  }

  test("decodeCommands reads a hand-synthesized reference log " +
      "(full-i64 timestamps, not the reference's u32-truncating read)") {
    // Synthesize bytes independently of encodeCommand, mirroring the Go
    // writer field-by-field — including a POST-2106 timestamp whose low
    // 32 bits alone would alias to 1970-03-16.
    val farFuture = 0x100000000L + 6400000L // > u32 range
    val body = ByteBuffer.allocate(38 + 52).order(ByteOrder.LITTLE_ENDIAN)
    body.putShort(2106.toShort); body.putInt(60)
    body.put("NYSE".getBytes); body.put(new Array[Byte](6))
    body.put("AAPL".getBytes); body.put(new Array[Byte](14))
    body.putInt(1)
    body.putLong(farFuture)
    body.order(ByteOrder.BIG_ENDIAN).putInt(7); body.order(ByteOrder.LITTLE_ENDIAN)
    Seq(9.0, 11.0, 8.0, 10.0, 100.0).foreach(body.putDouble)
    val env = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
    env.putInt(38 + 48); env.putLong(9L); env.putInt(2)
    val commit = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
    commit.putInt(0); commit.putLong(9L); commit.putInt(1)
    val log = env.array() ++ body.array() ++ commit.array()

    val cmds = decodeCommands(log)
    assert(cmds.size == 2)
    val (tx, Some(ins)) = cmds.head: @unchecked
    assert(tx == 9L && ins.market == "NYSE" && ins.code == "AAPL" &&
      ins.candleLength == 60 && ins.year == 2106)
    assert(ins.candles == Seq(WalCandle(farFuture, 9.0, 11.0, 8.0, 10.0, 100.0, 7L)))
    assert(cmds(1) == ((9L, None)))
    // round-trip: our writer reproduces the synthesized bytes exactly
    assert(encodeCommand(WalInsert(9L, "NYSE", "AAPL", 60, 2106,
      ins.candles)).toSeq ++ encodeCommand(WalCommit(9L)).toSeq == log.toSeq)
  }

  test("replayFile: flusher-exact gating — commit flushes AND resets " +
      "its tx; inserts after the commit stay uncommitted; torn tail drops clean") {
    val i1 = WalInsert(1L, "KRX", "A", 60, 2024, Seq(c(T0, 1.0)))
    val i2 = WalInsert(2L, "KRX", "B", 60, 2024, Seq(c(T0, 2.0)))
    val i3 = WalInsert(1L, "KRX", "C", 60, 2024, Seq(c(T0, 3.0))) // same tx AFTER its commit
    val log = encodeCommand(i1) ++ encodeCommand(i2) ++
      encodeCommand(WalCommit(1L)) ++ encodeCommand(i3) ++
      // torn tail: half an insert record (crash mid-append) — must read
      // as clean EOF like the reference's short-read path
      encodeCommand(WalInsert(3L, "KRX", "D", 60, 2024, Seq(c(T0, 4.0)))).take(30)
    val rows = MoraWal.replayFile("wal.x.log", 0, log)
    assert(rows.map(r => (r.code, r.committed)).toSet ==
      Set(("A", true), ("B", false), ("C", false)),
      rows.map(r => (r.code, r.committed)).toString)
    // wal_seq is strictly increasing in record order
    assert(rows.map(_.wal_seq) == rows.map(_.wal_seq).sorted)
    // a second commit for tx 1 WOULD flush the post-commit insert
    val log2 = log.dropRight(30) ++ encodeCommand(WalCommit(1L))
    val rows2 = MoraWal.replayFile("wal.x.log", 0, log2)
    assert(rows2.map(r => (r.code, r.committed)).toSet ==
      Set(("A", true), ("B", false), ("C", true)))
    // garbage mid-file (unknown type id) fails loudly, not silently
    val bad = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
    bad.putInt(0); bad.putLong(5L); bad.putInt(99)
    val e = intercept[IllegalArgumentException] {
      MoraWal.decodeCommands(bad.array() ++ encodeCommand(WalCommit(5L)))
    }
    assert(e.getMessage.contains("unknown WAL command type"))
  }

  test("read: per-file gating across multiple logs; committedCandles " +
      "and uncommittedTail partition the rows") {
    val root = tmpDir("morawal-read")
    // file 1: tx 10 committed
    MoraWal.writeLog(spark, s"$root/wal.100000001.log", Seq(
      WalInsert(10L, "KRX", "A", 60, 2024, Seq(c(T0, 1.0), c(T0 + 60, 1.5))),
      WalCommit(10L)))
    // file 2: tx 11 committed, tx 12 UNCOMMITTED (the in-flight tail)
    MoraWal.writeLog(spark, s"$root/wal.100000002.log", Seq(
      WalInsert(11L, "KRX", "A", 60, 2024, Seq(c(T0 + 60, 9.0))), // overwrites file-1 row
      WalCommit(11L),
      WalInsert(12L, "KRX", "B", 60, 2024, Seq(c(T0, 5.0)))))
    val all = MoraWal.read(spark, root)
    assert(all.count() == 4)
    val com = MoraWal.committedCandles(spark, root)
    assert(com.count() == 3)
    // later file outranks earlier on wal_seq (redo order)
    val seqs = com.orderBy("wal_seq")
      .select("code", "ts", "open").collect().map(r => (r.getString(0), r.getDouble(2)))
    assert(seqs.toSeq == Seq(("A", 1.0), ("A", 1.5), ("A", 9.0)))
    val tail = MoraWal.uncommittedTail(spark, root)
    assert(tail.select("tx_id", "code").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      == Seq((12L, "B")))
    // empty / absent dirs read as empty, not an error
    assert(MoraWal.read(spark, s"$root/nope").count() == 0)
  }

  test("exportToMora: page tree + u64-LE wal/counter at lastTxId; the " +
      "exported deployment migrates back losslessly") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = tmpDir("morawal-export")
    val candles = Seq(
      graft.model.Candle("KRX", "A", 3600, new Timestamp(T0 * 1000L), 1.0, 2.0, 0.5, 1.5, 10.0, 0L),
      graft.model.Candle("KRX", "B", 3600, new Timestamp((T0 + 3600) * 1000L), 3.0, 4.0, 2.0, 3.5, 30.0, 0L))
    MoraWal.exportToMora(candles.toDF(), dir, lastTxId = 41L)
    // counter: exactly 8 bytes, u64 LE (counter.go:72-94)
    val counterBytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "wal", "counter"))
    assert(counterBytes.length == 8)
    assert(ByteBuffer.wrap(counterBytes).order(ByteOrder.LITTLE_ENDIAN)
      .getLong() == 41L)
    // pages carry the same LastTxId
    val pageBytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "KRX", "3600", "A", "02024.ysf"))
    assert(graft.sources.Ysf.decodeHeader(pageBytes).lastTxId == 41L)
    // round trip: the exported deployment migrates back losslessly
    val back = MoraWal.migrateFromMora(spark, dir, tmpDir("morawal-back") + "/s")
      .scan().select("code", "open").as[(String, Double)].collect().toSet
    assert(back == Set(("A", 1.0), ("B", 3.0)))
  }

  test("migrateFromMora: pages + committed WAL tail, WAL wins on " +
      "overlap, uncommitted tail dropped and reportable") {
    val root = tmpDir("morawal-migrate")
    // flushed pages: series A with STALE values, series B correct
    val pages = Seq(
      graft.model.Candle("KRX", "A", 3600, new Timestamp((T0) * 1000L), 1.0, 2.0, 0.5, 1.5, 10.0, 0L),
      graft.model.Candle("KRX", "A", 3600, new Timestamp((T0 + 3600) * 1000L), 7.0, 8.0, 6.0, 7.5, 70.0, 0L),
      graft.model.Candle("KRX", "B", 3600, new Timestamp((T0) * 1000L), 3.0, 4.0, 2.0, 3.5, 30.0, 0L))
    graft.sources.Ysf.write(pages.toDF(), root)
    // WAL: committed correction of A@T0 (+ a brand-new bucket), then an
    // uncommitted tx touching B that must NOT land
    MoraWal.writeLog(spark, s"$root/wal/wal.100000003.log", Seq(
      WalInsert(20L, "KRX", "A", 3600, 2024,
        Seq(c(T0, 100.0), c(T0 + 7200, 200.0))),
      WalCommit(20L),
      WalInsert(21L, "KRX", "B", 3600, 2024, Seq(c(T0, 999.0)))))
    val store = MoraWal.migrateFromMora(spark, root, tmpDir("morawal-store") + "/s")
    val got = store.scan().select("code", "ts", "open", "volume").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime / 1000L, r.getDouble(2), r.getDouble(3)))
      .toSet
    assert(got == Set(
      ("A", T0, 100.0, 1000.0),        // WAL correction won over the page
      ("A", T0 + 3600, 7.0, 70.0),     // untouched page row survives
      ("A", T0 + 7200, 200.0, 2000.0), // WAL-only bucket landed
      ("B", T0, 3.0, 30.0)),           // uncommitted 999 did NOT land
      got.toString)
    val tail = MoraWal.uncommittedTail(spark, s"$root/wal")
    assert(tail.select("code", "open").collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
      == Seq(("B", 999.0)))
  }
}
