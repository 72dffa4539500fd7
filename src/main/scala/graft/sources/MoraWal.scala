package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.store.CandleStore

/** Reader/writer for the reference engine's WAL log files — the OTHER
  * on-disk artifact a live mora deployment has. Pages (`.ysf`,
  * [[Ysf]]) hold everything the flusher already wrote; the most recent
  * committed transactions live ONLY in `wal/wal.*.log` until the next
  * flush. A migration that reads pages alone silently loses that tail;
  * [[migrateFromMora]] composes both.
  *
  * Log format (`database/command/command.go:67-92` envelope,
  * `command/insert.go:62-88` insert body, `common/candle_io.go:8-31`
  * candle payload) — a log file is a bare concatenation of commands,
  * no file header:
  *  - envelope: body_size u32 LE, tx_id u64 LE, type u32 LE
  *    (1 = COMMIT, 2 = INSERT; `command/types.go:12-15`);
  *  - COMMIT body: empty (`command/commit.go`);
  *  - INSERT body: year u16 LE, candle_length u32 LE, market 10 B
  *    null-padded, code 18 B null-padded, count u32 LE
  *    (38 B head, `insert.go:15,46-52`), then count candle records:
  *    ts i64 LE, bit_fields u32 BIG-endian, open/high/low/close/volume
  *    f64 LE — 52 B each (`candle_io.go:8-31`).
  *
  * Two reference quirks are reproduced/handled deliberately:
  *  - `InsertCommand.BinarySize` claims 38 + 48·count
  *    (`insert.go:91-93`) but the writer actually emits 38 + 52·count
  *    (the candle writer emits 52 B; the 48 comes from the PAGE block
  *    width). Every real mora log therefore carries an UNDERSTATED
  *    body_size. The sequential reader never uses it for inserts (it
  *    consumes head + count·52 from the stream, like
  *    `command.go:18-44` does), so decode accepts the reference's
  *    arithmetic — and also the arithmetically-correct 38 + 52·count,
  *    in case a corrected writer produced the file. [[writeLog]] emits
  *    the reference's bytes exactly, understated size included, so
  *    fixtures are byte-identical to what mora writes.
  *  - `candle_io.go:42` reads the timestamp back as
  *    `int64(LittleEndian.Uint32(bin[0:8]))` — truncating the i64 the
  *    writer emitted to its low 32 bits (breaks after 2106-02-07 and
  *    for pre-1970 stamps). We read the full i64 LE: that is the
  *    intended semantics (it is what the writer wrote), and the
  *    divergence from the reference's buggy read path is documented
  *    here rather than reproduced.
  *
  * Commit semantics follow the FLUSHER (`wal/flusher.go:95-150`, the
  * path that decides what durably lands in pages): an insert is
  * applied iff a COMMIT record for its tx id appears strictly LATER in
  * the SAME file; at a commit the tx's accumulated entries flush and
  * the tx id resets, so inserts after a commit need a commit of their
  * own. (`wal/reader.go:29-55` ReadAll is laxer — one commit anywhere
  * marks the whole tx — but mora always writes the commit last inside
  * one file per tx: the persist runner holds the rotation read-lock
  * for the whole tx, `wal/persist.go:53-58,86-107`, so the two
  * readings coincide on real logs.) A TORN TAIL — a partial record at
  * end-of-file from a crash mid-append — reads as clean EOF, exactly
  * like the reference (`command.go:21-23` returns EOF on a short
  * header read); garbage mid-file fails loudly instead.
  *
  * Scale posture: one log file is one decode unit (mora rotates at 256
  * committed pages, `wal/persist.go:16,74-79`, bounding file size), so
  * reading parallelizes per file via `binaryFile` with no shuffle;
  * committed-gating is per-file state carried through a single
  * sequential pass, never a join. [[writeLog]] is a driver-side
  * fixture/tail utility — bulk EXPORT to mora goes through page files
  * ([[Ysf.write]], one shuffle), not the WAL.
  */
object MoraWal {
  val CommitType = 1
  val InsertType = 2
  val EnvelopeSize = 16
  val InsertHeadSize = 38
  /** Bytes per candle the reference writer actually emits (candle_io.go:8-31). */
  val CandleWidth = 52
  /** Bytes per candle `BinarySize` CLAIMS (insert.go:91-93) — the quirk. */
  val ClaimedCandleWidth = 48

  /** One decoded insert-row. `wal_seq` orders rows for redo:
    * file-listing rank (lexicographic name sort = chronological,
    * `wal/resolver.go:73-75` filenames embed millis then tx id) in the
    * high 32 bits, in-file record position below — "later wins" feeds
    * straight into [[CandleStore.upsert]]'s ordinal.
    */
  final case class WalRow(wal_file: String, wal_seq: Long, tx_id: Long,
                          committed: Boolean, market: String, code: String,
                          candle_length: Int, year: Int, ts: Timestamp,
                          open: Double, high: Double, low: Double,
                          close: Double, volume: Double, bit_fields: Long)

  /** Driver-side command model for [[writeLog]] (fixtures + tail export). */
  sealed trait WalCommand { def txId: Long }
  final case class WalInsert(txId: Long, market: String, code: String,
                             candleLength: Int, year: Int,
                             candles: Seq[WalCandle]) extends WalCommand
  final case class WalCommit(txId: Long) extends WalCommand
  final case class WalCandle(ts: Long, open: Double, high: Double, low: Double,
                             close: Double, volume: Double, bitFields: Long)

  // ---------------------------------------------------------------- codec

  /** Encode one command exactly as `command.go:67-92` + content writers
    * do — INCLUDING the understated insert body_size (38 + 48·count).
    */
  def encodeCommand(cmd: WalCommand): Array[Byte] = cmd match {
    case WalCommit(tx) =>
      val b = ByteBuffer.allocate(EnvelopeSize).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(0); b.putLong(tx); b.putInt(CommitType)
      b.array()
    case WalInsert(tx, market, code, len, year, candles) =>
      require(market.getBytes("UTF-8").length <= Ysf.MaxMarketLen,
        s"market '$market' exceeds ${Ysf.MaxMarketLen} bytes")
      require(code.getBytes("UTF-8").length <= Ysf.MaxCodeLen,
        s"code '$code' exceeds ${Ysf.MaxCodeLen} bytes")
      val actual = InsertHeadSize + CandleWidth * candles.size
      val b = ByteBuffer.allocate(EnvelopeSize + actual)
        .order(ByteOrder.LITTLE_ENDIAN)
      // the reference's BinarySize arithmetic, quirk and all
      b.putInt(InsertHeadSize + ClaimedCandleWidth * candles.size)
      b.putLong(tx); b.putInt(InsertType)
      b.putShort((year & 0xffff).toShort)
      b.putInt(len)
      putNullPadded(b, market, Ysf.MaxMarketLen)
      putNullPadded(b, code, Ysf.MaxCodeLen)
      b.putInt(candles.size)
      candles.foreach { c =>
        b.putLong(c.ts)
        b.order(ByteOrder.BIG_ENDIAN).putInt((c.bitFields & 0xffffffffL).toInt)
        b.order(ByteOrder.LITTLE_ENDIAN)
        b.putDouble(c.open); b.putDouble(c.high); b.putDouble(c.low)
        b.putDouble(c.close); b.putDouble(c.volume)
      }
      b.array()
  }

  private def putNullPadded(b: ByteBuffer, s: String, len: Int): Unit = {
    val raw = s.getBytes("UTF-8")
    b.put(raw); b.put(new Array[Byte](len - raw.length)); ()
  }

  /** Decoded command stream of one log file: (txId, Some(insert) |
    * None=commit) in record order. Torn tail → clean stop; garbage →
    * loud IllegalArgumentException.
    */
  private[graft] def decodeCommands(bytes: Array[Byte]): Seq[(Long, Option[WalInsert])] = {
    val out = Seq.newBuilder[(Long, Option[WalInsert])]
    var off = 0
    while (off + EnvelopeSize <= bytes.length) {
      val env = ByteBuffer.wrap(bytes, off, EnvelopeSize)
        .order(ByteOrder.LITTLE_ENDIAN)
      val bodySize = env.getInt()
      val txId = env.getLong()
      val typ = env.getInt()
      typ match {
        case CommitType =>
          require(bodySize == 0, s"commit with non-empty body ($bodySize B) at offset $off")
          out += ((txId, None))
          off += EnvelopeSize
        case InsertType =>
          if (off + EnvelopeSize + InsertHeadSize > bytes.length) {
            off = bytes.length // torn mid-head: crash tail, stop clean
          } else {
            // NB: wrap(array, off, len) keeps ABSOLUTE indexing — read
            // head fields at absolute offsets, not head-relative ones
            val headOff = off + EnvelopeSize
            val h = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
            val year = h.getShort(headOff) & 0xffff
            val len = h.getInt(headOff + 2)
            val market = readNullPadded(bytes, headOff + 6, Ysf.MaxMarketLen)
            val code = readNullPadded(bytes, headOff + 16, Ysf.MaxCodeLen)
            val count = h.getInt(headOff + InsertHeadSize - 4)
            require(count >= 0, s"negative candle count at offset $off")
            require(bodySize == InsertHeadSize + ClaimedCandleWidth.toLong * count ||
              bodySize == InsertHeadSize + CandleWidth.toLong * count,
              s"insert body_size $bodySize inconsistent with count $count at offset $off")
            val dataStart = off + EnvelopeSize + InsertHeadSize
            if (dataStart + CandleWidth.toLong * count > bytes.length) {
              off = bytes.length // torn mid-candles: crash tail, stop clean
            } else {
              val candles = (0 until count).map { i =>
                val cb = ByteBuffer.wrap(bytes, dataStart + i * CandleWidth, CandleWidth)
                  .order(ByteOrder.LITTLE_ENDIAN)
                // FULL i64 — the intended read; candle_io.go:42 truncates
                // to u32, documented divergence (see object scaladoc)
                val ts = cb.getLong()
                cb.order(ByteOrder.BIG_ENDIAN)
                val bits = cb.getInt().toLong & 0xffffffffL
                cb.order(ByteOrder.LITTLE_ENDIAN)
                WalCandle(ts, cb.getDouble(), cb.getDouble(), cb.getDouble(),
                  cb.getDouble(), cb.getDouble(), bits)
              }
              out += ((txId, Some(WalInsert(txId, market, code, len, year, candles))))
              off = dataStart + CandleWidth * count
            }
          }
        case other =>
          throw new IllegalArgumentException(
            s"unknown WAL command type $other at offset $off")
      }
    }
    out.result()
  }

  private def readNullPadded(bytes: Array[Byte], off: Int, len: Int): String = {
    var end = off + len
    while (end > off && bytes(end - 1) == 0) end -= 1
    new String(bytes, off, end - off, "UTF-8")
  }

  /** Flusher-exact per-file replay fold: rows flagged committed iff a
    * commit for their tx follows them in this file (`flusher.go:95-137`
    * — entries flush AND RESET at each commit record).
    */
  private[graft] def replayFile(fileName: String, fileRank: Int,
                                bytes: Array[Byte]): Seq[WalRow] = {
    val cmds = decodeCommands(bytes)
    val pending = scala.collection.mutable.Map.empty[Long, scala.collection.mutable.Buffer[Int]]
    val committed = Array.fill(cmds.size)(false)
    cmds.zipWithIndex.foreach {
      case ((tx, Some(_)), i) =>
        pending.getOrElseUpdate(tx, scala.collection.mutable.Buffer.empty) += i
      case ((tx, None), _) =>
        pending.remove(tx).foreach(_.foreach(committed(_) = true))
    }
    cmds.zipWithIndex.collect { case ((tx, Some(ins)), i) =>
      ins.candles.map { c =>
        WalRow(fileName, (fileRank.toLong << 32) | i.toLong, tx, committed(i),
          ins.market, ins.code, ins.candleLength, ins.year,
          new Timestamp(c.ts * 1000L), c.open, c.high, c.low, c.close,
          c.volume, c.bitFields)
      }
    }.flatten
  }

  // --------------------------------------------------------------- reader

  /** Decode every `wal.*.log` under `walDir` into [[WalRow]]s —
    * committed AND uncommitted, flagged. One decode task per file, no
    * shuffle; file rank (for `wal_seq`) comes from the sorted listing.
    */
  def read(spark: SparkSession, walDir: String): DataFrame = {
    import spark.implicits._
    val dir = new org.apache.hadoop.fs.Path(walDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) return spark.emptyDataset[WalRow].toDF()
    // chronological = numeric (millis ++ 5-digit tx) parsed from the
    // name (`wal/resolver.go:73-75`). The reference's own fields are
    // fixed-width (`%d%05d`: 13-digit millis until 2286, tx id modded
    // to 5 digits), so plain string sort agrees — the numeric key just
    // refuses to be fooled by a hand-named or far-future file.
    val names = fs.listStatus(dir).map(_.getPath.getName)
      .filter(n => n.startsWith("wal.") && n.endsWith(".log"))
      .sortBy(n => (n.stripPrefix("wal.").stripSuffix(".log")
        .toLongOption.getOrElse(Long.MaxValue), n))
    if (names.isEmpty) return spark.emptyDataset[WalRow].toDF()
    val rank: Map[String, Int] = names.zipWithIndex.toMap
    spark.read.format("binaryFile")
      .load(names.map(n => new org.apache.hadoop.fs.Path(dir, n).toString): _*)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val name = path.substring(path.lastIndexOf('/') + 1)
        try replayFile(name, rank(name), bytes)
        catch {
          case e: IllegalArgumentException =>
            throw new IllegalArgumentException(s"bad WAL log at $path: ${e.getMessage}", e)
        }
      }
      .toDF()
  }

  /** The replayable tail: candles of committed transactions, in redo
    * order (`wal_seq`), as a [[graft.model.Candle]]-shaped frame.
    */
  def committedCandles(spark: SparkSession, walDir: String): DataFrame =
    read(spark, walDir).where(col("committed"))
      .select(col("market"), col("code"), col("candle_length"), col("ts"),
        col("open"), col("high"), col("low"), col("close"), col("volume"),
        col("bit_fields"), col("wal_seq"))

  /** The DROPPED tail: rows of transactions that never committed (the
    * rows mora itself would discard on recovery) — surfaced so a
    * migration can report exactly what it is not carrying over.
    */
  def uncommittedTail(spark: SparkSession, walDir: String): DataFrame =
    read(spark, walDir).where(!col("committed"))
      .select(col("wal_file"), col("tx_id"), col("market"), col("code"),
        col("candle_length"), col("ts"), col("open"), col("high"),
        col("low"), col("close"), col("volume"), col("bit_fields"))

  // --------------------------------------------------------------- writer

  /** Write one log file of commands — byte-identical to the reference
    * writer (understated insert body_size included). Driver-side: WAL
    * files are rotation-bounded small (256 committed pages,
    * `persist.go:16`); bulk data export goes through [[Ysf.write]].
    */
  def writeLog(spark: SparkSession, path: String, commands: Seq[WalCommand]): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try commands.foreach(c => out.write(encodeCommand(c)))
    finally out.close()
  }

  /** Export a candle frame as a complete mora deployment directory:
    * the `.ysf` page tree ([[Ysf.write]], pages stamped with
    * `lastTxId`) PLUS the `wal/counter` file (u64 LE,
    * `wal/counter.go:72-94`) holding the same id. Without the counter
    * a reopening mora self-initializes it to 0 (`counter.go:36-44`)
    * and mints NEW tx ids BELOW the pages' LastTxId — the counter is
    * what makes the migration resumable, not just readable. The
    * reverse of [[migrateFromMora]]; the WAL dir is left with no logs
    * (everything exported is already "flushed" into pages).
    */
  def exportToMora(df: DataFrame, dir: String, lastTxId: Long): Unit = {
    require(lastTxId >= 0, s"lastTxId must be non-negative, got $lastTxId")
    Ysf.write(df, dir, lastTxId)
    val p = new org.apache.hadoop.fs.Path(s"$dir/wal/counter")
    val fs = p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try {
      val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      b.putLong(lastTxId)
      out.write(b.array())
    } finally out.close()
  }

  // ------------------------------------------------------------- migrate

  /** Migrate a whole mora deployment directory — flushed `.ysf` pages
    * PLUS the unflushed committed WAL tail — into a [[CandleStore]] at
    * `storeDir`. Pages land first, then committed WAL candles redo over
    * them in `wal_seq` order (new-wins per (series, ts), exactly the
    * flusher's `page.Add` effect, `page/page.go:61-78`). Returns the
    * store; read [[uncommittedTail]] separately to report what a
    * recovery would also have dropped.
    *
    * `moraRoot` is the reference's data directory: page tree
    * `{market}/{length}/{code}/{year}.ysf` (`disk/resolver.go:14-17`)
    * with logs under `wal/` (`wal/resolver.go:52-55`).
    */
  def migrateFromMora(spark: SparkSession, moraRoot: String,
                      storeDir: String): CandleStore = {
    val store = CandleStore(spark, storeDir)
    val pages = Ysf.read(spark, moraRoot).drop("year")
    if (!pages.isEmpty) { store.upsert(pages); () }
    val tail = committedCandles(spark, s"$moraRoot/wal")
    if (!tail.isEmpty) { store.upsert(tail, ordinalCol = Some("wal_seq")); () }
    store
  }
}
