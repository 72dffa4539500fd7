package graft.store

import java.sql.Timestamp

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** One logical transaction spanning SEVERAL stores, committed
  * all-or-nothing — the reference's multi-command WAL transaction
  * (`database/database.go:27-51`: `Execute` runs a command list under
  * one tx and commits once) re-expressed for a shared-nothing file
  * commit protocol instead of a single-process WAL.
  *
  * Protocol (presumed-abort two-phase commit, coordinator log = one
  * marker file):
  *
  *  1. PREPARE each op on its own store: the full data write, stopped
  *     one step short of that store's commit point
  *     ([[CandleStore.prepareUpsert]] stages the merged batch and its
  *     install plan but does NOT publish the intent;
  *     [[VersionedCandleStore.prepareDataCommit]] moves verified data
  *     under the live generation but does NOT journal). Prepared state
  *     is INVISIBLE to every reader and reclaimed by each store's
  *     age-gated `vacuum()` if the tx never commits — presumed abort,
  *     no coordinator round needed to roll back.
  *  2. COMMIT POINT: one atomic rename publishes
  *     `<coordDir>/<name>.commit`, recording every prepared handle.
  *     Before it, nothing is visible anywhere; after it, the tx MUST
  *     roll forward everywhere.
  *  3. FINALIZE each op (publish+install the candle intent; journal the
  *     versioned tx), then rename the marker to `<name>.done`. Every
  *     finalize is idempotent, so [[recover]] re-drives a crashed
  *     prefix to completion — a reader that opens either store after
  *     recovery sees the whole tx or none of it, never half.
  *
  * `name` is the tx's idempotence key (the cross-store analog of the
  * streaming batch id): a re-run of `execute` with a name whose marker
  * already exists rolls the old tx forward (if needed) and returns its
  * recorded tx ids WITHOUT re-executing — exactly-once per name, so a
  * foreachBatch driving two stores can use `s"ingest-$batchId"`.
  *
  * Single-coordinator posture per name (the reference holds its
  * database-exclusive lock for the same purpose,
  * `database/concurrency/db.go`): two concurrent `execute` calls with
  * one name race on the create-exclusive marker tmp — the loser fails
  * loudly before publishing anything.
  */
object CrossStoreTx {

  /** One store-op of a cross-store tx. */
  sealed trait Op
  /** Upsert `batch` into a [[CandleStore]] (last-wins page merge). */
  final case class CandleUpsert(store: CandleStore, batch: DataFrame,
                                ordinalCol: Option[String] = None) extends Op
  /** Commit `batch` to a [[VersionedCandleStore]] as one journaled tx. */
  final case class VersionedCommit(store: VersionedCandleStore, batch: DataFrame,
                                   ordinalCol: Option[String] = None,
                                   committedAt: Option[Timestamp] = None) extends Op

  /** A prepared-but-uncommitted store op, serializable to the marker. */
  private sealed trait Prepared {
    def line: String
    def finalizeOp(): Unit
    def abortOp(): Unit
    def txToken: String
  }
  private final case class PreparedCandle(store: CandleStore,
                                          intent: CommitIntent) extends Prepared {
    def line: String = {
      // the FULL intent rides in the marker: finalize can then verify a
      // "neither tmp nor intent on disk" state really means "already
      // installed" (every move destination present) instead of silently
      // accepting prepared data that a mis-ordered vacuum() deleted
      val b64 = java.util.Base64.getEncoder.encodeToString(
        CommitIntent.encode(intent).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      s"candle\t${store.path}\t${intent.txid}\t$b64"
    }
    def finalizeOp(): Unit =
      finalizeCandle(store, intent.txid, Some(intent))
    def abortOp(): Unit = {
      store.abortStagedIntent(intent.txid)
      releaseStoreLock(store)
    }
    def txToken: String = intent.txid
  }

  /** Finalize a candle-store half and VERIFY it: publish + install if
    * the intent is still on disk; if neither `.tmp` nor `.intent`
    * exists, require every move destination present — prepared data
    * deleted before roll-forward (a vacuum() run against the documented
    * "recover first" ordering) fails LOUDLY instead of retiring the
    * marker over a half-committed tx. Releases the store's cross-tx
    * lock on success.
    */
  private def finalizeCandle(store: CandleStore, txid: String,
                             intent: Option[CommitIntent]): Unit = {
    store.finalizeStagedIntent(txid)
    intent.foreach { i =>
      val missing = store.missingInstallTargets(i)
      if (missing.nonEmpty)
        sys.error(s"cross-store tx $txid committed but ${missing.size} of " +
          s"${i.moves.size} installed files are absent from ${store.path} " +
          s"(e.g. ${missing.head}): its prepared data was deleted before " +
          "roll-forward — run CrossStoreTx.recover BEFORE the store's " +
          "vacuum(), always. (A store compaction between install and a " +
          "delayed recovery also trips this check; verify the rows and " +
          "retire the marker by hand if so.)")
    }
    releaseStoreLock(store)
  }
  private final case class PreparedVersioned(store: VersionedCandleStore, tx: Long,
                                             written: Long, committedAt: Option[Timestamp]) extends Prepared {
    def line: String =
      s"vstore\t${store.path}\t$tx\t$written\t${committedAt.map(_.getTime).getOrElse(-1L)}"
    def finalizeOp(): Unit = {
      store.finalizeDataCommit(tx, written, committedAt, None); ()
    }
    def abortOp(): Unit = () // torn-commit semantics: invisible; vacuum reclaims
    def txToken: String = tx.toString
  }

  /** Crash seam marker thrown by the test-only crash points. */
  private[graft] final class SimulatedCrash(step: String)
    extends RuntimeException(s"simulated crash: $step")

  /** Reclaim age for a crashed holder's per-store tx lock — far beyond
    * any real prepare→finalize span, mirroring the stores' own vacuum
    * posture.
    */
  private val staleLockMs = 24L * 3600 * 1000

  /** Acquire the candle store's cross-tx lock for tx `name`. A
    * CandleStore prepare snapshots the partition file sets it will
    * delete on install; a SECOND cross-store tx committing on the same
    * store between this tx's prepare and finalize would make that
    * snapshot stale (duplicate live files after both installs) — so
    * same-store interleaving fails LOUDLY here instead. The lock file
    * records the holder's tx name: a retry of the SAME name reclaims
    * its own crashed predecessor's lock immediately; a different name
    * reclaims only past the stale age.
    */
  private def acquireStoreLock(store: CandleStore, name: String): Unit = {
    val fs = store.crossTxFs
    val lock = store.crossTxLockPath
    fs.mkdirs(lock.getParent)
    def tryTake(): Boolean =
      try {
        val os = fs.create(lock, false)
        try os.write(name.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally os.close()
        true
      } catch { case _: java.io.IOException => false }
    if (tryTake()) return
    val (holder, age) =
      try {
        val st = fs.getFileStatus(lock)
        val in = fs.open(lock)
        val text =
          try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
            java.nio.charset.StandardCharsets.UTF_8)
          finally in.close()
        (text, System.currentTimeMillis() - st.getModificationTime)
      } catch { case _: java.io.FileNotFoundException => ("", Long.MaxValue) }
    if (holder != name && age < staleLockMs)
      throw new IllegalStateException(
        s"cross-store tx '$holder' holds ${store.path}'s tx lock: one " +
          "in-flight cross-store tx per store — finalize it " +
          "(CrossStoreTx.recover) or wait; a crashed holder's lock " +
          s"ages out after ${staleLockMs / 3600000} h")
    fs.delete(lock, false)
    if (!tryTake())
      throw new IllegalStateException(
        s"lost the race re-taking ${store.path}'s cross-tx lock")
  }

  private def releaseStoreLock(store: CandleStore): Unit = {
    store.crossTxFs.delete(store.crossTxLockPath, false); ()
  }

  private def fsFor(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def markerOf(dir: String, name: String, suffix: String) =
    new Path(dir, s"$name.$suffix")

  /** Execute `ops` as ONE atomic cross-store transaction named `name`.
    * Returns each op's tx token (candle intent txid / versioned tx id),
    * in op order — from this run, or from the recorded marker when
    * `name` already committed (exactly-once per name).
    */
  def execute(spark: SparkSession, coordDir: String, name: String,
              ops: Seq[Op]): Seq[String] =
    executeInternal(spark, coordDir, name, ops, crashAfter = Int.MaxValue)

  /** Test seam: run [[execute]] but simulate a hard crash after step
    * `crashAfter`: 1 = all ops prepared (marker unpublished) · 2 =
    * marker published, nothing finalized · 2+i = first i ops
    * finalized · large = complete. Effects up to the step are on disk;
    * nothing later runs.
    */
  private[graft] def executeInternal(spark: SparkSession, coordDir: String,
                                     name: String, ops: Seq[Op],
                                     crashAfter: Int): Seq[String] = {
    require(name.nonEmpty && name.forall(c => c.isLetterOrDigit ||
      c == '-' || c == '_' || c == '.'),
      s"cross-store tx name must be [A-Za-z0-9._-]+: '$name'")
    require(ops.nonEmpty, "cross-store tx with no ops")
    // one op per store: a second op on the same store would merge
    // against state that excludes the first (prepared data is invisible
    // by design) — combine the batches into one op instead
    val paths = ops.map {
      case CandleUpsert(st, _, _) => st.path
      case VersionedCommit(st, _, _, _) => st.path
    }
    require(paths.distinct.length == paths.length,
      s"cross-store tx touches a store twice: ${paths.mkString(", ")}")
    val fs = fsFor(spark, coordDir)
    fs.mkdirs(new Path(coordDir))
    // roll forward any committed-but-unfinalized predecessor (this
    // name's crashed attempt included) BEFORE reading replay state
    recover(spark, coordDir)
    val committed = markerOf(coordDir, name, "commit")
    val done = markerOf(coordDir, name, "done")
    if (fs.exists(done) || fs.exists(committed))
      // already committed (recover() above finalized it): exactly-once
      return readMarker(fs, if (fs.exists(done)) done else committed)
        .map(_._1.txTokenOfLine)

    // PREPARE — a failure here aborts every already-prepared op; the
    // tx never reached its commit point, so nothing is visible
    val prepared = scala.collection.mutable.ArrayBuffer[Prepared]()
    try
      ops.foreach {
        case CandleUpsert(st, b, ord) =>
          acquireStoreLock(st, name)
          prepared += PreparedCandle(st, st.prepareUpsert(b, ord))
        case VersionedCommit(st, b, ord, at) =>
          // no lock needed: concurrent versioned commits are tx-gated
          // safe by the store's own design
          val (tx, written) = st.prepareDataCommit(b, ord)
          prepared += PreparedVersioned(st, tx, written, at)
      }
    catch {
      case t: Throwable =>
        prepared.foreach(p => try p.abortOp() catch { case _: Throwable => () })
        throw t
    }
    if (crashAfter <= 1) throw new SimulatedCrash("prepared, marker unpublished")

    // COMMIT POINT — create-exclusive tmp + atomic rename. Any existing
    // tmp for this name is a crashed predecessor's PRE-commit leftover
    // (single coordinator per name; recover() only consumes `.commit`),
    // which would otherwise wedge the name forever — clear it.
    val tmp = markerOf(coordDir, name, "tmp")
    fs.delete(tmp, false)
    val os = fs.create(tmp, false)
    try os.write((prepared.map(_.line).mkString("\n") + "\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally os.close()
    if (!fs.rename(tmp, committed))
      sys.error(s"could not publish cross-store commit marker for $name")
    if (crashAfter <= 2) throw new SimulatedCrash("marker published, nothing finalized")

    // FINALIZE (roll forward) + retire the marker
    prepared.zipWithIndex.foreach { case (p, i) =>
      p.finalizeOp()
      if (crashAfter == 2 + i + 1)
        throw new SimulatedCrash(s"${i + 1} of ${prepared.length} finalized" +
          (if (i == prepared.length - 1) ", marker unretired" else ""))
    }
    if (!fs.rename(committed, done))
      sys.error(s"could not retire cross-store commit marker for $name")
    prepared.map(_.txToken).toSeq
  }

  /** Roll every published-but-unretired cross-store tx forward to
    * completion (the coordinator's WAL-replay analog). Idempotent; run
    * it on restart before trusting either store's tail, and ALWAYS
    * before each store's `vacuum()` (a committed tx's unfinalized
    * versioned half looks exactly like a torn commit until rolled
    * forward). Returns the number of txs completed.
    */
  def recover(spark: SparkSession, coordDir: String): Int = {
    val fs = fsFor(spark, coordDir)
    if (!fs.exists(new Path(coordDir))) return 0
    val pending = fs.listStatus(new Path(coordDir)).map(_.getPath)
      .filter(_.getName.endsWith(".commit")).sortBy(_.getName)
    pending.foreach { p =>
      readMarker(fs, p).foreach { case (line, _) => line.finalizeFrom(spark) }
      val retired = new Path(p.getParent,
        p.getName.stripSuffix(".commit") + ".done")
      if (!fs.rename(p, retired) && !fs.exists(retired))
        sys.error(s"could not retire cross-store marker ${p.getName}")
    }
    pending.length
  }

  /** One decoded marker line. */
  private final case class MarkerLine(kind: String, storePath: String,
                                      fields: Seq[String]) {
    def txTokenOfLine: String = fields.head
    def finalizeFrom(spark: SparkSession): Unit = kind match {
      case "candle" =>
        val intent = fields.lift(1).map(b64 => CommitIntent.decode(
          new String(java.util.Base64.getDecoder.decode(b64),
            java.nio.charset.StandardCharsets.UTF_8)))
        finalizeCandle(CandleStore(spark, storePath), fields.head, intent)
      case "vstore" =>
        val at = fields(2).toLong match {
          case -1L => None
          case ms => Some(new Timestamp(ms))
        }
        VersionedCandleStore(spark, storePath)
          .finalizeDataCommit(fields.head.toLong, fields(1).toLong, at, None)
        ()
      case other => sys.error(s"unknown cross-store marker op '$other'")
    }
  }

  private def readMarker(fs: org.apache.hadoop.fs.FileSystem,
                         p: Path): Seq[(MarkerLine, Int)] = {
    val in = fs.open(p)
    val text =
      try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
        java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    text.linesIterator.filter(_.nonEmpty).zipWithIndex.map { case (l, i) =>
      val parts = l.split("\t").toSeq
      require(parts.length >= 3, s"torn cross-store marker line: '$l'")
      (MarkerLine(parts.head, parts(1), parts.drop(2)), i)
    }.toSeq
  }
}
