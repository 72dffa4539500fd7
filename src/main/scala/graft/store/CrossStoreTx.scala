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
  *     versioned tx), then retire the marker into
  *     `<coordDir>/_done/<name>.done`. Every finalize is idempotent, so
  *     [[recover]] re-drives a crashed prefix to completion — a reader
  *     that opens either store after recovery sees the whole tx or none
  *     of it, never half.
  *
  * `name` is the tx's idempotence key (the cross-store analog of the
  * streaming batch id): a re-run of `execute` with a name whose marker
  * already exists rolls the old tx forward (if needed) and returns its
  * recorded tx ids WITHOUT re-executing — exactly-once per name, so a
  * foreachBatch driving two stores can use `s"ingest-$batchId"`.
  *
  * Concurrent same-name coordinators (the reference holds its
  * database-exclusive lock for the same purpose,
  * `database/concurrency/db.go`) are decided at ONE atomic point: each
  * attempt stages its marker under a unique `<name>.tmp-<uuid>` and the
  * single `rename(tmp, <name>.commit)` picks the winner — a rename onto
  * an existing destination fails, and the loser presumed-aborts its own
  * prepared (invisible) ops and returns the winner's recorded tokens.
  * A zombie that renames AFTER the winner already retired its marker is
  * fenced by the terminal `.done` file: the done-existence check is
  * re-run straddling the rename, and [[recover]] likewise refuses to
  * roll forward a `.commit` whose `.done` already exists (it aborts the
  * zombie's prepared ops instead). `.done` is terminal for a name until
  * [[vacuumRetired]] GC's it past the replay horizon, after which a
  * numeric-suffixed name at-or-below the recorded per-prefix horizon is
  * REFUSED loudly rather than silently re-executed.
  *
  * Durability contract: the protocol's atomicity rests on the
  * [[CommitPrimitives]] seam — create-exclusive + atomic rename on
  * HDFS/local filesystems, rename-less conditional whole-object puts
  * on object stores whose scheme is declared in
  * `graft.store.conditionalPutSchemes`. Object-store URIs NOT so
  * declared are refused up front ([[AtomicFs.requireAtomicCommits]]).
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
                                          intent: CommitIntent,
                                          txName: String) extends Prepared {
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
      finalizeCandle(store, intent.txid, Some(intent), txName)
    def abortOp(): Unit = {
      store.abortStagedIntent(intent.txid)
      releaseStoreLock(store, txName)
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
                             intent: Option[CommitIntent],
                             txName: String): Unit = {
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
    releaseStoreLock(store, txName)
  }
  private final case class PreparedVersioned(store: VersionedCandleStore, tx: Long,
                                             written: Long, committedAt: Option[Timestamp]) extends Prepared {
    def line: String =
      s"vstore\t${store.path}\t$tx\t$written\t${committedAt.map(_.getTime).getOrElse(-1L)}"
    def finalizeOp(): Unit = {
      // same-process finalize: prepare's settle loop verified the exact
      // moved file set moments ago — the O(partition-tree) verifyData
      // glob is the RECOVERY path's fence (finalizeFrom), not a
      // per-micro-batch cost
      store.finalizeDataCommit(tx, written, committedAt, None); ()
    }
    def abortOp(): Unit = () // torn-commit semantics: invisible; vacuum reclaims
    def txToken: String = tx.toString
  }

  /** Crash seam marker thrown by the test-only crash points. */
  private[graft] final class SimulatedCrash(step: String)
    extends RuntimeException(s"simulated crash: $step")

  /** Reclaim age for a crashed holder's per-store tx lock and for
    * abandoned pre-commit marker tmps — far beyond any real
    * prepare→finalize span, mirroring the stores' own vacuum posture.
    */
  private val staleLockMs = 24L * 3600 * 1000

  /** Default retention for retired `.done` markers in [[vacuumRetired]]:
    * long past any Structured Streaming replay depth (one batch), short
    * enough that the coordinator dir never grows without bound.
    */
  val defaultDoneRetentionMs: Long = 24L * 3600 * 1000

  /** Acquire the candle store's cross-tx lock for tx `name`. A
    * CandleStore prepare snapshots the partition file sets it will
    * delete on install; a SECOND cross-store tx committing on the same
    * store between this tx's prepare and finalize would make that
    * snapshot stale (duplicate live files after both installs) — so
    * same-store interleaving fails LOUDLY here instead. The lock file
    * records the holder's tx name: a retry of the SAME name reclaims
    * its own crashed predecessor's lock immediately; a different name
    * reclaims only past the stale age. The reclaim itself is ATOMIC —
    * rename-to-tombstone, so of two concurrent reclaimers exactly one
    * proceeds (a delete+retake pair would let both pass).
    */
  private def acquireStoreLock(store: CandleStore, name: String): Unit =
    store.commitPrims.acquireLock(store.crossTxFs, store.crossTxLockPath,
      name, staleLockMs)

  /** Torn lock state surfaced by [[releaseStoreLock]]: a lock was
    * transiently displaced during a release check and a NEW lock
    * appeared before it could be restored — two coordinators may
    * believe they hold the store. Distinct from routine abort failures
    * so abort paths can refuse to swallow it silently.
    */
  private[graft] final class TornLockState(msg: String)
    extends IllegalStateException(msg)

  /** Release the store's cross-tx lock ONLY if tx `name` still holds
    * it — a blind delete could drop a LATER, different-name tx's lock
    * (e.g. a fenced zombie's abort running after the winner already
    * released and a third tx acquired), silently re-opening the
    * same-store interleaving the lock exists to prevent. The holder
    * check's atomicity lives in the [[CommitPrimitives]] backend:
    * pre-read + rename-to-tombstone displacement on rename
    * filesystems, per-name unique-entry deletion (displacement-free by
    * construction) on conditional-put stores.
    */
  private[graft] def releaseStoreLock(store: CandleStore, name: String): Unit =
    store.commitPrims.releaseLock(store.crossTxFs, store.crossTxLockPath, name)

  /** Abort each prepared op, swallowing routine failures (presumed
    * abort: the store's vacuum reclaims anything a failed abort left) —
    * but a [[TornLockState]] is NEVER silent: it is logged immediately
    * and the first one is returned so the caller can rethrow it or
    * attach it as a suppressed cause of the error already in flight.
    */
  private def abortAllQuietly(ps: Seq[Prepared]): Option[TornLockState] = {
    var torn: Option[TornLockState] = None
    ps.foreach { p =>
      try p.abortOp()
      catch {
        case t: TornLockState =>
          Console.err.println(s"[graft.CrossStoreTx] TORN LOCK STATE " +
            s"during abort: ${t.getMessage}")
          if (torn.isEmpty) torn = Some(t)
        case _: Throwable => ()
      }
    }
    torn
  }

  private def fsFor(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def markerOf(dir: String, name: String, suffix: String) =
    new Path(dir, s"$name.$suffix")

  /** Retired markers live in a subdir so the hot recover()/execute()
    * listing of pending `.commit` files stays O(pending), not
    * O(every-tx-ever) — the coordinator's analog of the reference's WAL
    * rotate-flush-delete (`wal/persist.go:74-103`).
    */
  private def doneDirOf(dir: String) = new Path(dir, "_done")
  private def doneMarkerOf(dir: String, name: String) =
    new Path(doneDirOf(dir), s"$name.done")

  /** The name's terminal `.done` marker, wherever it lives: the `_done`
    * subdir, or the coordinator root (pre-`_done` layout; [[recover]]
    * migrates those as it sees them).
    */
  private def findDone(fs: org.apache.hadoop.fs.FileSystem, dir: String,
                       name: String): Option[Path] =
    Seq(doneMarkerOf(dir, name), markerOf(dir, name, "done"))
      .find(fs.exists)

  /** Names ending `-<digits>` carry their batch id; the GC records a
    * per-prefix horizon over retired ones so a too-deep replay is
    * refused instead of silently re-executed.
    */
  private val NumericName = "^(.*)-([0-9]+)$".r

  /** [[NumericName]] with the id parsed: a digit run too long for Long
    * (legal in the name charset) is treated as NON-numeric everywhere —
    * one consistent rule, never a NumberFormatException wedging the GC.
    */
  private object BatchName {
    def unapply(name: String): Option[(String, Long)] = name match {
      case NumericName(pfx, b) => b.toLongOption.map(pfx -> _)
      case _ => None
    }
  }

  private def horizonPrefix(pfx: String) = s"_horizon-$pfx-"

  /** True when `name` is a batch name whose id the per-prefix GC horizon
    * already covers: the tx committed, retired, AND its `.done` was
    * vacuumed. Terminal exactly like a live `.done` — checked wherever
    * findDone is, because a zombie coordinator can straddle the GC (its
    * `.done` fence deleted between the zombie's entry-time check and its
    * marker rename, which then succeeds against the empty name).
    */
  private def horizonFenced(fs: org.apache.hadoop.fs.FileSystem,
                            dir: String, name: String): Boolean = name match {
    case BatchName(pfx, b) => readHorizon(fs, dir, pfx).exists(_ >= b)
    case _ => false
  }

  /** Highest retired-and-GC'd batch id recorded for `pfx` (monotone;
    * kept as create-exclusive versioned files, so raising it needs no
    * read-modify-write).
    */
  private def readHorizon(fs: org.apache.hadoop.fs.FileSystem, dir: String,
                          pfx: String): Option[Long] = {
    val dd = doneDirOf(dir)
    if (!fs.exists(dd)) return None
    val hp = horizonPrefix(pfx)
    val ids = fs.listStatus(dd).map(_.getPath.getName)
      .filter(_.startsWith(hp)).flatMap(n => n.stripPrefix(hp).toLongOption)
    if (ids.isEmpty) None else Some(ids.max)
  }

  private def raiseHorizon(fs: org.apache.hadoop.fs.FileSystem, dir: String,
                           pfx: String, b: Long): Unit = {
    val cur = readHorizon(fs, dir, pfx)
    if (cur.forall(_ < b)) {
      val p = new Path(doneDirOf(dir), f"${horizonPrefix(pfx)}$b%020d")
      try { val os = fs.create(p, false); os.close() }
      catch { case _: java.io.IOException => () } // concurrent raise: fine
      // GC superseded horizon files (crash leaves extras; max still right)
      val hp = horizonPrefix(pfx)
      fs.listStatus(doneDirOf(dir)).map(_.getPath)
        .filter(q => q.getName.startsWith(hp) &&
          q.getName.stripPrefix(hp).toLongOption.exists(_ < b))
        .foreach(q => fs.delete(q, false))
    }
  }

  /** Execute `ops` as ONE atomic cross-store transaction named `name`.
    * Returns each op's tx token (candle intent txid / versioned tx id),
    * in op order — from this run, or from the recorded marker when
    * `name` already committed (exactly-once per name).
    */
  def execute(spark: SparkSession, coordDir: String, name: String,
              ops: => Seq[Op]): Seq[String] =
    executeInternal(spark, coordDir, name, ops, crashAfter = Int.MaxValue)

  /** Test seam: run [[execute]] but simulate a hard crash after step
    * `crashAfter`: 1 = all ops prepared (marker unpublished) · 2 =
    * marker published, nothing finalized · 2+i = first i ops
    * finalized · large = complete. Effects up to the step are on disk;
    * nothing later runs.
    */
  private[graft] def executeInternal(spark: SparkSession, coordDir: String,
                                     name: String, opsByName: => Seq[Op],
                                     crashAfter: Int): Seq[String] = {
    require(name.nonEmpty && name.forall(c => c.isLetterOrDigit ||
      c == '-' || c == '_' || c == '.'),
      s"cross-store tx name must be [A-Za-z0-9._-]+: '$name'")
    AtomicFs.requireAtomicCommits(spark, coordDir, "cross-store coordinator")
    val fs = fsFor(spark, coordDir)
    fs.mkdirs(new Path(coordDir))
    // roll forward any committed-but-unfinalized predecessor (this
    // name's crashed attempt included) BEFORE reading replay state
    recover(spark, coordDir)
    val committed = markerOf(coordDir, name, "commit")
    // a concurrent vacuumRetired can GC the done marker between the
    // existence probe and the read — treat it as absent (the horizon
    // check below then refuses a numeric replay loudly)
    def recordedTokens(): Option[Seq[String]] =
      try findDone(fs, coordDir, name).orElse(Some(committed).filter(fs.exists))
        .map(readMarker(fs, _).map(_._1.txTokenOfLine))
      catch { case _: java.io.FileNotFoundException => None }
    recordedTokens() match {
      // already committed (recover() above finalized it): exactly-once
      case Some(toks) => return toks
      case None => ()
    }
    // replay at or below the GC horizon: the tx committed and its
    // marker was retired AND vacuumed — re-executing would
    // double-commit, so refuse. NAMING CONTRACT: `<prefix>-<digits>` in
    // a coordinator dir is the per-prefix batch-id namespace (the
    // streaming writer's); a manual tx reusing a stream's prefix with a
    // numeric suffix at/below that stream's horizon is refused here
    // too, indistinguishably — give manual txs their own prefix.
    def refuseBeyondHorizon(): Nothing =
      throw new IllegalStateException(
        s"cross-store tx '$name' already committed: its retired marker " +
          "was GC'd past the retention horizon; refusing to " +
          "re-execute — recorded tokens are no longer available. Replays " +
          "deeper than vacuumRetired's retention are out of contract " +
          "(as is a NEW tx reusing a streaming prefix's numeric " +
          "namespace — use a distinct prefix for manual txs).")
    if (horizonFenced(fs, coordDir, name)) refuseBeyondHorizon()
    // the ops materialize ONLY past the replay short-circuits above:
    // `ops` arrives BY NAME so a committed name's re-CALL never needs
    // its inputs resolvable (the SQL procedure's sources may be
    // dropped temp views), and a horizon-fenced name refuses before
    // source resolution could mask the refusal with a not-found error
    val ops = opsByName
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

    // PREPARE — a failure here aborts every already-prepared op; the
    // tx never reached its commit point, so nothing is visible.
    // The per-store prepares touch DISTINCT stores (enforced above), so
    // they are independent job chains — run them concurrently (guide
    // §2.6) and join in op order, so the marker's line order (and every
    // downstream iteration over `prepared`) is exactly the serial
    // one's. On any failure, every prepare that still completed is
    // aborted before the first failure rethrows.
    def prepareOne(op: Op): Prepared = op match {
      case CandleUpsert(st, b, ord) =>
        acquireStoreLock(st, name)
        st.recordCrossCoord(coordDir)
        PreparedCandle(st, st.prepareUpsert(b, ord), name)
      case VersionedCommit(st, b, ord, at) =>
        // no lock needed: concurrent versioned commits are tx-gated
        // safe by the store's own design
        st.recordCrossCoord(coordDir)
        val (tx, written) = st.prepareDataCommit(b, ord)
        PreparedVersioned(st, tx, written, at)
    }
    val prepared = scala.collection.mutable.ArrayBuffer[Prepared]()
    if (ops.sizeIs == 1)
      try prepared += prepareOne(ops.head)
      catch {
        case t: Throwable =>
          abortAllQuietly(prepared.toSeq).foreach(t.addSuppressed)
          throw t
      }
    else {
      val results = graft.Par.settle(ops.map(op => () => prepareOne(op)))
      results.collect { case Right(p) => p }.foreach(prepared += _)
      results.collectFirst { case Left(t) => t }.foreach { t =>
        abortAllQuietly(prepared.toSeq).foreach(t.addSuppressed)
        throw t
      }
    }
    if (crashAfter <= 1) throw new SimulatedCrash("prepared, marker unpublished")

    // COMMIT POINT — each attempt stages a UNIQUE tmp; the atomic
    // rename onto `<name>.commit` decides the winner (rename fails if
    // the destination exists). The loser presumed-aborts its prepared
    // (still invisible) ops and returns the winner's recorded tokens.
    // The done-existence check straddles the rename: `.done` is the
    // terminal fence against a zombie publishing AFTER the winner
    // already committed and retired.
    def loseTo(reason: String): Seq[String] = {
      // read the winner's tokens BEFORE recover() can retire-and-GC race
      val toks = recordedTokens()
      // drive the winner TERMINAL first: abortOp releases the (shared
      // same-name-content) store lock, which is only safe once every
      // remaining step of the winner's finalize is an idempotent no-op
      try recover(spark, coordDir) catch {
        case t: TornLockState => throw t
        case _: Throwable => ()
      }
      abortAllQuietly(prepared.toSeq).foreach(throw _)
      toks.orElse(recordedTokens()).getOrElse(
        sys.error(s"cross-store tx '$name': $reason, but its recorded " +
          "marker vanished before the loser could read it"))
    }
    if (recordedTokens().isDefined)
      return loseTo("a concurrent same-name coordinator committed first")
    val prim = CommitPrimitives.resolve(spark, coordDir)
    val markerBytes = (prepared.map(_.line).mkString("\n") + "\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    if (!prim.publish(fs, committed, markerBytes)) {
      if (recordedTokens().isDefined)
        return loseTo("lost the commit-marker publish race")
      sys.error(s"could not publish cross-store commit marker for $name")
    }
    // post-rename fence: if the name is ALREADY terminal, the winner
    // committed and retired before our rename landed — withdraw our
    // marker (nothing of ours is visible yet) and abort. Terminal means
    // a live `.done` OR a batch id at/below the GC horizon: a zombie
    // that stalled through the winner's whole commit→retire→vacuum span
    // sees findDone empty, but the horizon file still records the fence.
    findDone(fs, coordDir, name) match {
      case Some(_) =>
        fs.delete(committed, false)
        return loseTo("a same-name coordinator already committed and retired")
      case None if horizonFenced(fs, coordDir, name) =>
        fs.delete(committed, false)
        val torn = abortAllQuietly(prepared.toSeq)
        try refuseBeyondHorizon()
        catch { case e: Throwable => torn.foreach(e.addSuppressed); throw e }
      case None => ()
    }
    if (crashAfter <= 2) throw new SimulatedCrash("marker published, nothing finalized")

    // FINALIZE (roll forward) + retire the marker
    prepared.zipWithIndex.foreach { case (p, i) =>
      p.finalizeOp()
      if (crashAfter == 2 + i + 1)
        throw new SimulatedCrash(s"${i + 1} of ${prepared.length} finalized" +
          (if (i == prepared.length - 1) ", marker unretired" else ""))
    }
    val done = doneMarkerOf(coordDir, name)
    fs.mkdirs(doneDirOf(coordDir))
    if (!prim.moveFile(fs, committed, done) && !fs.exists(done))
      sys.error(s"could not retire cross-store commit marker for $name")
    prepared.map(_.txToken).toSeq
  }

  /** Roll every published-but-unretired cross-store tx forward to
    * completion (the coordinator's WAL-replay analog). Idempotent; run
    * it on restart before trusting either store's tail, and ALWAYS
    * before each store's `vacuum()` (a committed tx's unfinalized
    * versioned half looks exactly like a torn commit until rolled
    * forward). A pending `.commit` whose `.done` already exists is a
    * fenced-off zombie (same name, published after the real commit
    * retired): its prepared ops are ABORTED, never finalized. Also
    * sweeps abandoned pre-commit `.tmp-*` files past the stale age and
    * migrates pre-`_done`-layout retired markers into `_done/`. Returns
    * the number of txs completed.
    */
  def recover(spark: SparkSession, coordDir: String): Int = {
    val fs = fsFor(spark, coordDir)
    if (!fs.exists(new Path(coordDir))) return 0
    val prim = CommitPrimitives.resolve(spark, coordDir)
    val entries = fs.listStatus(new Path(coordDir)).filter(_.isFile)
    val tmpCutoff = System.currentTimeMillis() - staleLockMs
    // anchored on the tmp SHAPE (`<name>.tmp-<attempt>` / legacy
    // `<name>.tmp` / the publish primitive's `<name>.commit.tmp-<id>`),
    // never a substring: tx names may contain dots, and a substring
    // match could delete a committed marker like
    // `nightly.tmp-reload.commit` — a permanent half-commit
    val TmpName = ".*\\.tmp(-[^.]+)?$".r
    entries.filter(s => TmpName.matches(s.getPath.getName) &&
        s.getModificationTime <= tmpCutoff)
      .foreach(s => fs.delete(s.getPath, false))
    // lazy migration: a legacy top-level `.done` moves into `_done/` so
    // the steady-state listing holds only pending work
    entries.map(_.getPath).filter(_.getName.endsWith(".done")).foreach { p =>
      fs.mkdirs(doneDirOf(coordDir))
      val dst = new Path(doneDirOf(coordDir), p.getName)
      prim.moveFile(fs, p, dst)
    }
    val pending = entries.map(_.getPath)
      .filter(_.getName.endsWith(".commit")).sortBy(_.getName)
    // ONE `_done` listing memoizes terminal state for the whole pass —
    // a live findDone+readHorizon per pending marker (and terminal()
    // ran twice per marker) made recovery O(pending × done) metadata
    // reads. The snapshot is taken AFTER the legacy migration above and
    // is safe: while a `.commit` for a name exists no same-name winner
    // can newly retire (its marker rename would fail on the existing
    // destination), and a horizon only ever covers already-retired
    // names the snapshot saw. The one real race — a CONCURRENT recover
    // finishing a marker mid-pass — surfaces as FileNotFoundException
    // on the marker read and re-probes LIVE there.
    val doneListing: Array[String] = {
      val dd = doneDirOf(coordDir)
      if (fs.exists(dd)) fs.listStatus(dd).map(_.getPath.getName)
      else Array.empty
    }
    // legacy-root `.done` names from the PRE-migration listing are
    // terminal too: a migration whose move failed transiently must not
    // make the name look non-terminal — its zombie `.commit` would be
    // FINALIZED over the winner (the live findDone checked both
    // locations; the snapshot must as well)
    val doneNames = doneListing.filter(_.endsWith(".done")).toSet ++
      entries.map(_.getPath.getName).filter(_.endsWith(".done"))
    val horizonCache = scala.collection.mutable.Map.empty[String, Option[Long]]
    def snapHorizon(pfx: String): Option[Long] =
      horizonCache.getOrElseUpdate(pfx, {
        val hp = horizonPrefix(pfx)
        val ids = doneListing.filter(_.startsWith(hp))
          .flatMap(_.stripPrefix(hp).toLongOption)
        if (ids.isEmpty) None else Some(ids.max)
      })
    def snapTerminal(name: String): Boolean =
      doneNames.contains(s"$name.done") || (name match {
        case BatchName(pfx, b) => snapHorizon(pfx).exists(_ >= b)
        case _ => false
      })
    var completed = 0
    pending.foreach { p =>
      val name = p.getName.stripSuffix(".commit")
      val retired = doneMarkerOf(coordDir, name)
      var terminal = snapTerminal(name)
      val lines =
        try readMarker(fs, p)
        catch {
          case e: java.io.FileNotFoundException =>
            // marker vanished mid-pass: a concurrent coordinator
            // finished it — the snapshot predates that, so probe live
            if (!terminal) terminal = findDone(fs, coordDir, name).isDefined ||
              horizonFenced(fs, coordDir, name)
            if (terminal) Seq.empty else throw e
        }
      if (terminal) {
        // zombie marker: this name already committed AND retired (live
        // `.done`, or already GC'd past the horizon — both terminal) —
        // the pending marker is a fenced loser's; abort its invisible ops
        lines.foreach { case (line, _) => line.abortFrom(spark, name) }
        fs.delete(p, false); ()
      } else if (lines.nonEmpty) {
        lines.foreach { case (line, _) => line.finalizeFrom(spark, name) }
        fs.mkdirs(doneDirOf(coordDir))
        if (!prim.moveFile(fs, p, retired) && !fs.exists(retired))
          sys.error(s"could not retire cross-store marker ${p.getName}")
        completed += 1
      }
    }
    completed
  }

  /** GC retired `.done` markers so the coordinator dir stays bounded —
    * the WAL rotate-flush-delete discipline (`wal/persist.go:74-103`)
    * applied to the coordinator log. A marker is dropped once it is
    * older than `retainMs`, or (for `prefix-<batchId>` names) once
    * `batchHorizon = Some((prefix, keepFrom))` declares every batch
    * below `keepFrom` unreplayable — the streaming writer passes the
    * just-committed `batchId` (keeping ITS marker), since a
    * foreachBatch restart replays at most that batch, never an earlier
    * one. Before any numeric-named marker is dropped its batch
    * id is folded into the per-prefix horizon file, so a replay from
    * beyond the retention window is REFUSED by [[execute]] instead of
    * double-committing. Returns the number of markers removed.
    *
    * Exactly-once contract after GC: replays within `retainMs` (or
    * above the batch horizon) still return recorded tokens; deeper
    * replays of numeric names fail loudly; deeper replays of
    * free-form names are out of contract — keep `retainMs` beyond any
    * possible re-submission of the same name.
    *
    * The age path always RETAINS each numeric prefix's newest marker:
    * only the batchHorizon path (which knows the caller's replay floor)
    * may drop a prefix's maximum batch id. An age sweep that dropped an
    * idle stream's newest marker would fold it into the horizon and turn
    * that stream's in-contract restart replay of its LAST batch into a
    * refusal — a wedged query needing a hand-advanced checkpoint. Cost:
    * one `.done` marker per idle prefix outlives `retainMs` (bounded by
    * the number of streams, not by history).
    *
    * `dropPrefixes` is the escape hatch for explicitly DECOMMISSIONED
    * streams: a listed prefix loses the newest-marker retention, so the
    * plain time-based sweep can fully clear it without the operator
    * hand-computing that prefix's batch horizon. Each dropped marker's
    * batch id is still folded into the horizon file first, so a zombie
    * replay of the retired stream is refused, never re-executed — only
    * list a prefix whose stream will NEVER restart from its old
    * checkpoint.
    */
  def vacuumRetired(spark: SparkSession, coordDir: String,
                    retainMs: Long = defaultDoneRetentionMs,
                    batchHorizon: Option[(String, Long)] = None,
                    dropPrefixes: Set[String] = Set.empty): Int = {
    val fs = fsFor(spark, coordDir)
    val dd = doneDirOf(coordDir)
    if (!fs.exists(dd)) return 0
    val cutoff = System.currentTimeMillis() - retainMs
    val all = fs.listStatus(dd).filter(_.getPath.getName.endsWith(".done"))
    val prefixMax: Map[String, Long] = all
      .flatMap(s => s.getPath.getName.stripSuffix(".done") match {
        case BatchName(pfx, b) => Some(pfx -> b)
        case _ => None
      })
      .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val doomed = all.filter { s =>
      val name = s.getPath.getName.stripSuffix(".done")
      val byBatch = (name, batchHorizon) match {
        case (BatchName(pfx, b), Some((hp, keepFrom))) =>
          pfx == hp && b < keepFrom
        case _ => false
      }
      val newestOfPrefix = name match {
        case BatchName(pfx, b) =>
          prefixMax.get(pfx).contains(b) && !dropPrefixes.contains(pfx)
        case _ => false
      }
      byBatch || (s.getModificationTime <= cutoff && !newestOfPrefix)
    }.map(_.getPath)
    // fence FIRST, delete after: a crash in between leaves the marker
    // in place (replay still exactly-once) with the horizon already up
    doomed.flatMap(p => p.getName.stripSuffix(".done") match {
        case BatchName(pfx, b) => Some(pfx -> b)
        case _ => None
      })
      .groupBy(_._1).view.mapValues(_.map(_._2).max)
      .foreach { case (pfx, b) => raiseHorizon(fs, coordDir, pfx, b) }
    doomed.foreach(p => fs.delete(p, false))
    doomed.length
  }

  /** Stable filename id for a coordinator dir's record file under a
    * store's maintenance dir (path-normalized digest — no separators).
    */
  private def coordRecordId(coordDir: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(new Path(coordDir).toUri.toString
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  /** Idempotently record `coordDir` as a coordinator committing into
    * the store whose maintenance dir is `recDir` — read back by
    * [[requireNoPendingCrossTx]], the stores' vacuum fence. Cheap on
    * the hot path: one existence probe once the record exists.
    */
  private[graft] def recordCoordIn(fs: org.apache.hadoop.fs.FileSystem,
                                   recDir: Path, coordDir: String): Unit = {
    val rec = new Path(recDir, s"xcoord-${coordRecordId(coordDir)}")
    if (!fs.exists(rec)) {
      fs.mkdirs(recDir)
      try {
        val os = fs.create(rec, false)
        try os.write(coordDir.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally os.close()
      } catch { case _: java.io.IOException => () } // concurrent record: fine
    }
  }

  /** The stores' ENFORCED recover-before-vacuum: refuse the sweep while
    * any coordinator recorded under `recDir` still has a pending
    * `.commit` marker referencing `storePath`. Such prepared files are
    * COMMITTED (marker published, roll-forward owed) — an age sweep
    * would reclaim them as torn garbage, turning the tx into the very
    * half-commit the protocol exists to prevent. O(#coordinators +
    * pending markers) metadata reads.
    */
  private[graft] def requireNoPendingCrossTx(spark: SparkSession,
                                             fs: org.apache.hadoop.fs.FileSystem,
                                             recDir: Path,
                                             storePath: String): Unit = {
    if (!fs.exists(recDir)) return
    fs.listStatus(recDir).map(_.getPath)
      .filter(_.getName.startsWith("xcoord-"))
      .flatMap { p =>
        try {
          val in = fs.open(p)
          try Some(new String(
            org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
            java.nio.charset.StandardCharsets.UTF_8))
          finally in.close()
        } catch { case _: java.io.FileNotFoundException => None }
      }
      .foreach { coordDir =>
        val pending = pendingMarkersFor(spark, coordDir, storePath)
        if (pending.nonEmpty)
          throw new IllegalStateException(
            s"vacuum refused: cross-store coordinator $coordDir holds " +
              s"${pending.size} pending commit marker(s) referencing " +
              s"$storePath (${pending.take(3).mkString(", ")}) — run " +
              "CrossStoreTx.recover(coordDir) first; an age sweep now " +
              "could reclaim committed-but-unfinalized data as torn garbage")
      }
  }

  /** Pending `.commit` marker names under `coordDir` that reference the
    * store at `storePath` — the set a store's `vacuum()` must see
    * rolled forward (recover first!) before its age sweep may run.
    * O(pending) by the `_done` layout.
    */
  private[graft] def pendingMarkersFor(spark: SparkSession, coordDir: String,
                                       storePath: String): Seq[String] = {
    val fs = fsFor(spark, coordDir)
    if (!fs.exists(new Path(coordDir))) return Seq.empty
    def norm(p: String) = new Path(p).toUri.getPath
    val target = norm(storePath)
    fs.listStatus(new Path(coordDir)).map(_.getPath)
      .filter(_.getName.endsWith(".commit")).toSeq
      .filter { p =>
        try readMarker(fs, p).exists { case (l, _) => norm(l.storePath) == target }
        catch { case _: java.io.FileNotFoundException => false }
      }
      .map(_.getName.stripSuffix(".commit"))
  }

  /** One decoded marker line. */
  private final case class MarkerLine(kind: String, storePath: String,
                                      fields: Seq[String]) {
    def txTokenOfLine: String = fields.head
    def finalizeFrom(spark: SparkSession, txName: String): Unit = kind match {
      case "candle" =>
        val intent = fields.lift(1).map(b64 => CommitIntent.decode(
          new String(java.util.Base64.getDecoder.decode(b64),
            java.nio.charset.StandardCharsets.UTF_8)))
        finalizeCandle(CandleStore(spark, storePath), fields.head, intent,
          txName)
      case "vstore" =>
        val at = fields(2).toLong match {
          case -1L => None
          case ms => Some(new Timestamp(ms))
        }
        VersionedCandleStore(spark, storePath)
          .finalizeDataCommit(fields.head.toLong, fields(1).toLong, at, None,
            verifyData = true)
        ()
      case other => sys.error(s"unknown cross-store marker op '$other'")
    }
    /** Presumed-abort a fenced zombie's prepared op: everything here is
      * still invisible (the candle intent unpublished, the vstore tx
      * unjournaled), so dropping the staging is safe and the vstore
      * half needs nothing (vacuum reclaims the torn files).
      */
    def abortFrom(spark: SparkSession, txName: String): Unit = kind match {
      case "candle" =>
        val store = CandleStore(spark, storePath)
        try store.abortStagedIntent(fields.head)
        catch { case _: IllegalArgumentException => () } // already published: winner's
        releaseStoreLock(store, txName)
      case "vstore" => ()
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
