package graft.store

import org.apache.hadoop.fs.{FileAlreadyExistsException, FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** The commit-primitive seam: every crash-atomic decision the stores
  * and the cross-store coordinator make — intent publish, journal
  * segment publish, data-file install, marker publish/retire, the
  * per-store cross-tx lock — goes through ONE of the operations here,
  * with two interchangeable implementations:
  *
  *  - [[RenamePrimitives]] (default): the HDFS/POSIX protocol —
  *    content staged under a unique tmp name and atomically renamed
  *    into place (rename-fails-if-destination-exists is the winner-
  *    decides point), locks via create-exclusive + atomic
  *    rename-to-tombstone displacement.
  *  - [[ConditionalPutPrimitives]]: the OBJECT-STORE protocol — no
  *    rename anywhere. Publications are one conditional whole-object
  *    put (`create(dest, overwrite = false)` materializing atomically
  *    at close — S3's `If-None-Match: *` conditional write, exposed
  *    through Hadoop's create-builder on capable connectors); file
  *    moves are copy-then-delete with the copy itself a conditional
  *    put (a crash between the two leaves src+dest, which every
  *    caller already treats as moved — the protocols' dest-exists
  *    idempotence); the cross-tx lock becomes a GENERATION-GATED
  *    protocol: the lock's state is the highest-generation write-once
  *    gate file under the lock dir, and every ownership change —
  *    fresh take or stale reclaim — is ONE conditional put of
  *    generation `max+1`, so two racers collide on the same object
  *    name and exactly one wins; supersession requires staleness (a
  *    loser never out-generations a young gate), and release deletes
  *    exactly the content-keyed gates the releasing name owns — a
  *    different holder's gate can never be displaced, so the
  *    torn-lock races the rename tombstone dance guards against
  *    cannot arise (see [[ConditionalPutPrimitives.acquireLock]]).
  *
  * Selection is PER URI SCHEME via
  * `graft.store.conditionalPutSchemes` (comma-separated, e.g.
  * `s3a,gs`): listing a scheme declares its connector provides
  * atomic whole-object conditional creates and consistent listings —
  * true of S3 (strong consistency since 2020, conditional writes
  * since 2024), GCS (`x-goog-if-generation-match: 0`), and Azure
  * Blob (`If-None-Match: *`). Schemes not listed keep the rename
  * protocol; object-store schemes not listed stay REFUSED by
  * [[AtomicFs.requireAtomicCommits]].
  *
  * Cost note, stated honestly: `moveFile` on the conditional-put side
  * STREAMS the bytes by default (the Hadoop FileSystem API has no
  * server-side copy), which for the data-install paths is the same
  * cost class as an object store's own "rename" (S3A rename = server
  * COPY+DELETE). A connector that CAN copy server-side plugs in
  * through the [[ServerSideCopy]] seam — per-scheme, reflective, no
  * dependency — and the streamed fallback (with its cost counter)
  * covers everything else. All protocol decisions ride on small
  * files — markers, intents, journal rows, locks — where a streamed
  * put is a put.
  */
private[graft] sealed trait CommitPrimitives {
  def name: String

  /** Publish complete `content` at `dest` atomically — a commit
    * point. True iff THIS call created `dest`; false iff `dest`
    * already existed (the caller lost the race); genuine IO failures
    * propagate.
    */
  def publish(fs: FileSystem, dest: Path, content: Array[Byte]): Boolean

  /** Move file `src` to `dest`: on a true return `dest` holds the
    * data and `src` is gone (or already was); false iff BOTH sides
    * are missing (lost data — every caller fails loudly). An existing
    * `dest` counts as already-moved (the protocols' name-keyed
    * idempotence: a destination name embeds its tx, so same name =
    * same logical content) and `src` is dropped.
    */
  def moveFile(fs: FileSystem, src: Path, dest: Path): Boolean

  /** Acquire the cross-tx store lock at `lock` for tx `name`, or
    * throw IllegalStateException when a DIFFERENT live holder exists
    * (stale holders age out after `staleMs`; same-name attempts
    * share).
    */
  def acquireLock(fs: FileSystem, lock: Path, name: String,
                  staleMs: Long): Unit

  /** Release `lock` iff tx `name` holds it: a different holder's
    * lock is never touched; an absent lock is a no-op.
    */
  def releaseLock(fs: FileSystem, lock: Path, name: String): Unit

  protected final def readUtf8(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
      java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }

  protected final def writeExclusive(fs: FileSystem, p: Path,
                                     content: Array[Byte]): Boolean =
    try {
      val os = fs.create(p, false)
      try os.write(content) finally os.close()
      true
    } catch { case _: FileAlreadyExistsException => false }
}

/** The HDFS/POSIX implementation — behavior-identical to the code it
  * was factored out of (tmp + atomic rename, tombstone lock dance).
  */
private[graft] object RenamePrimitives extends CommitPrimitives {
  def name = "rename"

  def publish(fs: FileSystem, dest: Path, content: Array[Byte]): Boolean = {
    val tmp = new Path(dest.getParent,
      s"${dest.getName}.tmp-${java.util.UUID.randomUUID()}")
    val os = fs.create(tmp, false)
    try os.write(content) finally os.close()
    if (fs.rename(tmp, dest)) true
    else {
      fs.delete(tmp, false)
      if (fs.exists(dest)) false
      else throw new java.io.IOException(s"could not publish $dest")
    }
  }

  def moveFile(fs: FileSystem, src: Path, dest: Path): Boolean = {
    val renamed =
      try fs.rename(src, dest)
      catch { case _: java.io.FileNotFoundException => false }
    if (renamed) true
    else if (fs.exists(dest)) {
      // name-keyed idempotence: dest already holds this logical file
      try { fs.delete(src, false); () }
      catch { case _: java.io.IOException => () }
      true
    } else false
  }

  def acquireLock(fs: FileSystem, lock: Path, name: String,
                  staleMs: Long): Unit = {
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
        (readUtf8(fs, lock), System.currentTimeMillis() - st.getModificationTime)
      } catch { case _: java.io.FileNotFoundException => ("", Long.MaxValue) }
    if (holder != name && age < staleMs)
      throw new IllegalStateException(
        s"cross-store tx '$holder' holds ${lock.getParent}'s tx lock: one " +
          "in-flight cross-store tx per store — finalize it " +
          "(CrossStoreTx.recover) or wait; a crashed holder's lock " +
          s"ages out after ${staleMs / 3600000} h")
    // atomic reclaim: exactly one contender's rename succeeds; the
    // tombstone is garbage either way
    val tomb = new Path(lock.getParent,
      s"${lock.getName}.reclaim-${java.util.UUID.randomUUID()}")
    if (fs.rename(lock, tomb)) { fs.delete(tomb, false); () }
    if (!tryTake())
      throw new IllegalStateException(
        s"lost the race re-taking ${lock.getParent}'s cross-tx lock")
  }

  def releaseLock(fs: FileSystem, lock: Path, name: String): Unit = {
    // pre-read: when the lock is absent or held by a DIFFERENT tx,
    // return without touching it (displacing a live different-name
    // holder's lock, even for a blink, would let that holder's own
    // release silently no-op or a third tx slip in under it). Only
    // when the pre-read says the lock is OURS does the atomic
    // displace-verify-delete run.
    val preHolder =
      try readUtf8(fs, lock)
      catch { case _: java.io.FileNotFoundException => return }
    if (preHolder != name) return
    val tomb = new Path(lock.getParent,
      s"${lock.getName}.release-${java.util.UUID.randomUUID()}")
    val displaced =
      try fs.rename(lock, tomb)
      catch { case _: java.io.FileNotFoundException => false }
    if (!displaced) return
    // NO IOException tolerance on the tombstone read: it is a private
    // file this tx just created by rename, so a failure here is a torn
    // state the operator must see
    val holder = readUtf8(fs, tomb)
    if (holder == name) { fs.delete(tomb, false); () }
    else if (!fs.rename(tomb, lock)) {
      fs.delete(tomb, false)
      throw new CrossStoreTx.TornLockState(
        s"cross-tx lock at $lock: tx '$holder' was transiently displaced " +
          s"during '$name's release check and a new lock appeared " +
          "meanwhile — two coordinators may believe they hold the store; " +
          "finalize or abort them by hand before retrying")
    }
  }
}

/** The rename-less object-store implementation — see the trait doc. */
private[graft] object ConditionalPutPrimitives extends CommitPrimitives {
  def name = "conditional-put"

  def publish(fs: FileSystem, dest: Path, content: Array[Byte]): Boolean = {
    fs.mkdirs(dest.getParent)
    // the conditional put IS the commit point: the object materializes
    // whole at close or not at all (no partial-content window to hide
    // behind a tmp name)
    writeExclusive(fs, dest, content)
  }

  def moveFile(fs: FileSystem, src: Path, dest: Path): Boolean = {
    if (!fs.exists(src)) return fs.exists(dest)
    fs.mkdirs(dest.getParent)
    // vendor seam first: a declared connector copies SERVER-SIDE (one
    // metadata-priced call instead of bytes through this JVM); declined
    // or unconfigured falls back to the streamed conditional put
    val copied = ServerSideCopy.forFs(fs) match {
      case Some(v) =>
        try v.copy(fs, src, dest)
        catch {
          // BOTH dest-exists spellings: Hadoop's and java.nio's — a
          // vendor impl publishing via Files.copy/createLink naturally
          // throws the nio type, and the race it signals (a peer
          // completed the move) is success for every caller
          case _: FileAlreadyExistsException => true // moved by a peer
          case _: java.nio.file.FileAlreadyExistsException => true
          case _: java.io.FileNotFoundException =>
            return fs.exists(dest) // src vanished: a peer moved it
        }
      case None => false
    }
    if (!copied) {
      ServerSideCopy.streamedCopies.incrementAndGet()
      try {
        val in = fs.open(src)
        try {
          val out = fs.create(dest, false)
          org.apache.hadoop.io.IOUtils.copyBytes(in, out, 65536, true)
        } finally { try in.close() catch { case _: Throwable => () } }
      } catch {
        case _: FileAlreadyExistsException => () // already moved by a peer
        case _: java.io.FileNotFoundException =>
          return fs.exists(dest) // src vanished mid-copy: a peer moved it
      }
    }
    try { fs.delete(src, false); () }
    catch { case _: java.io.IOException => () } // crash-equivalent: dest
    // exists, src lingers — every caller treats dest-exists as moved,
    // and the src is staged garbage its own sweep reclaims
    true
  }

  private def entryPrefix(lock: Path) = s"${lock.getName}.g-"

  private val GenName = "^.*\\.g-([0-9]{20})$".r

  private def entries(fs: FileSystem,
                      lock: Path): Seq[(Long, org.apache.hadoop.fs.FileStatus)] = {
    if (!fs.exists(lock.getParent)) return Seq.empty
    fs.listStatus(lock.getParent).toSeq
      .flatMap(e => e.getPath.getName match {
        case GenName(g) => g.toLongOption.map(_ -> e)
        case _ => None
      })
  }

  private def holderOf(fs: FileSystem,
                       e: org.apache.hadoop.fs.FileStatus): Option[String] =
    try Some(readUtf8(fs, e.getPath))
    catch { case _: java.io.FileNotFoundException => None }

  /** Generation-gated lock, mutually exclusive WITHOUT rename or
    * conditional delete: the lock's state is the HIGHEST-generation
    * `lock.g-<n>` gate file present, and every acquisition — fresh
    * take or stale reclaim — is ONE conditional put of generation
    * `max+1` (generation 1 when none exist). The conditional put is
    * the atomic winner decision: two racers computing the same target
    * generation collide on the same object name and exactly one
    * creates it; the loser re-evaluates and, finding a LIVE
    * different-name holder, refuses. Supersession requires staleness
    * (a loser never out-generations a YOUNG gate), so a lower-
    * generation gate resurfacing after a release is always stale and
    * the next acquirer supersedes it. Same-name attempts SHARE the
    * lock (the protocol's retry/reclaim semantics); release deletes
    * exactly the gens whose content is the releasing name — gates are
    * write-once and content-keyed, so a different holder's gate can
    * never be displaced, and the rename protocol's torn-lock states
    * cannot arise.
    */
  def acquireLock(fs: FileSystem, lock: Path, name: String,
                  staleMs: Long): Unit = {
    fs.mkdirs(lock.getParent)
    val nameBytes = name.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var attempts = 0
    while (attempts < 5) {
      attempts += 1
      val all = entries(fs, lock).sortBy(-_._1)
      val current = all.headOption
      val holder = current.flatMap { case (_, e) => holderOf(fs, e) }
      val age = current.map(c =>
        System.currentTimeMillis() - c._2.getModificationTime)
      (holder, age) match {
        case (Some(h), _) if h == name => return // shared same-name hold
        case (Some(h), Some(a)) if a < staleMs =>
          throw new IllegalStateException(
            s"cross-store tx '$h' holds ${lock.getParent}'s tx lock: one " +
              "in-flight cross-store tx per store — finalize it " +
              "(CrossStoreTx.recover) or wait; a crashed holder's lock " +
              s"ages out after ${staleMs / 3600000} h")
        case _ => // absent, vanished mid-read, or stale: supersede it
          val target = current.map(_._1).getOrElse(0L) + 1
          val gate = new Path(lock.getParent,
            f"${entryPrefix(lock)}$target%020d")
          if (writeExclusive(fs, gate, nameBytes)) {
            // clean superseded generations (stale by construction) so a
            // later release cannot resurface them as the current state
            all.foreach { case (_, e) =>
              try { fs.delete(e.getPath, false); () }
              catch { case _: java.io.IOException => () }
            }
            return
          }
        // lost the conditional put: loop and re-evaluate the new state
      }
    }
    throw new IllegalStateException(
      s"lost the race re-taking ${lock.getParent}'s cross-tx lock")
  }

  def releaseLock(fs: FileSystem, lock: Path, name: String): Unit =
    // delete exactly the gates THIS name owns: gates are write-once
    // content-keyed files, so no other tx's lock can ever be displaced
    entries(fs, lock).foreach { case (_, e) =>
      if (holderOf(fs, e).contains(name)) {
        try { fs.delete(e.getPath, false); () }
        catch { case _: java.io.IOException => () }
      }
    }
}

private[graft] object CommitPrimitives {
  /** Comma-separated URI schemes served by [[ConditionalPutPrimitives]];
    * everything else uses [[RenamePrimitives]].
    */
  val schemesConf = "graft.store.conditionalPutSchemes"

  private[graft] def conditionalPutSchemes(spark: SparkSession): Set[String] =
    spark.conf.getOption(schemesConf)
      .map(_.split(",").iterator.map(_.trim.toLowerCase(java.util.Locale.ROOT))
        .filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty)

  def resolve(spark: SparkSession, path: String): CommitPrimitives = {
    val scheme = Option(new Path(path).toUri.getScheme)
      .map(_.toLowerCase(java.util.Locale.ROOT)).getOrElse("file")
    if (conditionalPutSchemes(spark).contains(scheme)) ConditionalPutPrimitives
    else RenamePrimitives
  }
}

/** Vendor seam for SERVER-SIDE copy on conditional-put schemes: the
  * Hadoop `FileSystem` API has no copy primitive, so
  * [[ConditionalPutPrimitives.moveFile]] streams bytes through this
  * JVM by default — correct, but for multi-GB data installs a capable
  * connector (S3 `CopyObject`, GCS `Objects.rewrite`, ABFS
  * server-side copy) does the same work as ONE metadata-priced call.
  * Implementations plug in per scheme through the HADOOP conf:
  *
  * {{{ graft.store.serverSideCopy.<scheme> = fully.qualified.ClassName }}}
  *
  * naming a zero-arg-constructible [[ServerSideCopy]]. The contract
  * mirrors the streamed path it replaces:
  *  - the copy must be CONDITIONAL (never overwrite an existing
  *    `dest` — dest-exists is the moved-by-a-peer case and must
  *    surface as [[FileAlreadyExistsException]] or a `true` return,
  *    never a clobber);
  *  - return `true` iff `dest` now exists with src's complete
  *    content; return `false` to DECLINE (caller falls back to the
  *    streamed copy — e.g. cross-bucket moves a connector can't
  *    rewrite); throw on real IO failures;
  *  - `src` is never deleted by the implementation (the caller owns
  *    the delete half of the move and its crash semantics).
  *
  * [[ServerSideCopy.streamedCopies]] counts the fallback's uses — the
  * cost-accounting hook the object-store shim specs assert against
  * (one streamed copy per data install by default, zero once a vendor
  * impl is declared).
  */
trait ServerSideCopy {
  def copy(fs: FileSystem, src: Path, dest: Path): Boolean
}

object ServerSideCopy {
  /** Hadoop-conf key prefix; append the URI scheme. */
  val confPrefix = "graft.store.serverSideCopy."

  private val cache =
    scala.collection.concurrent.TrieMap[String, ServerSideCopy]()

  private[store] def forFs(fs: FileSystem): Option[ServerSideCopy] = {
    val scheme = Option(fs.getUri.getScheme)
      .map(_.toLowerCase(java.util.Locale.ROOT)).getOrElse("file")
    Option(fs.getConf.get(confPrefix + scheme)).map { cls =>
      cache.getOrElseUpdate(cls,
        Class.forName(cls).getDeclaredConstructor().newInstance()
          .asInstanceOf[ServerSideCopy])
    }
  }

  /** Streamed-fallback counter (process-wide, monotonic) — cost
    * accounting for specs and operators: a data install on a declared
    * conditional-put scheme SHOULD cost zero of these once a vendor
    * copy is configured.
    */
  private[graft] val streamedCopies =
    new java.util.concurrent.atomic.AtomicLong(0)
}
