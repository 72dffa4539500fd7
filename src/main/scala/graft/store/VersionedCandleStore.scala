package graft.store

import java.sql.Timestamp

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.Candle

/** Append-only, versioned candle store: every commit stamps its rows
  * with a monotonically increasing `tx_id`, and reads reconstruct the
  * table AS OF any transaction or wall-clock instant — the Spark-native
  * materialization of the reference's `LastTxId` versioning
  * (`page/header.go:13-23`: every page records the last transaction
  * applied to it) and its persistent tx counter (`wal/counter.go:13-94`),
  * which [[CandleStore]]'s overwrite-in-place upsert deliberately
  * flattens away.
  *
  * Concurrency (reference: persistent counter + lock manager,
  * `wal/counter.go:59-69`, `database/concurrency/db.go:68-156`):
  *  - tx ids are allocated via ATOMIC create of a reserve file under
  *    `_txn/` (`FileSystem.create(overwrite = false)` — atomic on the
  *    HDFS namenode and on local file systems; object stores would use
  *    a conditional put). Two concurrent committers always mint
  *    DISTINCT ids.
  *  - each commit writes its data to a private `_stage/tx-N` directory
  *    (no shared-output-committer contention), then moves the files
  *    into the live generation with metadata renames, then publishes a
  *    single journal file `txlog/tx-N-commit.parquet` (again a rename —
  *    no two commits ever write the same file).
  *  - readers gate on the journal's COMMITTED SET (broadcast semi-join
  *    on `tx_id`, not a `<= max` filter), so a torn commit — data moved,
  *    journal row missing — is invisible even when a later tx has
  *    already journaled. Redo-on-retry converges (mirrors the
  *    reference's committed-only replay, `wal/flusher.go:110-128`).
  *  - [[compact]] excludes concurrent compacts via an atomic
  *    `_compact.lock` (the reference takes the DB-exclusive flush
  *    lock); commits may run concurrently with it — a commit landing
  *    in the superseded generation is carried forward by metadata
  *    renames (compact's post-publish sweep + the writer's post-move
  *    re-check cover both interleavings).
  *
  * Layout: `path/data-gNNNNNNNNN/` generations of the same
  * Hive-partitioned Parquet layout as [[CandleStore]] plus a `tx_id`
  * data column (row-group stats prune as-of filters). A generation is
  * live once its `_GRAFT_COMMITTED` marker exists; readers resolve the
  * highest committed generation, so the compaction swap is one atomic
  * marker create — never a delete→rename visibility gap. `path/txlog`
  * is a tiny append-only journal with one file per commit —
  * the persistent-counter analog: `latestTxId` reads the journal,
  * never the data.
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

  private val txLogPath = s"$path/txlog"
  private val txnPath = s"$path/_txn"
  private val stagePath = s"$path/_stage"
  private val CommitMarker = "_GRAFT_COMMITTED"

  private def hp(s: String): Path = new Path(s)
  private def fs: FileSystem =
    hp(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Atomic create-if-absent: the one primitive the whole tx protocol
    * leans on (the reference's counter file lock, `wal/counter.go:59-69`).
    * Returns false ONLY for already-exists; genuine IO failures
    * (disk-full, permissions) rethrow — swallowing them would spin
    * [[reserveTxId]] forever and misreport maintenance-lock contention.
    *
    * On `file:` filesystems this MUST go through
    * `java.io.File.createNewFile` (POSIX O_CREAT|O_EXCL — atomic):
    * Hadoop's RawLocalFileSystem `create(overwrite = false)` is a
    * non-atomic exists-check-then-open, and two racing committers can
    * both win it — the concurrency soak caught exactly that (duplicate
    * tx ids sharing one staging dir). HDFS `create` is atomic on the
    * namenode; object stores would use a conditional put.
    */
  private def tryCreate(f: FileSystem, p: Path): Boolean = {
    val resolved = f.makeQualified(p)
    if (resolved.toUri.getScheme == "file") {
      val file = new java.io.File(resolved.toUri.getPath)
      val parent = file.getParentFile
      if (parent != null) { parent.mkdirs(); () }
      file.createNewFile()
    } else
      try { f.create(p, false).close(); true }
      catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case e: java.io.IOException => if (f.exists(p)) false else throw e
      }
  }

  // ------------------------------------------------------------------ //
  // Journal                                                            //
  // ------------------------------------------------------------------ //

  private val txLogSchema = StructType(Seq(
    StructField("tx_id", LongType, nullable = false),
    StructField("n_rows", LongType, nullable = false),
    StructField("committed_at", TimestampType, nullable = true),
    StructField("kind", StringType, nullable = false),
    StructField("batch_id", LongType, nullable = true)))

  private def txLogExists: Boolean = {
    val f = fs
    f.exists(hp(txLogPath)) && f.listStatus(hp(txLogPath)).nonEmpty
  }

  /** The commit journal: one row per commit (`kind = 'commit'`) or
    * compaction (`kind = 'compact'`) — the reference's persistent
    * counter + WAL index analog. `batch_id` carries the streaming
    * micro-batch id when the commit came from a stream (exactly-once
    * replay guard); null for batch commits.
    */
  def txLog(): DataFrame =
    if (!txLogExists)
      spark.createDataFrame(new java.util.ArrayList[Row](), txLogSchema)
    else spark.read.schema(txLogSchema).parquet(txLogPath)

  /** Highest committed tx id (0 when empty) — journal-only read. */
  def latestTxId: Long = {
    val r = txLog().where(col("kind") === "commit").agg(max("tx_id")).head()
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  /** Highest tx id squashed away by [[compact]] (0 if never compacted):
    * as-of reads below this point would see partial history and FAIL
    * LOUDLY instead.
    */
  def squashFloorTxId: Long = {
    val r = txLog().where(col("kind") === "compact").agg(max("tx_id")).head()
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  /** Publish one journal row as its own `txlog` file: written to a
    * private stage dir by an isolated Spark job, then RENAMED in — two
    * concurrent committers never touch the same output directory, so
    * there is no shared FileOutputCommitter `_temporary` to race on.
    */
  private def writeJournalRow(tx: Long, nRows: Long, at: Timestamp,
                              kind: String, batchId: Option[Long]): Unit = {
    import spark.implicits._
    val stage = s"$stagePath/txlog-$kind-$tx"
    Seq((tx, nRows, at, kind, batchId))
      .toDF("tx_id", "n_rows", "committed_at", "kind", "batch_id")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(stage)
    val f = fs
    f.mkdirs(hp(txLogPath))
    val part = f.listStatus(hp(stage)).map(_.getPath)
      .find(_.getName.endsWith(".parquet"))
      .getOrElse(throw new IllegalStateException(s"no journal part file in $stage"))
    val dst = new Path(txLogPath, f"tx-$tx%020d-$kind.parquet")
    // rename returns false instead of throwing on some filesystems — an
    // unjournaled "successful" commit would be invisible forever and
    // vacuum()ed away, so a failed publish must fail the commit.
    if (!f.rename(part, dst))
      throw new java.io.IOException(s"journal publish failed: $part -> $dst")
    f.delete(hp(stage), true)
    ()
  }

  // ------------------------------------------------------------------ //
  // Tx-id allocation                                                   //
  // ------------------------------------------------------------------ //

  private val ReserveName = "tx-(\\d{20})\\.reserve".r

  /** Allocate the next tx id atomically: starting past both the journal
    * max and the highest outstanding reservation, race to create
    * `_txn/tx-N.reserve`; the creator owns N, losers probe N+1. Distinct
    * ids for any number of concurrent committers, monotone with commit
    * order up to in-flight reordering (ids are reserved in order; the
    * journal records whichever data lands).
    */
  private[graft] def reserveTxId(): Long = {
    val f = fs
    f.mkdirs(hp(txnPath))
    val reservedMax = f.listStatus(hp(txnPath)).map(_.getPath.getName)
      .collect { case ReserveName(id) => id.toLong }
      .foldLeft(0L)(math.max)
    var tx = math.max(latestTxId, reservedMax) + 1
    while (!tryCreate(f, new Path(txnPath, f"tx-$tx%020d.reserve"))) tx += 1
    tx
  }

  // ------------------------------------------------------------------ //
  // Generations                                                        //
  // ------------------------------------------------------------------ //

  private val GenName = "data-g(\\d{9})".r
  private def genDirName(g: Long): String = f"data-g$g%09d"

  /** Committed generations, ascending. A generation without its marker
    * (compaction in flight / crashed) is invisible.
    */
  private def generations(): Seq[(Long, Path)] = {
    val f = fs
    if (!f.exists(hp(path))) Seq.empty
    else f.listStatus(hp(path)).filter(_.isDirectory).flatMap { st =>
      st.getPath.getName match {
        case GenName(g) if f.exists(new Path(st.getPath, CommitMarker)) =>
          Some((g.toLong, st.getPath))
        case _ => None
      }
    }.sortBy(_._1).toSeq
  }

  private def currentGen(): Option[(Long, Path)] = generations().lastOption

  private def ensureGen(): Path = currentGen() match {
    case Some((_, p)) => p
    case None =>
      val p = hp(s"$path/${genDirName(1L)}")
      val f = fs
      f.mkdirs(p)
      tryCreate(f, new Path(p, CommitMarker)) // idempotent race: both land on gen 1
      // return the LISTED path (scheme-qualified) so generation
      // identity compares canonically across calls
      currentGen().map(_._2).getOrElse(p)
  }

  /** Move every data file under `src` into the mirrored directory under
    * `dst`, prefixing names with the tx id (uniqueness across commits).
    * Pure metadata renames — no data copy on HDFS/local.
    */
  private def moveTree(f: FileSystem, src: Path, dst: Path, prefix: String): Unit = {
    f.listStatus(src).foreach { st =>
      val name = st.getPath.getName
      if (st.isDirectory) {
        val sub = new Path(dst, name)
        f.mkdirs(sub)
        moveTree(f, st.getPath, sub, prefix)
      } else if (!name.startsWith("_") && !name.startsWith(".")) {
        val to = new Path(dst, s"$prefix-$name")
        // a silently dropped data file would journal an incomplete
        // commit as successful — fail the commit instead
        if (!f.rename(st.getPath, to))
          throw new java.io.IOException(s"data move failed: ${st.getPath} -> $to")
      }
    }
  }

  // ------------------------------------------------------------------ //
  // Commit                                                             //
  // ------------------------------------------------------------------ //

  /** Commit one batch as the next transaction; returns its tx id.
    * Within-batch duplicates resolve exactly as [[CandleStore.upsert]]
    * (higher ordinal wins, else content tie-break); cross-batch
    * last-wins happens at read time via tx ordering. Safe under
    * concurrent committers (distinct tx ids, isolated staging, journal
    * gating — see class doc).
    *
    * @param committedAt journal wall-clock for [[scanAsOfTime]];
    *   defaults to now. Pass explicitly for deterministic replays.
    * @param batchId streaming micro-batch id: when a commit with the
    *   same batch id is already journaled, the call is a no-op
    *   returning the prior tx id — the exactly-once replay guard for
    *   `foreachBatch` retries (the reference's WAL replay skips
    *   already-applied tx ids the same way, `wal/flusher.go:110-128`).
    */
  def commit(batch: DataFrame, ordinalCol: Option[String] = None,
             committedAt: Option[Timestamp] = None,
             batchId: Option[Long] = None): Long = {
    val replayed = batchId.flatMap { b =>
      txLog()
        .where(col("kind") === "commit" && col("batch_id") === b)
        .select("tx_id").limit(1).collect().headOption.map(_.getLong(0))
    }
    replayed.getOrElse(doCommit(batch, ordinalCol, committedAt, batchId))
  }

  private def doCommit(batch: DataFrame, ordinalCol: Option[String],
                       committedAt: Option[Timestamp],
                       batchId: Option[Long]): Long = {
    val tx = reserveTxId()
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
    val stage = s"$stagePath/tx-$tx"
    CandleStore.withMicrosTimestamps(deduped) {
      deduped
        .hint("rebalance", Candle.partitionCols: _*)
        .sortWithinPartitions((Candle.partitionCols :+ "ts").map(col): _*)
        .write
        .partitionBy(Candle.partitionCols: _*)
        .mode(SaveMode.Overwrite)
        .parquet(stage)
    }
    // row count from the staged footers (metadata read), not a second
    // execution of the dedup aggregation
    val written = spark.read.parquet(stage).count()
    val f = fs
    val gen = ensureGen()
    moveTree(f, hp(stage), gen, f"tx$tx%020d")
    f.delete(hp(stage), true)
    // Compaction-race re-check LOOP: if compactions published newer
    // generations while this commit was moving into an older one, carry
    // our own files along the generation chain until it is stable.
    // Together with compact()'s post-publish sweep this closes the race
    // for any number of overlapping compactions: a sweep that ran
    // before our files landed is covered by our next loop iteration
    // (the marker it published is visible to us), and files we leave in
    // a superseded generation before stalling are relayed by the next
    // compaction's sweep of that generation.
    var genSeen = gen
    var genNow = ensureGen()
    while (genNow.toUri.getPath != genSeen.toUri.getPath) {
      carryFiles(f, genSeen, genNow, _ == tx)
      genSeen = genNow
      genNow = ensureGen()
    }
    // Journal entry AFTER the data move: a torn commit (data moved,
    // journal not) is invisible to readers, which admit only tx ids
    // present in the journal's committed set.
    writeJournalRow(tx, written,
      committedAt.getOrElse(new Timestamp(System.currentTimeMillis())),
      "commit", batchId)
    tx
  }

  // ------------------------------------------------------------------ //
  // Reads                                                              //
  // ------------------------------------------------------------------ //

  /** Data-file schema (partition columns included): passed explicitly to
    * every generation read — no schema inference job, and an
    * empty-but-published generation stays readable.
    */
  private val dataSchema = StructType(
    Candle.schema.fields.toSeq :+ StructField("year", IntegerType) :+
      StructField("tx_id", LongType))

  /** Output column order of every scan: key, ts, year, then content. */
  private val scanCols = Seq("market", "code", "candle_length", "ts", "year",
    "open", "high", "low", "close", "volume", "bit_fields")

  private def emptyTable(): DataFrame =
    spark.createDataFrame(new java.util.ArrayList[Row](),
      StructType(scanCols.map(n =>
        dataSchema.fields.find(_.name == n).get)))

  /** One driver-side journal read serving a whole scan: (squash floor,
    * committed (tx id, committed_at) pairs sorted by id). The journal is
    * metadata-scale by construction — one row per commit, exactly like
    * the reference's memory-resident WAL index (`wal/reader.go:29-75`).
    */
  private def journalSnapshot(): (Long, Array[(Long, Timestamp)]) = {
    val rows = txLog().select("tx_id", "kind", "committed_at").collect()
    val floor = rows.iterator.filter(_.getString(1) == "compact")
      .map(_.getLong(0)).foldLeft(0L)(math.max)
    val committed = rows.iterator.filter(_.getString(1) == "commit")
      .map(r => (r.getLong(0), r.getTimestamp(2))).toArray.sortBy(_._1)
    (floor, committed)
  }

  /** Scan of the current generation admitting exactly `admitted` tx ids:
    * compiled to PURE SCAN PREDICATES — `tx_id <= cap` plus a NOT IN
    * over the excluded ids below cap (torn-commit gaps and, for
    * time-addressed reads, later-journaled commits) — both pushed into
    * the Parquet reader for row-group pruning. No join stage.
    */
  private def gatedScan(admitted: Array[Long]): DataFrame =
    currentGen() match {
      case None => emptyTable()
      case Some((_, genDir)) =>
        val cap = if (admitted.isEmpty) 0L else admitted.max
        val present = admitted.toSet
        val excluded = (1L to cap).filterNot(present)
        val gate =
          if (excluded.isEmpty) col("tx_id") <= cap
          else col("tx_id") <= cap && !col("tx_id").isInCollection(excluded)
        foldLatest(spark.read.schema(dataSchema).parquet(genDir.toString)
          .where(gate))
    }

  /** Last-wins history fold shared by reads and compaction. */
  private def foldLatest(df: DataFrame): DataFrame = {
    val contentStruct = struct(col("open"), col("high"), col("low"),
      col("close"), col("volume"), col("bit_fields"))
    df.withColumn("_c", contentStruct)
      .groupBy((Candle.keyCols ++ Seq("ts", "year")).map(col): _*)
      .agg(max_by(col("_c"), col("tx_id")).as("_w"))
      .select("market", Candle.keyCols.tail ++ Seq("ts", "year", "_w.*"): _*)
  }

  /** The table as of transaction `txId` (inclusive): per (series key,
    * ts), the row from the highest COMMITTED tx ≤ txId wins. One hash
    * aggregation (map-side combine), no sort window; commits dedup
    * within batch, so (key, ts, tx_id) is unique and the fold is
    * deterministic. Committed-set gating makes data from torn or
    * in-flight commits invisible regardless of id ordering (see
    * [[gatedScan]]); one journal read per scan.
    *
    * Fails loudly when `txId` predates the [[compact]] squash floor —
    * that history has been discarded, and an empty result would be a
    * silent lie.
    */
  def scanAsOf(txId: Long): DataFrame = {
    val (floor, committed) = journalSnapshot()
    require(txId >= floor,
      s"as-of tx $txId predates the compaction squash point (tx $floor): " +
        "that history has been discarded by compact()")
    gatedScan(committed.map(_._1).filter(_ <= txId))
  }

  /** The table as of a wall-clock instant: exactly the commits whose
    * journal `committed_at` ≤ `t` (the reference's WAL-ordered history
    * addressed the way users actually ask — "as of yesterday 18:00").
    * Under concurrent committers journal ids and wall-clocks can
    * disagree (tx 2 may journal after tx 3), so the gate admits the
    * time-eligible SET — a later-journaled lower id is excluded even
    * when a higher id is admitted, reproducing what a reader at time
    * `t` could actually have seen. Before the first eligible commit the
    * result is empty; below the squash floor it fails loudly like
    * [[scanAsOf]].
    */
  def scanAsOfTime(t: Timestamp): DataFrame = {
    val (floor, committed) = journalSnapshot()
    val eligible = committed.filter { case (_, at) =>
      at != null && !at.after(t)
    }.map(_._1)
    if (eligible.isEmpty) emptyTable()
    else {
      // compact() squashes [1, floor] into one row per key: any
      // time-EXCLUDED tx at or below the floor means the state at `t`
      // needed pre-squash history that no longer exists — partial
      // results would be a silent lie, so fail loudly (same contract as
      // scanAsOf below the floor).
      val eligibleSet = eligible.toSet
      val discarded = committed.map(_._1)
        .filter(id => id <= floor && !eligibleSet(id))
      require(discarded.isEmpty,
        s"as-of time $t excludes tx(s) ${discarded.mkString(",")} at or below " +
          s"the compaction squash point (tx $floor): that interleaving's " +
          "history has been discarded by compact()")
      require(eligible.max >= floor,
        s"as-of time $t resolves below the compaction squash point (tx $floor): " +
          "that history has been discarded by compact()")
      gatedScan(eligible)
    }
  }

  /** Latest committed state. */
  def scan(): DataFrame = scanAsOf(Long.MaxValue)

  // ------------------------------------------------------------------ //
  // Compaction                                                         //
  // ------------------------------------------------------------------ //

  /** Squash history: rewrite the data to one version per key — each
    * surviving row KEEPS its original `tx_id` (so as-of reads at or
    * after the squash floor are exact; reads below it throw — see
    * [[scanAsOf]]). The swap is atomic: the squashed copy is written to
    * the NEXT generation directory and published by creating its
    * `_GRAFT_COMMITTED` marker; readers that already resolved the old
    * generation keep a consistent view (the previous generation is
    * retained; only older ones are deleted). The journal is kept, so tx
    * ids keep increasing monotonically.
    *
    * Mutual exclusion: concurrent compacts are excluded by an atomic
    * `_compact.lock`. Commits may run concurrently: a commit landing in
    * the superseded generation is reconciled by metadata renames — the
    * post-publish carry-forward sweep here plus the writer-side
    * re-check in `doCommit` cover both interleavings, so no committed
    * row is ever stranded in a superseded generation. (The reference
    * instead holds the DB-exclusive lock for its WAL group flush,
    * `database/concurrency/db.go:68-156`.)
    */
  def compact(committedAt: Option[Timestamp] = None): Long = {
    val f = fs
    f.mkdirs(hp(path))
    val lock = hp(s"$path/_compact.lock")
    if (!tryCreate(f, lock))
      throw new IllegalStateException(s"another compaction holds $lock")
    try {
      val snapshot = journalSnapshot()
      val committedIds = snapshot._2.map(_._1)
      val latest = committedIds.lastOption.getOrElse(0L)
      if (latest == 0L) return 0L
      // no-op early-out: everything up to `latest` is already squashed
      // (also avoids publishing a duplicate tx-<latest>-compact journal
      // file, whose rename would fail on rename-no-overwrite filesystems)
      if (latest == snapshot._1) return latest
      val (curGenId, curGenDir) = currentGen().get
      // same pure-predicate committed gate as scanAsOf
      val present = committedIds.toSet
      val torn = (1L to latest).filterNot(present)
      val gate =
        if (torn.isEmpty) col("tx_id") <= latest
        else col("tx_id") <= latest && !col("tx_id").isInCollection(torn)
      // one version per key, WINNING row's tx_id preserved (content and
      // tx travel together in one struct, picked by tx order)
      val withTx = struct(col("open"), col("high"), col("low"),
        col("close"), col("volume"), col("bit_fields"), col("tx_id"))
      val squashed = spark.read.schema(dataSchema).parquet(curGenDir.toString)
        .where(gate)
        .withColumn("_c", withTx)
        .groupBy((Candle.keyCols ++ Seq("ts", "year")).map(col): _*)
        .agg(max_by(col("_c"), col("tx_id")).as("_w"))
        .select("market", Candle.keyCols.tail ++ Seq("ts", "year", "_w.*"): _*)
      val newGen = hp(s"$path/${genDirName(curGenId + 1)}")
      CandleStore.withMicrosTimestamps(squashed) {
        squashed
          .hint("rebalance", Candle.partitionCols: _*)
          .sortWithinPartitions((Candle.partitionCols :+ "ts").map(col): _*)
          .write.partitionBy(Candle.partitionCols: _*)
          .mode(SaveMode.Overwrite).parquet(newGen.toString)
      }
      val nRows = spark.read.parquet(newGen.toString).count()
      tryCreate(f, new Path(newGen, CommitMarker)) // atomic publish
      // Reconcile commits that raced the compaction: any data file in
      // the old generation whose tx is NOT part of the squash snapshot
      // (journaled later, or still torn) is carried forward by metadata
      // rename — file names embed their tx id, so no data is read.
      // This sweep runs AFTER publish; combined with the writer-side
      // re-check in doCommit (a writer that moved into a superseded
      // generation carries its own files before journaling), every
      // racing commit ends up in the new generation: either the
      // writer's move preceded this sweep (swept here), or the writer's
      // post-move re-check saw the published marker (self-carried).
      carryFiles(f, curGenDir, newGen, txId => !present(txId))
      writeJournalRow(latest, nRows,
        committedAt.getOrElse(new Timestamp(System.currentTimeMillis())),
        "compact", None)
      // GC: keep the new and previous generations (in-flight readers of
      // the old one stay consistent); drop anything older, plus reserve
      // files at or below the floor (allocation starts past the journal
      // max, so they can never be re-minted).
      generations().dropRight(2).foreach { case (_, p) => f.delete(p, true) }
      if (f.exists(hp(txnPath)))
        f.listStatus(hp(txnPath)).map(_.getPath).foreach { p =>
          p.getName match {
            case ReserveName(id) if id.toLong <= latest => f.delete(p, false)
            case _ => ()
          }
        }
      latest
    } finally { f.delete(lock, false); () }
  }

  private val DataFileName = "tx(\\d{20})-.*".r

  /** COPY every data file under `from` whose embedded tx id satisfies
    * `shouldCarry` into the mirrored path under `to`; returns files
    * carried. The compaction-race reconciliation primitive. Copies, not
    * renames: in-flight readers that already listed the source
    * generation must keep every file they saw (a moved-away file is a
    * FileNotFoundException at execution time), and a duplicate of the
    * same tx's rows across generations is harmless — every read
    * resolves exactly ONE generation. Raced files are rare and small
    * (one commit's worth), so the copy cost is bounded. A concurrent
    * carry of the same file is benign: names are globally unique
    * (tx prefix + task uuid), and whoever lands last wins with
    * identical bytes.
    */
  private def carryFiles(f: FileSystem, from: Path, to: Path,
                         shouldCarry: Long => Boolean): Int = {
    if (from.toUri.getPath == to.toUri.getPath) return 0
    var carried = 0
    val conf = spark.sparkContext.hadoopConfiguration
    def walk(src: Path, dst: Path): Unit =
      f.listStatus(src).foreach { st =>
        val name = st.getPath.getName
        if (st.isDirectory) walk(st.getPath, new Path(dst, name))
        else name match {
          case DataFileName(id) if shouldCarry(id.toLong) =>
            f.mkdirs(dst)
            val target = new Path(dst, name)
            if (!f.exists(target)) {
              org.apache.hadoop.fs.FileUtil.copy(f, st.getPath, f, target,
                false, true, conf)
              carried += 1
            }
          case _ => ()
        }
      }
    if (f.exists(from)) walk(from, to)
    carried
  }

  /** Garbage-collect TORN commits: data files that were moved into a
    * generation but never journaled (writer crashed between the move and
    * the journal append). They are invisible to every read (committed-set
    * gating), so this is pure space reclamation — the reference's
    * discard-uncommitted-on-replay (`wal/flusher.go:93-131`) as a
    * maintenance op. Also drops reserve files with no journal entry.
    * Returns the number of files removed.
    *
    * An IN-FLIGHT commit looks exactly like a torn one (files moved,
    * journal pending), so candidates younger than `minAgeMs` are
    * skipped — deleting a live commit's files would journal an empty
    * transaction and free its reserve for re-minting. The default
    * (24 h) is far beyond any real commit duration; pass 0 ONLY when
    * the caller guarantees no concurrent writers.
    */
  def vacuum(minAgeMs: Long = 24L * 3600 * 1000): Int = {
    val f = fs
    if (!f.exists(hp(path))) return 0
    val lock = hp(s"$path/_compact.lock")
    if (!tryCreate(f, lock))
      throw new IllegalStateException(s"another maintenance op holds $lock")
    try {
      val journaled = txLog().select("tx_id").collect().map(_.getLong(0)).toSet
      val cutoff = System.currentTimeMillis() - minAgeMs
      var removed = 0
      def sweep(dir: Path): Unit =
        f.listStatus(dir).foreach { st =>
          if (st.isDirectory) sweep(st.getPath)
          else st.getPath.getName match {
            case DataFileName(id) if !journaled(id.toLong) &&
                st.getModificationTime <= cutoff =>
              f.delete(st.getPath, false); removed += 1
            case _ => ()
          }
        }
      generations().foreach { case (_, p) => sweep(p) }
      if (f.exists(hp(txnPath)))
        f.listStatus(hp(txnPath)).foreach { st =>
          st.getPath.getName match {
            case ReserveName(id) if !journaled(id.toLong) &&
                st.getModificationTime <= cutoff =>
              f.delete(st.getPath, false); removed += 1
            case _ => ()
          }
        }
      removed
    } finally { f.delete(lock, false); () }
  }
}

object VersionedCandleStore {
  def apply(spark: SparkSession, path: String): VersionedCandleStore =
    new VersionedCandleStore(spark, path)
}
