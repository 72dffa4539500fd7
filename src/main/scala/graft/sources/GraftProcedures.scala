package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import graft.store.{CandleStore, VersionedCandleStore}

/** SQL maintenance statements for graft catalog tables, as DataSource
  * V2 stored procedures (Spark's own `CALL` machinery — the Iceberg
  * `CALL cat.system.proc(...)` shape; Delta ships the same surface as
  * `VACUUM`/`OPTIMIZE`/`DESCRIBE HISTORY` statements):
  *
  * {{{
  * CALL vstore.system.compact(table => 'markets.btc')
  * CALL vstore.system.vacuum('markets.btc', min_age_ms => 0)
  * CALL vstore.system.checkpoint_journal('markets.btc')
  * CALL vstore.system.history('markets.btc')        -- journal rows
  * CALL vstore.system.break_stale_lock('markets.btc')
  * CALL candles.system.compact('markets.btc', max_files_per_partition => 4)
  * CALL candles.system.vacuum('markets.btc')
  * CALL candles.system.recover('markets.btc')
  * SHOW PROCEDURES IN vstore.system
  * DESCRIBE PROCEDURE vstore.system.compact
  * }}}
  *
  * Before this surface existed, `compact()` / `vacuum()` /
  * `checkpointJournal()` / `txLog()` were Scala-only
  * ([[graft.store.VersionedCandleStore]]) — a SQL-only operator could
  * read and write a fully cataloged table but never maintain it.
  *
  * Every procedure takes the table as a dotted catalog-relative name
  * (`'ns1.ns2.tbl'`) and resolves it through the SAME store-format
  * predicate as reads ([[DirTableCatalog.storeDir]]) — a foreign
  * directory reachable through the catalog refuses exactly like a
  * read would, and is never compacted or vacuumed. All safety fences
  * of the Scala APIs hold unchanged through SQL: vacuum's
  * no-pending-cross-tx check and age guard, compaction's
  * `_compact.lock` mutual exclusion, the loud squash-floor contract.
  *
  * Results come back as one-row relations (`squash_floor_tx`,
  * `removed`, …) — `history` returns the full journal, newest first
  * (metadata-sized: the journal is one row per COMMIT, not per data
  * row; collecting it driver-side is the same cost `DESCRIBE HISTORY`
  * pays on Delta).
  *
  * Reference note: mora runs maintenance in-process with no query
  * surface at all (compaction = the WAL group flush, `wal/wal.go:81-135`);
  * the SQL surface is this engine's addition, sized to what a Delta /
  * Iceberg operator expects.
  */
private[sources] final class MaintenanceProcedure(
    procName: String,
    procDescription: String,
    params: Seq[ProcedureParameter],
    resultSchema: StructType,
    body: InternalRow => Array[InternalRow])
  extends UnboundProcedure with BoundProcedure {

  override def name(): String = procName
  override def description(): String = procDescription
  // binding is static: the parameter list is fixed, coercion is Spark's
  override def bind(inputType: StructType): BoundProcedure = this
  override def parameters(): Array[ProcedureParameter] = params.toArray
  // maintenance mutates store state — never constant-foldable
  override def isDeterministic: Boolean = false

  override def call(input: InternalRow): java.util.Iterator[Scan] = {
    val rows = body(input)
    java.util.Collections
      .singletonList[Scan](MaintenanceProcedure.RowsScan(resultSchema, rows))
      .iterator()
  }
}

private[sources] object MaintenanceProcedure {
  /** Driver-local result relation: Spark's `InvokeProcedures` turns a
    * [[LocalScan]] into a `LocalRelation` — the right shape for
    * metadata-sized maintenance results.
    */
  final case class RowsScan(schema: StructType, resultRows: Array[InternalRow])
    extends LocalScan {
    override def readSchema(): StructType = schema
    override def rows(): Array[InternalRow] = resultRows
  }

  def in(name: String, dt: DataType): ProcedureParameter =
    ProcedureParameter.in(name, dt).build()

  def inDefault(name: String, dt: DataType, defaultSql: String): ProcedureParameter =
    ProcedureParameter.in(name, dt).defaultValue(defaultSql).build()

  def oneRow(vals: Any*): Array[InternalRow] =
    Array(new GenericInternalRow(vals.toArray))

  private def spark: SparkSession = SparkSession.active

  /** The versioned-store maintenance set, bound to a resolver that goes
    * through the owning catalog's store-format guard.
    */
  def vstoreProcedures(resolve: String => String): Seq[MaintenanceProcedure] = {
    def store(input: InternalRow): VersionedCandleStore =
      VersionedCandleStore(spark, resolve(input.getUTF8String(0).toString))
    val table = in("table", StringType)
    Seq(
      new MaintenanceProcedure("compact",
        "Squash history to one version per key (atomic generation swap; " +
          "as-of reads below the returned floor then fail loudly)",
        Seq(table),
        StructType(Seq(StructField("squash_floor_tx", LongType, nullable = false))),
        input => oneRow(store(input).compact())),
      new MaintenanceProcedure("vacuum",
        "Remove torn/unjournaled data files and dead reservations older " +
          "than min_age_ms (default 24h; pass 0 only with no live writers)",
        Seq(table, inDefault("min_age_ms", LongType, "86400000")),
        StructType(Seq(StructField("removed", IntegerType, nullable = false))),
        input => oneRow(store(input).vacuum(input.getLong(1)))),
      new MaintenanceProcedure("checkpoint_journal",
        "Roll per-commit journal tails into one checkpoint file; returns " +
          "the highest tx absorbed",
        Seq(table),
        StructType(Seq(StructField("checkpoint_tx", LongType, nullable = false))),
        input => oneRow(store(input).checkpointJournal())),
      new MaintenanceProcedure("history",
        "The commit journal (one row per commit/compaction), newest first " +
          "- the DESCRIBE HISTORY equivalent",
        Seq(table),
        VersionedCandleStore.txLogSchema,
        input => store(input).txLog().orderBy(col("tx_id").desc)
          .queryExecution.executedPlan.executeCollect()),
      new MaintenanceProcedure("break_stale_lock",
        "Remove a _compact.lock left by a hard-killed maintenance op; " +
          "safe ONLY when no live compact/vacuum/checkpoint runs",
        Seq(table),
        StructType(Seq(StructField("removed", BooleanType, nullable = false))),
        input => oneRow(store(input).breakStaleLock())),
      new MaintenanceProcedure("describe_detail",
        "Metadata snapshot (DESCRIBE DETAIL shape): committed head, " +
          "squash floor, tombstone marker, generation count, current " +
          "generation's data-file census - one recursive listing, no " +
          "data read",
        Seq(table),
        StructType(Seq(
          StructField("format", StringType, nullable = false),
          StructField("location", StringType, nullable = false),
          StructField("head_tx", LongType, nullable = false),
          StructField("squash_floor_tx", LongType, nullable = false),
          StructField("has_tombstones", BooleanType, nullable = false),
          StructField("n_generations", IntegerType, nullable = false),
          StructField("n_data_files", LongType, nullable = false),
          StructField("size_bytes", LongType, nullable = false))),
        input => {
          val dir = resolve(input.getUTF8String(0).toString)
          val d = VersionedCandleStore(spark, dir).detail()
          oneRow(org.apache.spark.unsafe.types.UTF8String.fromString("graft-vstore"),
            org.apache.spark.unsafe.types.UTF8String.fromString(dir),
            d.headTx, d.squashFloorTx, d.hasTombstones, d.nGenerations,
            d.nDataFiles, d.sizeBytes)
        }))
  }

  /** The incremental-view lifecycle, SQL-only end to end (the round-17
    * maintenance argument one layer up: `CALL` could maintain a TABLE
    * but no statement could create, refresh, or read a materialized
    * VIEW):
    *
    * {{{
    * CALL vstore.system.create_view(
    *   view       => 'markets.btc_daily',
    *   table      => 'markets.btc',
    *   group_by   => 'code, to_date(ts) AS day',
    *   aggregates => 'count(1) AS n, sum(volume) AS vol')
    * CALL vstore.system.refresh_view('markets.btc_daily')
    * CALL vstore.system.view_watermark('markets.btc_daily')
    * SELECT * FROM vstore.markets.btc_daily     -- the adopted generation
    * DROP TABLE vstore.markets.btc_daily
    * }}}
    *
    * `create_view` validates eagerly (unknown columns, non-aggregate
    * aggregates, duplicate/missing aliases all refuse at the CALL) and
    * runs the FIRST refresh, so the view is readable immediately when
    * the store has data; on an empty store it returns watermark 0 and
    * the first `refresh_view` after data arrives builds it. Refreshes
    * are the same incremental protocol as the Scala API — one change
    * window, touched groups only, pre-image feed for content-derived
    * groups ([[graft.store.IncrementalView]]).
    */
  def viewProcedures(cat: VStoreCatalog): Seq[MaintenanceProcedure] = {
    def str(input: InternalRow, i: Int): String =
      input.getUTF8String(i).toString
    val watermarkSchema = StructType(Seq(
      StructField("watermark_tx", LongType, nullable = false)))
    Seq(
      new MaintenanceProcedure("create_view",
        "Create an incrementally-maintained aggregate view over a " +
          "versioned store (group_by: 'col, expr AS name, ...'; " +
          "aggregates: 'agg_expr AS name, ...') and run its first " +
          "refresh; read it back as a catalog table, remove with " +
          "DROP TABLE or drop_view. mode: 'error' (default) refuses an " +
          "existing name, 'if_not_exists' leaves an existing VIEW " +
          "untouched, 'or_replace' drops it (generations included - " +
          "they belong to the old definition) and re-creates",
        Seq(in("view", StringType), in("table", StringType),
          in("group_by", StringType), in("aggregates", StringType),
          inDefault("mode", StringType, "'error'")),
        StructType(Seq(
          StructField("location", StringType, nullable = false),
          StructField("watermark_tx", LongType, nullable = false))),
        input => {
          val mode = str(input, 4).toLowerCase(java.util.Locale.ROOT)
          if (!Set("error", "if_not_exists", "or_replace").contains(mode))
            throw new org.apache.spark.sql.AnalysisException(
              errorClass = "_LEGACY_ERROR_TEMP_0035",
              messageParameters = Map("message" ->
                (s"create_view: unknown mode '$mode' — one of " +
                  "'error', 'if_not_exists', 'or_replace'")))
          val (viewDir, existsAsView) =
            cat.viewDirFor(str(input, 0), allowExistingView = mode != "error")
          if (existsAsView && mode == "if_not_exists") {
            // leave the existing view exactly as it is — like SQL's
            // CREATE TABLE IF NOT EXISTS, the existing definition wins
            // even when it differs from the requested one; the
            // watermark is read WITHOUT opening the source store, so
            // the idempotent form stays idempotent on an ORPHANED view
            // (store mid-move) too
            oneRow(org.apache.spark.unsafe.types.UTF8String.fromString(viewDir),
              graft.store.IncrementalView.adoptedWatermark(spark, viewDir))
          } else {
            val storeDir = cat.resolveVStoreArg(str(input, 1))
            val store = VersionedCandleStore(spark, storeDir)
            val groups =
              graft.store.IncrementalView.parseGroupList(spark, str(input, 2))
            val aggs =
              graft.store.IncrementalView.parseAggList(spark, str(input, 3))
            val view =
              if (existsAsView)
                graft.store.IncrementalView.replace(spark, viewDir, store,
                  groups, aggs)
              else
                graft.store.IncrementalView.create(spark, viewDir, store,
                  groups, aggs)
            oneRow(org.apache.spark.unsafe.types.UTF8String.fromString(viewDir),
              view.refresh())
          }
        }),
      new MaintenanceProcedure("drop_view",
        "Remove an incremental view (definition + generations). " +
          "Refuses a store table (use DROP TABLE) and, unless " +
          "if_exists, a missing name - the view twin of DROP " +
          "MATERIALIZED VIEW [IF EXISTS]",
        Seq(in("view", StringType),
          inDefault("if_exists", BooleanType, "false")),
        StructType(Seq(StructField("dropped", BooleanType, nullable = false))),
        input => oneRow(
          cat.dropViewDir(str(input, 0), input.getBoolean(1))),
      ),
      new MaintenanceProcedure("repoint_view",
        "Re-point a view whose source store was MOVED/renamed to the " +
          "store's new location, keeping generations and watermark " +
          "(re-create would lose them); refuses a non-store target, a " +
          "definition that does not analyze against it, or a journal " +
          "that cannot serve the view's watermark",
        Seq(in("view", StringType), in("table", StringType)),
        StructType(Seq(
          StructField("store", StringType, nullable = false),
          StructField("watermark_tx", LongType, nullable = false))),
        input => {
          val viewDir = cat.resolveViewArg(str(input, 0))
          val storeDir = cat.resolveVStoreArg(str(input, 1))
          val w = graft.store.IncrementalView.repoint(spark, viewDir, storeDir)
          oneRow(org.apache.spark.unsafe.types.UTF8String.fromString(storeDir), w)
        }),
      new MaintenanceProcedure("refresh_view",
        "Bring the view up to the store's committed head (incremental: " +
          "touched groups only); returns the new watermark tx",
        Seq(in("view", StringType)),
        watermarkSchema,
        input => oneRow(graft.store.IncrementalView
          .open(spark, cat.resolveViewArg(str(input, 0))).refresh())),
      new MaintenanceProcedure("view_watermark",
        "The tx the view currently reflects (0 = never refreshed); " +
          "no refresh runs",
        Seq(in("view", StringType)),
        watermarkSchema,
        input => oneRow(graft.store.IncrementalView
          .open(spark, cat.resolveViewArg(str(input, 0))).watermark())),
      new MaintenanceProcedure("describe_view",
        "Metadata snapshot of a view (DESCRIBE DETAIL shape): source " +
          "store, adopted (watermark, repair rev), generation census - " +
          "one recursive listing, no data read",
        Seq(in("view", StringType)),
        StructType(Seq(
          StructField("format", StringType, nullable = false),
          StructField("location", StringType, nullable = false),
          StructField("store", StringType, nullable = false),
          StructField("watermark_tx", LongType, nullable = false),
          StructField("repair_rev", LongType, nullable = false),
          StructField("n_generations", IntegerType, nullable = false),
          StructField("n_data_files", LongType, nullable = false),
          StructField("size_bytes", LongType, nullable = false))),
        input => {
          val dir = cat.resolveViewArg(str(input, 0))
          val v = graft.store.IncrementalView.open(spark, dir)
          val (w, r, gens, files, bytes) = v.describeDetail()
          oneRow(org.apache.spark.unsafe.types.UTF8String.fromString("graft-view"),
            org.apache.spark.unsafe.types.UTF8String.fromString(dir),
            org.apache.spark.unsafe.types.UTF8String.fromString(v.storeDir),
            w, r, gens, files, bytes)
        }),
      new MaintenanceProcedure("vacuum_view",
        "Remove generation dirs a crash-interrupted refresh left behind " +
          "(everything but the adopted generation and its retained " +
          "predecessor); refuses while a refresh lock is held",
        Seq(in("view", StringType)),
        StructType(Seq(StructField("removed", IntegerType, nullable = false))),
        input => oneRow(graft.store.IncrementalView
          .open(spark, cat.resolveViewArg(str(input, 0))).vacuumGenerations())),
      new MaintenanceProcedure("break_view_lock",
        "Remove a _refresh.lock left by a hard-killed refresh_view; " +
          "safe ONLY when no live refresh runs (the view twin of " +
          "break_stale_lock - without it a crashed SQL refresh would " +
          "wedge the view for SQL-only operators)",
        Seq(in("view", StringType)),
        StructType(Seq(StructField("removed", BooleanType, nullable = false))),
        input => oneRow(graft.store.IncrementalView
          .open(spark, cat.resolveViewArg(str(input, 0))).breakStaleLock())))
  }

  /** The CROSS-STORE transaction, SQL-only end to end (the qAB/qAG
    * argument applied to the last Scala-only write-path component: a
    * SQL operator could MERGE into either store but never commit one
    * ATOMIC tx spanning both — the reference's multi-command WAL
    * transaction, `database/database.go:27-51`):
    *
    * {{{
    * CALL candles.system.cross_store_write(
    *   name          => 'nightly-2024-07-01',    -- exactly-once key
    *   coord_dir     => '/data/txs',             -- coordinator marker dir
    *   candle_table  => 'candles.markets.btc',   -- CATALOG-qualified
    *   candle_source => 'SELECT * FROM staged_candles',
    *   vstore_table  => 'vstore.markets.btc_v',
    *   vstore_source => 'SELECT * FROM staged_versions')
    * CALL candles.system.cross_store_recover('/data/txs')
    * }}}
    *
    * Both table arguments are CATALOG-qualified (`cat.ns.tbl`): the tx
    * spans two catalogs by construction, so each side resolves through
    * its OWN catalog's format-predicate guard
    * ([[graft.sources.CandleCatalog]] / [[graft.sources.VStoreCatalog]]
    * looked up by name via the session's catalog manager) — a foreign
    * directory, a view, or a table of the wrong store shape refuses
    * exactly like a read would. Sources are SQL text (a SELECT, or a
    * bare table/temp-view name).
    *
    * Semantics are [[graft.store.CrossStoreTx.execute]] unchanged:
    * presumed-abort two-phase commit, one atomic marker rename as the
    * commit point, `name` as the idempotence key (a re-CALL of a
    * committed name returns its recorded tokens without re-executing),
    * and `cross_store_recover` rolls every published-but-unfinalized
    * marker forward — the crash matrix (pre-marker crash visible on
    * NEITHER store, post-marker on BOTH after recover) holds through
    * SQL, spec-gated in CrossStoreSqlSpec.
    *
    * The set rides BOTH catalogs (a tx has no single home); the
    * procedures are identical, so either spelling commits the same tx.
    */
  def crossStoreProcedures(): Seq[MaintenanceProcedure] = {
    def str(input: InternalRow, i: Int): String =
      input.getUTF8String(i).toString
    def utf8(s: String) = org.apache.spark.unsafe.types.UTF8String.fromString(s)
    def failCross(msg: String): Nothing =
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "_LEGACY_ERROR_TEMP_0035",
        messageParameters = Map("message" -> s"cross_store_write: $msg"))
    // a source is either a bare table/temp-view name or full SQL text
    def sourceFrame(sql: String): org.apache.spark.sql.DataFrame = {
      val t = sql.trim
      if (!t.exists(_.isWhitespace)) spark.table(t) else spark.sql(t)
    }
    // resolve 'cat.ns.tbl' through the NAMED catalog's own guard
    def resolveAcross(qualified: String, wantCandle: Boolean): String = {
      val parts = qualified.split('.').toSeq.filter(_.nonEmpty)
      if (parts.length < 2)
        failCross(s"table '$qualified' must be catalog-qualified " +
          "('cat.ns.tbl') — the tx spans two catalogs, so each side " +
          "names its own")
      val plugin =
        try org.apache.spark.sql.graft.ColumnBridge
          .catalogPlugin(spark, parts.head)
        catch {
          case e: Exception =>
            failCross(s"'${parts.head}' is not a registered catalog " +
              s"(resolving '$qualified'): ${e.getMessage}")
        }
      (plugin, wantCandle) match {
        case (c: CandleCatalog, true) =>
          c.resolveCandleArg(parts.tail.mkString("."))
        case (v: VStoreCatalog, false) =>
          v.resolveVStoreArg(parts.tail.mkString("."))
        case _ =>
          failCross(s"'$qualified' must name a table in a " +
            (if (wantCandle) "graft-candles" else "graft-vstore") +
            s" catalog; '${parts.head}' is a ${plugin.getClass.getName}")
      }
    }
    Seq(
      new MaintenanceProcedure("cross_store_write",
        "Commit candle_source into candle_table AND vstore_source into " +
          "vstore_table as ONE atomic cross-store transaction (name = " +
          "exactly-once key; a re-CALL of a committed name returns its " +
          "recorded tokens); both tables catalog-qualified 'cat.ns.tbl'",
        Seq(in("name", StringType), in("coord_dir", StringType),
          in("candle_table", StringType), in("candle_source", StringType),
          in("vstore_table", StringType), in("vstore_source", StringType)),
        StructType(Seq(
          StructField("name", StringType, nullable = false),
          StructField("candle_txid", StringType, nullable = false),
          StructField("vstore_tx", LongType, nullable = false))),
        input => {
          val name = str(input, 0)
          val coordDir = str(input, 1)
          // execute takes the ops BY NAME and materializes them only
          // past its replay short-circuits: a re-CALL of a committed
          // name returns its recorded tokens without resolving tables
          // or source frames (the sources may be dropped temp views),
          // and a horizon-fenced name refuses with the exactly-once
          // message, never a misleading not-found from source lookup
          val toks = graft.store.CrossStoreTx.execute(spark, coordDir, name,
            ops = {
              val cDir = resolveAcross(str(input, 2), wantCandle = true)
              val vDir = resolveAcross(str(input, 4), wantCandle = false)
              Seq(
                graft.store.CrossStoreTx.CandleUpsert(
                  CandleStore(spark, cDir), sourceFrame(str(input, 3))),
                graft.store.CrossStoreTx.VersionedCommit(
                  VersionedCandleStore(spark, vDir),
                  sourceFrame(str(input, 5))))
            })
          oneRow(utf8(name), utf8(toks.head), toks(1).toLong)
        }),
      new MaintenanceProcedure("cross_store_recover",
        "Roll every published-but-unfinalized cross-store tx under " +
          "coord_dir forward to completion (run on restart before " +
          "trusting either store's tail, and ALWAYS before vacuum); " +
          "returns the number of txs completed",
        Seq(in("coord_dir", StringType)),
        StructType(Seq(StructField("completed", IntegerType, nullable = false))),
        input => oneRow(
          graft.store.CrossStoreTx.recover(spark, str(input, 0)))))
  }

  /** The plain-candle-store maintenance set. */
  def candleProcedures(resolve: String => String): Seq[MaintenanceProcedure] = {
    def store(input: InternalRow): CandleStore =
      CandleStore(spark, resolve(input.getUTF8String(0).toString))
    val table = in("table", StringType)
    Seq(
      new MaintenanceProcedure("compact",
        "Rewrite partitions holding more than max_files_per_partition " +
          "files back to one sorted run (crash-atomic install)",
        Seq(table, inDefault("max_files_per_partition", IntegerType, "4")),
        StructType(Seq(StructField("partitions_compacted", IntegerType, nullable = false))),
        input => oneRow(store(input).compact(input.getInt(1)))),
      new MaintenanceProcedure("vacuum",
        "Remove unpublished staging dirs / orphaned intent tmp files " +
          "older than min_age_ms (default 1h; refuses under a pending " +
          "cross-store tx)",
        Seq(table, inDefault("min_age_ms", LongType, "3600000")),
        StructType(Seq(StructField("removed", IntegerType, nullable = false))),
        input => oneRow(store(input).vacuum(input.getLong(1)))),
      new MaintenanceProcedure("recover",
        "Roll forward every published-but-incomplete commit intent " +
          "(also runs implicitly before every scan)",
        Seq(table),
        StructType(Seq(StructField("replayed", IntegerType, nullable = false))),
        input => oneRow(store(input).recover())),
      new MaintenanceProcedure("describe_detail",
        "Metadata snapshot (DESCRIBE DETAIL shape): leaf-partition and " +
          "data-file census + total bytes - one recursive listing, no " +
          "data read",
        Seq(table),
        StructType(Seq(
          StructField("format", StringType, nullable = false),
          StructField("location", StringType, nullable = false),
          StructField("n_partitions", LongType, nullable = false),
          StructField("n_data_files", LongType, nullable = false),
          StructField("size_bytes", LongType, nullable = false))),
        input => {
          val dir = resolve(input.getUTF8String(0).toString)
          val d = CandleStore(spark, dir).detail()
          oneRow(org.apache.spark.unsafe.types.UTF8String.fromString("graft-candles"),
            org.apache.spark.unsafe.types.UTF8String.fromString(dir),
            d.nPartitions, d.nDataFiles, d.sizeBytes)
        }))
  }
}
