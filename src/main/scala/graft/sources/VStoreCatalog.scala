package graft.sources

import java.sql.Timestamp

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.connector.catalog.{Identifier, Table}

import graft.store.{IncrementalView, VersionedCandleStore}

/** Catalog plugin over a directory tree of [[VersionedCandleStore]]s —
  * the Delta-catalog shape for the versioned store: tables become
  * first-class SQL names instead of `.load(path)` calls, and SQL time
  * travel resolves through the catalog's version/timestamp hooks.
  *
  * {{{
  * spark.sql.catalog.vstore      = graft.sources.VStoreCatalog
  * spark.sql.catalog.vstore.base = /data/stores
  *
  * SHOW TABLES IN vstore.markets
  * SELECT * FROM vstore.markets.btc
  * SELECT * FROM vstore.markets.btc VERSION AS OF 2        -- tx id
  * SELECT * FROM vstore.markets.btc TIMESTAMP AS OF '2024-07-02 12:00:00'
  * CREATE TABLE vstore.markets.eth                          -- empty store
  * INSERT INTO vstore.markets.eth VALUES (...)              -- one journaled tx
  * }}}
  *
  * Layout: `vstore.ns1.ns2.t` ↦ directory `<base>/ns1/ns2/t`.
  * Namespaces are directories; a directory is a TABLE iff it passes
  * [[VersionedCandleStore.looksLikeStore]] (format marker / journal /
  * committed generation) — the shared [[DirTableCatalog]] machinery
  * keeps foreign directories out of listings, reads, and DROP.
  *
  * Reads resolve to the same [[VStoreTable]] the path-based source
  * plans through — ScanBuilder filter/column/aggregate pushdown and
  * the V1Scan-bridged computed fold included — so a catalog read and
  * a `.load(path)` read are the SAME plan. `INSERT INTO` works through
  * the table's [[org.apache.spark.sql.connector.write.V1Write]] bridge:
  * the whole batch arrives as ONE DataFrame and commits as ONE
  * journaled tx (never per-partition V2 writers, which would split the
  * transaction); `INSERT OVERWRITE` and inserts through time-travel
  * lenses are refused (see [[VStoreTable.newWriteBuilder]]).
  */
final class VStoreCatalog extends DirTableCatalog {

  override protected def formatName: String = "graft-vstore"

  /** A TABLE is a versioned store OR a persisted incremental VIEW —
    * views list, read, and DROP like any other table; everything else
    * about them goes through the view procedures.
    */
  override protected def isTableDir(f: FileSystem, p: Path): Boolean =
    VersionedCandleStore.looksLikeStore(f, p) ||
      IncrementalView.isViewDir(f, p)

  private def isViewPath(dir: String): Boolean = {
    val p = new Path(dir)
    IncrementalView.isViewDir(fs(p), p)
  }

  override protected def newTable(dir: String): Table =
    if (isViewPath(dir)) new GraftViewTable(spark, dir)
    else new VStoreTable(spark, dir, None, None, None, None)

  override protected def fixedSchemaNames(dir: String): Seq[String] =
    VersionedCandleStore(spark, dir).tableSchema.fieldNames.toSeq

  override protected def stampEmpty(dir: String): Unit = {
    VersionedCandleStore(spark, dir).initEmpty()
    ()
  }

  private def fail(msg: String): Nothing =
    throw new AnalysisException(
      errorClass = "_LEGACY_ERROR_TEMP_0035",
      messageParameters = Map("message" -> s"graft-vstore catalog: $msg"))

  /** Store-procedure resolver: refuses view directories — `compact`
    * and friends on a view dir would treat it as an empty store and
    * silently "maintain" nothing (or worse, stamp store layout into
    * it).
    */
  private[sources] def resolveVStoreArg(table: String): String = {
    val dir = resolveTableArg(table)
    if (isViewPath(dir))
      fail(s"'$table' is an incremental VIEW, not a store — use " +
        "refresh_view/view_watermark, or DROP TABLE to remove it")
    dir
  }

  /** View-procedure resolver: the twin refusal. */
  private[sources] def resolveViewArg(view: String): String = {
    val dir = resolveTableArg(view)
    if (!isViewPath(dir))
      fail(s"'$view' is a versioned STORE, not an incremental view — " +
        "view procedures take a view created by create_view")
    dir
  }

  /** Directory for a view about to be CREATED: the name must be free —
    * not an existing table/view, and not an existing FOREIGN directory
    * either (stamping a definition into one would hijack it — the same
    * guard the store catalogs apply to DROP).
    */
  /** Directory for a view about to be created under a create MODE:
    * with `allowExistingView = false` (mode 'error') the name must be
    * free — the original guard; with `true` (modes 'if_not_exists' /
    * 'or_replace') an existing incremental VIEW at the name is
    * accepted and reported, but a store table or a non-empty foreign
    * directory still refuses — no create mode may clobber a store. An
    * EMPTY existing directory counts as free in every mode: it carries
    * nothing clobberable (mkdirs would have created it anyway), and it
    * is exactly what a replace crashed after its deletes leaves — the
    * allowance keeps that state re-issuable instead of stuck behind
    * the refusal.
    */
  private[sources] def viewDirFor(view: String,
                                  allowExistingView: Boolean): (String, Boolean) = {
    val parts = view.split('.').toSeq.filter(_.nonEmpty)
    if (parts.isEmpty) fail("create_view: empty view name")
    val dir = dirOf(parts.init, parts.last)
    val p = new Path(dir)
    if (!fs(p).exists(p)) (dir, false)
    else if (allowExistingView && isViewPath(dir)) (dir, true)
    else if (fs(p).listStatus(p).isEmpty) (dir, false)
    else
      fail(s"create_view: '$view' already exists at $dir " +
        "(a table, view, or foreign directory) — DROP it or pick " +
        "another name")
  }

  /** Remove a view by name. Refuses loudly when the target exists but
    * is NOT an incremental view (a store table must go through DROP
    * TABLE — the statement the operator typed says 'view'); a missing
    * target refuses unless `ifExists`. Returns whether anything was
    * removed.
    */
  private[sources] def dropViewDir(view: String, ifExists: Boolean): Boolean = {
    val parts = view.split('.').toSeq.filter(_.nonEmpty)
    if (parts.isEmpty) fail("drop_view: empty view name")
    val dir = dirOf(parts.init, parts.last)
    val p = new Path(dir)
    val f = fs(p)
    if (!f.exists(p)) {
      if (ifExists) false
      else fail(s"drop_view: '$view' does not exist")
    } else if (!isViewPath(dir))
      fail(s"drop_view: '$view' is not an incremental view — " +
        "use DROP TABLE for stores; foreign directories are left alone")
    else f.delete(p, true)
  }

  /** `CALL <cat>.system.{compact,vacuum,checkpoint_journal,history,
    * break_stale_lock,describe_detail}(table, …)` — the SQL face of
    * the store's maintenance APIs — plus the VIEW lifecycle
    * (`create_view`/`refresh_view`/`view_watermark`); see
    * [[MaintenanceProcedure]].
    */
  override protected def maintenanceProcedures: Seq[MaintenanceProcedure] =
    MaintenanceProcedure.vstoreProcedures(resolveVStoreArg) ++
      MaintenanceProcedure.viewProcedures(this) ++
      MaintenanceProcedure.crossStoreProcedures()

  /** SQL `VERSION AS OF <txId>` — the catalog form of `asOfTx`. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val tx = version.toLongOption.getOrElse(throw new IllegalArgumentException(
      s"graft-vstore VERSION AS OF takes a numeric tx id, got '$version'"))
    val dir = storeDir(ident)
    if (isViewPath(dir))
      fail("VERSION AS OF is not supported on an incremental view — " +
        "generations GC to one hop; query the BASE store's history")
    new VStoreTable(spark, dir, Some(tx), None, None, None)
  }

  /** SQL `TIMESTAMP AS OF …` — Spark hands MICROseconds since epoch. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val t = new Timestamp(Math.floorDiv(timestampMicros, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(timestampMicros, 1000000L) * 1000L).toInt)
    val dir = storeDir(ident)
    if (isViewPath(dir))
      fail("TIMESTAMP AS OF is not supported on an incremental view — " +
        "generations GC to one hop; query the BASE store's history")
    new VStoreTable(spark, dir, None, Some(t), None, None)
  }
}
