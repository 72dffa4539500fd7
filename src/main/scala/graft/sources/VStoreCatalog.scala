package graft.sources

import java.sql.Timestamp

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.connector.catalog.{Identifier, Table}

import graft.store.VersionedCandleStore

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

  override protected def isTableDir(f: FileSystem, p: Path): Boolean =
    VersionedCandleStore.looksLikeStore(f, p)

  override protected def newTable(dir: String): Table =
    new VStoreTable(spark, dir, None, None, None, None)

  override protected def fixedSchemaNames(dir: String): Seq[String] =
    VersionedCandleStore(spark, dir).tableSchema.fieldNames.toSeq

  override protected def stampEmpty(dir: String): Unit = {
    VersionedCandleStore(spark, dir).initEmpty()
    ()
  }

  /** `CALL <cat>.system.{compact,vacuum,checkpoint_journal,history,
    * break_stale_lock}(table, …)` — the SQL face of the store's
    * maintenance APIs (see [[MaintenanceProcedure]]).
    */
  override protected def maintenanceProcedures: Seq[MaintenanceProcedure] =
    MaintenanceProcedure.vstoreProcedures(resolveTableArg)

  /** SQL `VERSION AS OF <txId>` — the catalog form of `asOfTx`. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val tx = version.toLongOption.getOrElse(throw new IllegalArgumentException(
      s"graft-vstore VERSION AS OF takes a numeric tx id, got '$version'"))
    new VStoreTable(spark, storeDir(ident), Some(tx), None, None, None)
  }

  /** SQL `TIMESTAMP AS OF …` — Spark hands MICROseconds since epoch. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val t = new Timestamp(Math.floorDiv(timestampMicros, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(timestampMicros, 1000000L) * 1000L).toInt)
    new VStoreTable(spark, storeDir(ident), None, Some(t), None, None)
  }
}
