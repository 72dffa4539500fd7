package graft.sources

import java.sql.Timestamp
import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

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
  * }}}
  *
  * Layout: `vstore.ns1.ns2.t` ↦ directory `<base>/ns1/ns2/t`.
  * Namespaces are directories; a directory is a TABLE iff it passes
  * [[VersionedCandleStore.looksLikeStore]] (format marker / journal /
  * committed generation), so foreign directories are never listed or
  * silently read as empty stores, and `dropTable` refuses to delete
  * anything that is not a store.
  *
  * Reads resolve to the same [[VStoreTable]] the path-based source
  * plans through — ScanBuilder filter/column/aggregate pushdown and
  * the V1Scan-bridged computed fold included — so a catalog read and
  * a `.load(path)` read are the SAME plan. Writes stay on the V1
  * path-based writer (`df.write.format("graft-vstore")`): the
  * journaled one-tx-per-batch append needs the whole batch as one
  * transaction, which the path provider implements; the table
  * deliberately declares no BATCH_WRITE (SQL INSERT fails loudly
  * rather than splitting the batch).
  *
  * Scale posture: every operation here is metadata-only — directory
  * listings bounded by the namespace fanout, never a data-file walk
  * (a table probe reads at most one directory listing; the store's
  * own open defers all data IO).
  */
final class VStoreCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var base: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    base = Option(options.get("base")).map(_.stripSuffix("/")).getOrElse(
      throw new IllegalArgumentException(
        s"vstore catalog '$name' needs a root: set spark.sql.catalog.$name.base=<dir>"))
  }

  override def name(): String = catalogName

  private def spark: SparkSession = SparkSession.active
  private def fs(p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def dirOf(ns: Seq[String], table: String): String =
    (base +: ns :+ table).mkString("/")
  private def nsDir(ns: Seq[String]): Path = new Path((base +: ns).mkString("/"))

  /** Resolve an identifier to its store directory or throw. */
  private def storeDir(ident: Identifier): String = {
    val dir = dirOf(ident.namespace.toSeq, ident.name)
    val p = new Path(dir)
    val f = fs(p)
    if (!f.exists(p) || !VersionedCandleStore.looksLikeStore(f, p))
      throw new NoSuchTableException(ident)
    dir
  }

  // ------------------------------ tables ---------------------------- //

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val root = nsDir(namespace.toSeq)
    val f = fs(root)
    if (!f.exists(root)) throw new NoSuchNamespaceException(namespace)
    f.listStatus(root).toSeq
      .filter(st => st.isDirectory &&
        VersionedCandleStore.looksLikeStore(f, st.getPath))
      .map(st => Identifier.of(namespace, st.getPath.getName))
      .toArray
  }

  override def loadTable(ident: Identifier): Table =
    new VStoreTable(spark, storeDir(ident), None, None, None, None)

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

  override def tableExists(ident: Identifier): Boolean = {
    val p = new Path(dirOf(ident.namespace.toSeq, ident.name))
    val f = fs(p)
    f.exists(p) && VersionedCandleStore.looksLikeStore(f, p)
  }

  /** CREATE TABLE: stamps an empty store. The candle schema is FIXED,
    * so a requested schema must be empty (bare `CREATE TABLE t`) or
    * match the store schema by field name; partitioning/properties are
    * refused rather than ignored.
    */
  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    require(partitions.isEmpty,
      "graft-vstore tables have fixed (market, code, candle_length, year) " +
        "partitioning; PARTITIONED BY is not supported")
    // TBLPROPERTIES would be silently dropped (the store has nowhere to
    // keep them) — refuse user-supplied entries rather than lose them.
    // Spark itself injects reserved/engine keys (owner, provider, ...)
    // on every CREATE; those are not user data and pass through.
    val engineKeys = Set("owner", "provider", "location", "comment",
      "external", "is_managed_location", "option.path", "path")
    val userProps = properties.asScala.keys
      .filterNot(k => engineKeys.contains(k.toLowerCase(java.util.Locale.ROOT)))
    require(userProps.isEmpty,
      s"graft-vstore tables do not persist TBLPROPERTIES; " +
        s"got ${userProps.toSeq.sorted.mkString(", ")}")
    val dir = dirOf(ident.namespace.toSeq, ident.name)
    val store = VersionedCandleStore(spark, dir)
    if (schema.nonEmpty) {
      val want = store.tableSchema.fieldNames.toSeq
      require(schema.fieldNames.toSeq == want,
        s"graft-vstore tables have the fixed candle schema $want; " +
          s"got ${schema.fieldNames.toSeq} (omit the column list)")
    }
    store.initEmpty()
    new VStoreTable(spark, dir, None, None, None, None)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "graft-vstore tables have a fixed schema; ALTER TABLE is not supported")

  override def dropTable(ident: Identifier): Boolean = {
    val p = new Path(dirOf(ident.namespace.toSeq, ident.name))
    val f = fs(p)
    // only ever deletes a directory that IS a store — a foreign dir
    // reachable through the catalog name is left untouched
    f.exists(p) && VersionedCandleStore.looksLikeStore(f, p) &&
      f.delete(p, true)
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val src = new Path(storeDir(oldIdent))
    val dst = new Path(dirOf(newIdent.namespace.toSeq, newIdent.name))
    val f = fs(src)
    if (f.exists(dst)) throw new TableAlreadyExistsException(newIdent)
    val parent = dst.getParent
    if (parent != null) { f.mkdirs(parent); () }
    require(f.rename(src, dst), s"rename $src -> $dst failed")
  }

  // ---------------------------- namespaces -------------------------- //

  private def childNamespaces(ns: Seq[String]): Array[Array[String]] = {
    val root = nsDir(ns)
    val f = fs(root)
    if (!f.exists(root)) throw new NoSuchNamespaceException(ns.toArray)
    f.listStatus(root).toSeq
      .filter(st => st.isDirectory &&
        !VersionedCandleStore.looksLikeStore(f, st.getPath))
      .map(st => (ns :+ st.getPath.getName).toArray)
      .toArray
  }

  override def listNamespaces(): Array[Array[String]] =
    childNamespaces(Seq.empty)

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    childNamespaces(namespace.toSeq)

  override def namespaceExists(namespace: Array[String]): Boolean = {
    val p = nsDir(namespace.toSeq)
    val f = fs(p)
    namespace.isEmpty ||
      (f.exists(p) && f.isDirectory(p) &&
        !VersionedCandleStore.looksLikeStore(f, p))
  }

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] = {
    if (!namespaceExists(namespace))
      throw new NoSuchNamespaceException(namespace)
    util.Collections.emptyMap()
  }

  override def createNamespace(namespace: Array[String],
                               metadata: util.Map[String, String]): Unit = {
    val p = nsDir(namespace.toSeq)
    fs(p).mkdirs(p)
    ()
  }

  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft-vstore namespaces carry no metadata; ALTER NAMESPACE is not supported")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    if (!namespaceExists(namespace) || namespace.isEmpty) return false
    val p = nsDir(namespace.toSeq)
    val f = fs(p)
    if (!cascade && f.listStatus(p).nonEmpty)
      throw new IllegalStateException(
        s"namespace ${namespace.mkString(".")} is not empty (use CASCADE)")
    f.delete(p, true)
  }
}
