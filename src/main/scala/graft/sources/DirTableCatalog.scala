package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{AnalysisException, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, ProcedureCatalog, SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Shared shape of the graft catalogs: a directory tree as the
  * catalog, namespaces as directories, and a store-format predicate
  * deciding which directories are TABLES — so foreign directories are
  * never listed, silently read as empty stores, or deleted by DROP.
  * [[VStoreCatalog]] (versioned stores, with SQL time travel) and
  * [[CandleCatalog]] (plain candle stores) differ only in the
  * predicate, the produced [[Table]], and how an empty store is
  * stamped; everything else — identifier↔path math, table/namespace
  * listing, CREATE/DROP/RENAME guards, the TBLPROPERTIES refusal — is
  * this class.
  *
  * Scale posture: every operation here is metadata-only — directory
  * listings bounded by the namespace fanout, never a data-file walk
  * (a table probe reads at most one directory listing; the store's
  * own open defers all data IO).
  */
private[sources] abstract class DirTableCatalog
  extends TableCatalog with SupportsNamespaces with ProcedureCatalog {

  /** Human-facing format name for error messages (e.g. "graft-vstore"). */
  protected def formatName: String
  /** This catalog's SQL maintenance procedures (`CALL <cat>.system.…`). */
  protected def maintenanceProcedures: Seq[MaintenanceProcedure]
  /** True iff `p` is a store directory of this catalog's format. */
  protected def isTableDir(f: FileSystem, p: Path): Boolean
  /** The planning table for a verified store directory. */
  protected def newTable(dir: String): Table
  /** The fixed schema's field names (for CREATE's column-list check). */
  protected def fixedSchemaNames(dir: String): Seq[String]
  /** Stamp `dir` as a valid EMPTY store ([[isTableDir]] must then hold). */
  protected def stampEmpty(dir: String): Unit

  private var catalogName: String = _
  private var base: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    base = Option(options.get("base")).map(_.stripSuffix("/")).getOrElse(
      throw new IllegalArgumentException(
        s"$formatName catalog '$name' needs a root: set spark.sql.catalog.$name.base=<dir>"))
  }

  override def name(): String = catalogName

  protected def spark: SparkSession = SparkSession.active
  protected def fs(p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
  protected def dirOf(ns: Seq[String], table: String): String =
    (base +: ns :+ table).mkString("/")
  private def nsDir(ns: Seq[String]): Path = new Path((base +: ns).mkString("/"))

  /** Resolve an identifier to its store directory or throw. */
  protected def storeDir(ident: Identifier): String = {
    val dir = dirOf(ident.namespace.toSeq, ident.name)
    val p = new Path(dir)
    val f = fs(p)
    if (!f.exists(p) || !isTableDir(f, p))
      throw new NoSuchTableException(ident)
    dir
  }

  // ------------------------------ tables ---------------------------- //

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val root = nsDir(namespace.toSeq)
    val f = fs(root)
    if (!f.exists(root)) throw new NoSuchNamespaceException(namespace)
    f.listStatus(root).toSeq
      .filter(st => st.isDirectory && isTableDir(f, st.getPath))
      .map(st => Identifier.of(namespace, st.getPath.getName))
      .toArray
  }

  override def loadTable(ident: Identifier): Table = newTable(storeDir(ident))

  override def tableExists(ident: Identifier): Boolean = {
    val p = new Path(dirOf(ident.namespace.toSeq, ident.name))
    val f = fs(p)
    f.exists(p) && isTableDir(f, p)
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
      s"$formatName tables have fixed (market, code, candle_length, year) " +
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
      s"$formatName tables do not persist TBLPROPERTIES; " +
        s"got ${userProps.toSeq.sorted.mkString(", ")}")
    val dir = dirOf(ident.namespace.toSeq, ident.name)
    if (schema.nonEmpty) {
      val want = fixedSchemaNames(dir)
      require(schema.fieldNames.toSeq == want,
        s"$formatName tables have the fixed candle schema $want; " +
          s"got ${schema.fieldNames.toSeq} (omit the column list)")
    }
    stampEmpty(dir)
    newTable(dir)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      s"$formatName tables have a fixed schema; ALTER TABLE is not supported")

  override def dropTable(ident: Identifier): Boolean = {
    val p = new Path(dirOf(ident.namespace.toSeq, ident.name))
    val f = fs(p)
    // only ever deletes a directory that IS a store — a foreign dir
    // reachable through the catalog name is left untouched
    f.exists(p) && isTableDir(f, p) && f.delete(p, true)
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

  // ---------------------------- procedures -------------------------- //

  /** Resolve a procedure's dotted table argument (`'ns1.ns2.tbl'`,
    * catalog-relative) to its store directory through the SAME
    * format-predicate guard as reads — a foreign or missing directory
    * refuses, never gets maintained.
    */
  protected def resolveTableArg(table: String): String = {
    val parts = table.split('.').toSeq.filter(_.nonEmpty)
    if (parts.isEmpty)
      throw new AnalysisException(
        errorClass = "_LEGACY_ERROR_TEMP_0035",
        messageParameters = Map("message" ->
          s"$formatName procedure: empty table name"))
    storeDir(Identifier.of(parts.init.toArray, parts.last))
  }

  /** Maintenance procedures live in the `system` namespace (the Iceberg
    * `CALL cat.system.proc(...)` convention); the bare
    * `CALL cat.proc(...)` form resolves too.
    */
  override def loadProcedure(ident: Identifier): UnboundProcedure = {
    val ns = ident.namespace.toSeq
    val known = maintenanceProcedures.map(_.name()).sorted
    if (ns.nonEmpty && ns != Seq("system"))
      throw new AnalysisException(
        errorClass = "_LEGACY_ERROR_TEMP_0035",
        messageParameters = Map("message" ->
          (s"$formatName procedures live in the 'system' namespace; got " +
            s"${(ns :+ ident.name).mkString(".")} (known: ${known.mkString(", ")})")))
    maintenanceProcedures
      .find(_.name().equalsIgnoreCase(ident.name))
      .getOrElse(throw new AnalysisException(
        errorClass = "_LEGACY_ERROR_TEMP_0035",
        messageParameters = Map("message" ->
          (s"$formatName has no procedure '${ident.name}' " +
            s"(known: ${known.mkString(", ")})"))))
  }

  override def listProcedures(namespace: Array[String]): Array[Identifier] = {
    if (namespace.nonEmpty && namespace.toSeq != Seq("system"))
      return Array.empty
    maintenanceProcedures
      .map(p => Identifier.of(Array("system"), p.name())).toArray
  }

  // ---------------------------- namespaces -------------------------- //

  private def childNamespaces(ns: Seq[String]): Array[Array[String]] = {
    val root = nsDir(ns)
    val f = fs(root)
    if (!f.exists(root)) throw new NoSuchNamespaceException(ns.toArray)
    f.listStatus(root).toSeq
      .filter(st => st.isDirectory && !isTableDir(f, st.getPath))
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
      (f.exists(p) && f.isDirectory(p) && !isTableDir(f, p))
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
      s"$formatName namespaces carry no metadata; ALTER NAMESPACE is not supported")

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
