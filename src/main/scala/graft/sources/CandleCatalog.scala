package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SQLContext, SparkSession}
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns, V1Scan}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.model.Candle
import graft.store.CandleStore

/** Catalog plugin over a directory tree of plain [[CandleStore]]s —
  * the non-versioned twin of [[VStoreCatalog]], for the store shape
  * the reference's page engine maps to (one Hive-partitioned Parquet
  * table per store, `market/candle_length/code/year` nesting).
  *
  * {{{
  * spark.sql.catalog.candles      = graft.sources.CandleCatalog
  * spark.sql.catalog.candles.base = /data/candles
  *
  * SHOW TABLES IN candles.markets
  * SELECT * FROM candles.markets.btc WHERE code='BTC' AND year=2024
  * CREATE TABLE candles.markets.eth        -- empty store
  * INSERT INTO candles.markets.eth VALUES (...)  -- one atomic upsert
  * }}}
  *
  * A directory is a table iff [[CandleStore.looksLikeStore]] holds
  * (format marker / `_txlog` / a `market=` partition dir) — disjoint
  * from the versioned layout, so the two catalogs never claim each
  * other's stores. Reads bridge to the store's recovering [[CandleStore.scan]]
  * through [[V1Scan]] with filters/columns applied INSIDE the inner
  * plan, where Catalyst turns the partition-column predicates into
  * real partition pruning on the Parquet scan (the reference's point
  * page lookup, `storage.go:78-96`) — asserted by spec on the executed
  * inner plan. `INSERT INTO` is one crash-atomic [[CandleStore.upsert]]
  * of the whole batch (V1Write: one DataFrame, one commit intent —
  * never per-partition V2 writers, which would tear the install);
  * `INSERT OVERWRITE` is refused, the store upserts by design.
  */
final class CandleCatalog extends DirTableCatalog {

  override protected def formatName: String = "graft-candles"

  override protected def isTableDir(f: FileSystem, p: Path): Boolean =
    CandleStore.looksLikeStore(f, p)

  override protected def newTable(dir: String): Table =
    new CandleTable(spark, dir)

  override protected def fixedSchemaNames(dir: String): Seq[String] =
    CandleTable.tableSchema.fieldNames.toSeq

  override protected def stampEmpty(dir: String): Unit =
    CandleStore.initEmpty(spark, dir)

  /** Resolver handle for the cross-store procedures: the cross-catalog
    * caller must go through THIS catalog's format-predicate guard too.
    */
  private[sources] def resolveCandleArg(table: String): String =
    resolveTableArg(table)

  /** `CALL <cat>.system.{compact,vacuum,recover}(table, …)` — the SQL
    * face of the plain store's maintenance APIs (see
    * [[MaintenanceProcedure]]).
    */
  override protected def maintenanceProcedures: Seq[MaintenanceProcedure] =
    MaintenanceProcedure.candleProcedures(resolveTableArg) ++
      MaintenanceProcedure.crossStoreProcedures()
}

private[graft] object CandleTable {
  /** The fixed table schema: the candle columns plus the storage
    * partition column `year` (derived from `ts` at write time).
    */
  val tableSchema: StructType =
    StructType(Candle.schema.fields.toSeq :+
      StructField("year", IntegerType, nullable = true))
}

/** DSv2 table for one plain candle store directory: BATCH_READ through
  * the [[V1Scan]] bridge (the inner plan is the store's recovering
  * scan — partition pruning, row-group stats and codegen included),
  * V1_BATCH_WRITE as one atomic upsert.
  */
private[graft] final class CandleTable(spark: SparkSession, val path: String)
  extends Table with SupportsRead with SupportsWrite {

  override def name(): String = s"graft-candles `$path`"
  override def schema(): StructType = CandleTable.tableSchema

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.V1_BATCH_WRITE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new CandleScanBuilder(spark, this)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, overwrite: Boolean): Unit =
              CandleInserts.insert(data, overwrite, "graft-candles",
                "stores upsert by (series, ts); INSERT OVERWRITE would " +
                  "truncate — insert the correction instead") { clean =>
                CandleStore(clean.sparkSession, path).upsert(clean)
                ()
              }
          }
      }
    }
}

/** Filter + column pushdown: everything is applied to the inner
  * DataFrame plan (and reported back as post-scan, so Spark re-checks
  * every filter — pushdown is an optimization, never a semantics
  * risk); Catalyst then prunes partitions/row-groups below.
  */
private[graft] final class CandleScanBuilder(spark: SparkSession,
                                             table: CandleTable)
  extends ScanBuilder with SupportsPushDownFilters
  with SupportsPushDownRequiredColumns {

  private var required: StructType = CandleTable.tableSchema
  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit = {
    required = requiredSchema
  }

  override def build(): Scan = new CandleScan(spark, table, required, pushed)
}

private[graft] final class CandleScan(spark: SparkSession,
                                      table: CandleTable,
                                      required: StructType,
                                      filters: Array[Filter])
  extends V1Scan {

  override def readSchema(): StructType = required

  override def description(): String =
    s"${table.name()} required=[${required.fieldNames.mkString(",")}]" +
      (if (filters.nonEmpty) s" pushed=[${filters.mkString(",")}]" else "")

  /** The inner plan — split out so specs can assert partition pruning
    * on its EXECUTED form (the outer query shows only the opaque scan).
    */
  private[graft] def innerFrame(): DataFrame = {
    val store = CandleStore(spark, table.path)
    // recovery BEFORE the data probe: a first-batch commit whose intent
    // published but whose install crashed has no market= dir yet — the
    // probe alone would read the committed batch as an empty table
    // while the path API (scan() -> recover()) returns it
    store.recover()
    val p = new Path(table.path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a stamped-but-empty store has no partition dirs to scan
    val hasData = fs.exists(p) &&
      fs.listStatus(p).exists(_.getPath.getName.startsWith("market="))
    val base =
      if (!hasData)
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
          CandleTable.tableSchema)
      else filters.flatMap(V1Filters.toColumn)
        // recovery already ran above; scan() would probe the txlog twice
        .foldLeft(store.scanNoRecover())(_.where(_))
    if (required.isEmpty) base.select() // count(*) needs cardinality only
    else base.select(required.fieldNames.map(col).toIndexedSeq: _*)
  }

  override def toV1TableScan[T <: BaseRelation with TableScan](
      context: SQLContext): T =
    new CandleV1Bridge(context, this).asInstanceOf[T]
}

private[graft] final class CandleV1Bridge(override val sqlContext: SQLContext,
                                          scan: CandleScan)
  extends BaseRelation with TableScan {
  override def schema: StructType = scan.readSchema()
  override val needConversion: Boolean = false
  override def buildScan(): RDD[Row] =
    scan.innerFrame().queryExecution.toRdd.asInstanceOf[RDD[Row]]
}

/** Shared `INSERT INTO` body for the candle-schema tables (plain and
  * versioned): refuse overwrite, refuse a `year` that disagrees with
  * `year(ts)` (the stores re-derive it — a lying value would be
  * silently recomputed), then hand the year-less batch to the store's
  * own commit. One validation pass; insert batches are tx-sized.
  */
private[graft] object CandleInserts {
  def insert(data: DataFrame, overwrite: Boolean, formatName: String,
             overwriteMsg: String)(commit: DataFrame => Unit): Unit = {
    if (overwrite) throw new UnsupportedOperationException(
      s"$formatName $overwriteMsg")
    import org.apache.spark.sql.functions.year
    val bad = data.where(col("year").isNotNull &&
      col("year") =!= year(col("ts"))).limit(1).collect()
    if (bad.nonEmpty) throw new IllegalArgumentException(
      s"year=${bad.head.getAs[Any]("year")} disagrees with " +
        s"year(ts)=${bad.head.getAs[java.sql.Timestamp]("ts")} — " +
        "year is derived from ts (UTC); pass the matching year or NULL")
    commit(data.drop("year"))
  }
}

/** Best-effort V1 `Filter` → `Column` translation, shared by the V1
  * relations and the V1Scan bridges; untranslated filters simply stay
  * unpushed (Spark re-applies all of them above the scan).
  */
private[graft] object V1Filters {
  def toColumn(f: Filter): Option[Column] = f match {
    case EqualTo(a, v) => Some(col(a) === v)
    case GreaterThan(a, v) => Some(col(a) > v)
    case GreaterThanOrEqual(a, v) => Some(col(a) >= v)
    case LessThan(a, v) => Some(col(a) < v)
    case LessThanOrEqual(a, v) => Some(col(a) <= v)
    case In(a, vs) => Some(col(a).isInCollection(vs.toIndexedSeq))
    case IsNull(a) => Some(col(a).isNull)
    case IsNotNull(a) => Some(col(a).isNotNull)
    case StringStartsWith(a, p) => Some(col(a).startsWith(p))
    case And(l, r) => for (lc <- toColumn(l); rc <- toColumn(r)) yield lc && rc
    case Or(l, r) => for (lc <- toColumn(l); rc <- toColumn(r)) yield lc || rc
    case Not(c) => toColumn(c).map(!_)
    case _ => None
  }
}
