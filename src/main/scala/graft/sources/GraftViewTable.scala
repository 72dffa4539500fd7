package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext, SparkSession}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns, V1Scan}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.{BaseRelation, Filter, TableScan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.store.IncrementalView

/** DataSource V2 `Table` over a persisted [[graft.store.IncrementalView]]
  * — the READ face of the SQL view surface: `SELECT * FROM
  * <cat>.ns.myview` resolves here through [[VStoreCatalog]], and the
  * scan is the adopted generation's plain parquet read (the view state
  * is aggregate-sized — groups, not base rows — so this is the cheap
  * side by construction; the INCREMENTAL machinery all lives on the
  * refresh path).
  *
  * Read-only by capability: a materialized aggregate has no meaningful
  * direct write (`INSERT INTO` a view fails at analysis with Spark's
  * capability error); it changes ONLY through `refresh_view` /
  * [[graft.store.IncrementalView.refresh]]. Filters and column pruning
  * ride the V1Scan bridge into the parquet scan — pushed predicates on
  * group columns reach the files' row-group stats (same plan a direct
  * `read()` gets; spec-gated), and Spark re-evaluates every filter
  * above (none declared handled), so pushdown stays an optimization.
  *
  * Reading a never-refreshed view fails LOUDLY (`refresh_view` first):
  * serving an empty frame would be indistinguishable from "the data
  * aggregates to nothing" — the one silent wrong answer this surface
  * could produce.
  */
private[graft] final class GraftViewTable(spark: SparkSession, val dir: String)
  extends Table with SupportsRead {

  // opened ONCE per table instance (instances are per-query-fresh from
  // loadTable): open() is a definition-file read + expression re-parse,
  // and schema inference a parquet footer read — repeating them for
  // every schema()/scan call would be 3-5 serial metadata round-trips
  // of identical work per query on an object store. Freshness is
  // unaffected: read() resolves the ADOPTED generation per execution,
  // and the schema is definition-determined (stable across refreshes).
  private lazy val view = IncrementalView.open(spark, dir)
  private lazy val cachedSchema: StructType = view.tableSchema

  override def name(): String = s"graft-view `$dir`"

  // adopted generation's parquet schema once refreshed; the analyzed
  // definition before that (also the definition validity check)
  override def schema(): StructType = cachedSchema

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftViewScanBuilder(spark, this)

  private[sources] def readFrame(requiredColumns: Array[String],
                                 filters: Array[Filter]): DataFrame = {
    val base = filters.flatMap(V1Filters.toColumn)
      .foldLeft(view.read())(_.where(_))
    if (requiredColumns.isEmpty) base.select()
    else base.select(requiredColumns.map(col).toIndexedSeq: _*)
  }
}

/** Filter + column pushdown into the view's parquet scan (there is no
  * fold here — every predicate is safe below, so all of them ride into
  * the inner frame; all are reported back for Spark's re-evaluation).
  */
private[sources] final class GraftViewScanBuilder(spark: SparkSession,
                                                  table: GraftViewTable)
  extends ScanBuilder with SupportsPushDownFilters
  with SupportsPushDownRequiredColumns {

  private var required: StructType = table.schema()
  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters
    filters // all post-scan: Spark re-applies every filter above us
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit = {
    required = requiredSchema
  }

  override def build(): Scan = new GraftViewScan(spark, table, required, pushed)
}

private[sources] final class GraftViewScan(spark: SparkSession,
                                           table: GraftViewTable,
                                           required: StructType,
                                           filters: Array[Filter])
  extends V1Scan {

  override def readSchema(): StructType = required

  override def description(): String =
    s"${table.name()} required=[${required.fieldNames.mkString(",")}]" +
      (if (filters.nonEmpty) s" pushed=[${filters.mkString(",")}]" else "")

  /** The inner frame — split out so specs can assert on its EXECUTED
    * plan (pruned parquet scan of the adopted generation).
    */
  private[graft] def innerFrame(): DataFrame =
    table.readFrame(required.fieldNames, filters)

  override def toV1TableScan[T <: BaseRelation with TableScan](
      context: SQLContext): T =
    new GraftViewV1Bridge(context, this).asInstanceOf[T]
}

private[sources] final class GraftViewV1Bridge(override val sqlContext: SQLContext,
                                               scan: GraftViewScan)
  extends BaseRelation with TableScan {
  override def schema: StructType = scan.readSchema()
  override val needConversion: Boolean = false
  override def buildScan(): RDD[Row] =
    scan.innerFrame().queryExecution.toRdd.asInstanceOf[RDD[Row]]
}
