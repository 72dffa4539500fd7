package graft.sources

import java.sql.Timestamp

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext, SparkSession}
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability}
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownRequiredColumns, V1Scan}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.functions.{col, count_distinct, max, min, struct}
import org.apache.spark.sql.sources.{BaseRelation, Filter, InsertableRelation, TableScan}
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.store.VersionedCandleStore

/** DataSource V2 `Table` for `graft-vstore` — the planning surface of
  * the versioned reader ([[VStoreSource]] holds the architectural
  * rationale: V2 ScanBuilder pushdown at PLANNING time, the computed
  * last-wins plan at EXECUTION time via Spark's official [[V1Scan]]
  * bridge, the JDBC-V2 precedent).
  *
  * Batch reads resolve through this table (`BATCH_READ`); streaming
  * and writes intentionally do NOT declare capabilities, so Spark
  * falls back to the V1 `StreamSourceProvider` /
  * `CreatableRelationProvider` on the same class — the change-feed
  * source and the append-only journaled writer keep their semantics
  * and specs verbatim.
  */
private[graft] final class VStoreTable(spark: SparkSession,
                                       val path: String,
                                       asOfTx: Option[Long],
                                       asOfTime: Option[Timestamp],
                                       changesSince: Option[Long],
                                       changesUntil: Option[Long],
                                       preImage: Boolean = false)
  extends Table with SupportsRead with SupportsWrite {

  private def store = VersionedCandleStore(spark, path)

  private[graft] def asOfTxOpt: Option[Long] = asOfTx
  private[graft] def asOfTimeOpt: Option[Timestamp] = asOfTime
  private[graft] def changesSinceOpt: Option[Long] = changesSince
  private[graft] def changesUntilOpt: Option[Long] = changesUntil
  private[graft] def isChangeFeed: Boolean = changesSince.nonEmpty
  private[graft] def isPreImageFeed: Boolean = preImage
  private[graft] def isTimeTravelByTime: Boolean = asOfTime.nonEmpty

  /** Fold-bypassing raw key frame for pushed aggregates (latest or
    * VERSION AS OF — the builder rejects the other addressing modes).
    */
  private[graft] def keyFrame(s: SparkSession): DataFrame =
    VersionedCandleStore(s, path).keyRowsAsOf(asOfTx.getOrElse(Long.MaxValue))

  override def name(): String = s"graft-vstore `$path`" +
    asOfTx.map(t => s" VERSION AS OF $t").getOrElse("") +
    asOfTime.map(t => s" TIMESTAMP AS OF $t").getOrElse("") +
    changesSince.map(s => s" CHANGES SINCE $s" +
      (if (preImage) " (PRE-IMAGE)" else "")).getOrElse("")

  override def schema(): StructType =
    if (preImage) store.changeFeedPreSchema
    else if (changesSince.nonEmpty) store.changeFeedSchema
    else store.tableSchema

  /** Writes are declared ONLY on the latest-snapshot addressing: a
    * `VERSION AS OF` / `TIMESTAMP AS OF` / change-feed table reports
    * `BATCH_READ` alone, so `INSERT INTO` it fails at ANALYSIS with
    * Spark's clear capability error instead of mutating history
    * through a read-only lens.
    */
  override def capabilities(): java.util.Set[TableCapability] =
    if (asOfTx.isEmpty && asOfTime.isEmpty && changesSince.isEmpty)
      java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.V1_BATCH_WRITE)
    else java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new VStoreScanBuilder(spark, this)

  /** SQL `INSERT INTO` — the journaled one-tx append, through Spark's
    * official [[V1Write]] bridge (the write-side twin of the read
    * path's [[V1Scan]]: commit is one driver-coordinated transaction
    * over an ordinary Catalyst plan, not a bag of per-partition V2
    * writers — a partial partition-level commit would be exactly the
    * torn write the journal exists to prevent). The builder implements
    * no truncate/overwrite mixin, so `INSERT OVERWRITE` is refused by
    * Spark at planning (the store is append-only: history IS the data
    * model, matching the V1 path's loud Overwrite rejection).
    */
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, overwrite: Boolean): Unit =
              CandleInserts.insert(data, overwrite, "graft-vstore",
                "is append-only (versioned history); INSERT OVERWRITE " +
                  "would silently discard it") { clean =>
                VersionedCandleStore(clean.sparkSession, path).commit(clean)
                ()
              }
          }
      }
    }
}

/** ScanBuilder with the three pushdowns the fold admits:
  *
  *  - **Filters** ([[SupportsPushDownFilters]]): every translatable
  *    filter is applied to the computed as-of frame, where Catalyst
  *    pushes key-column predicates below the last-wins aggregate into
  *    the Parquet scan while content predicates stay above the fold
  *    (semantics: a content filter below the fold could delete the
  *    winning version and resurrect an older one). ALL filters are
  *    reported back as post-scan — Spark re-evaluates them, so
  *    pushdown is an optimization, never a semantics risk (the V1
  *    `unhandledFilters` contract carried over).
  *  - **Columns** ([[SupportsPushDownRequiredColumns]]): the required
  *    schema (which Spark has already widened with post-scan filter
  *    references) prunes the fold's winner struct, so the Parquet
  *    ReadSchema below the aggregation carries exactly the content
  *    columns actually read.
  *  - **Aggregates** ([[SupportsPushDownAggregates]]): `MIN`/`MAX`
  *    over fold KEY columns and `COUNT(*)` — global or GROUPED BY fold
  *    keys — bypass the fold entirely: the fold replaces content,
  *    never keys, and grouping by key columns only partitions the key
  *    tuples, so per-group key min/max and distinct-key counts commute
  *    with last-wins exactly as the global ones do
  *    ([[VersionedCandleStore.keyRowsAsOf]]). `SELECT code, max(ts),
  *    count(*) … GROUP BY code` — the catalog listing — is served as a
  *    scan-side aggregation with no winner-struct shuffle. Content
  *    aggregates, non-fold-key groupings, and the change feed never
  *    push (the fold/feed must run).
  */
private[graft] final class VStoreScanBuilder(spark: SparkSession,
                                             table: VStoreTable)
  extends ScanBuilder with SupportsPushDownFilters
  with SupportsPushDownRequiredColumns with SupportsPushDownAggregates {

  private val fullSchema = table.schema()
  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty
  private var pushedAgg: Option[Seq[org.apache.spark.sql.Column]] = None
  private var pushedGroups: Seq[String] = Seq.empty
  private var aggSchema: Option[StructType] = None

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters
    filters // all post-scan: Spark re-applies every filter above us
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit = {
    required = requiredSchema
  }

  /** Key columns whose global min/max commute with the last-wins fold. */
  private val foldKeys =
    Set("market", "code", "candle_length", "ts", "year")

  private def singleName(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
    e match {
      case f: NamedReference if f.fieldNames.length == 1 =>
        Some(f.fieldNames.head)
      case _ => None
    }

  override def supportCompletePushDown(aggregation: Aggregation): Boolean =
    translateAggregation(aggregation).nonEmpty

  override def pushAggregation(aggregation: Aggregation): Boolean =
    translateAggregation(aggregation) match {
      case Some((groups, cols, schema)) =>
        pushedGroups = groups; pushedAgg = Some(cols); aggSchema = Some(schema)
        true
      case None => false
    }

  /** (group-by key columns, aggregate columns over the raw key frame,
    * the scan's output schema — group columns first, per the complete-
    * pushdown contract), or None when the aggregation cannot bypass
    * the fold.
    */
  private def translateAggregation(aggregation: Aggregation)
      : Option[(Seq[String], Seq[org.apache.spark.sql.Column], StructType)] = {
    // only the latest/VERSION-AS-OF folded snapshot; only when no
    // filters were pushed (Spark already guarantees no post-scan
    // filters before calling us, but the guard is ours too). GROUP BY
    // is admitted when every group key is a FOLD key: grouping
    // partitions the key tuples, so per-group key min/max and
    // distinct-key counts commute with last-wins exactly as the global
    // ones do — the "catalog listing" shape
    // (`SELECT code, max(ts) … GROUP BY code`) never builds a winner.
    if (table.isChangeFeed || table.isTimeTravelByTime) return None
    if (pushed.nonEmpty) return None
    val groupNames = aggregation.groupByExpressions.toSeq.map(singleName)
    if (groupNames.exists(n => n.isEmpty || !foldKeys(n.get))) return None
    val groups = groupNames.flatten
    // an aggregate-free grouping (Spark prunes the agg list when only
    // group existence is consumed, e.g. a count() on top) is DISTINCT
    // over the group keys — valid with groups, meaningless without
    if (aggregation.aggregateExpressions.isEmpty && groups.isEmpty) return None
    val keyTuple = struct(
      (graft.model.Candle.keyCols ++ Seq("ts", "year")).map(col): _*)
    val translated = aggregation.aggregateExpressions.toSeq.map {
      case m: Min => singleName(m.column).filter(foldKeys).map { n =>
        (min(col(n)).as(s"min_$n"),
          StructField(s"min_$n", fullSchema(n).dataType, nullable = true))
      }
      case m: Max => singleName(m.column).filter(foldKeys).map { n =>
        (max(col(n)).as(s"max_$n"),
          StructField(s"max_$n", fullSchema(n).dataType, nullable = true))
      }
      case _: CountStar =>
        // folded COUNT(*) = number of DISTINCT key tuples in raw rows
        Some((count_distinct(keyTuple).as("cnt"),
          StructField("cnt", LongType, nullable = false)))
      case _ => None
    }
    if (translated.exists(_.isEmpty)) None
    else Some((groups, translated.flatten.map(_._1),
      StructType(groups.map(n => fullSchema(fullSchema.fieldIndex(n))) ++
        translated.flatten.map(_._2))))
  }

  override def build(): Scan =
    new VStoreScan(spark, table, required, pushed, pushedAgg, pushedGroups,
      aggSchema)
}

/** The planned scan: [[V1Scan]] hands execution to the computed
  * last-wins plan (an ordinary Catalyst plan — codegen, AQE and
  * broadcast decisions included), which a V2 `PartitionReader` cannot
  * host (a global fold is not a bag of per-partition readers; see
  * [[VStoreSource]]).
  */
private[graft] final class VStoreScan(spark: SparkSession,
                                      table: VStoreTable,
                                      required: StructType,
                                      filters: Array[Filter],
                                      agg: Option[Seq[org.apache.spark.sql.Column]],
                                      aggGroups: Seq[String],
                                      aggSchema: Option[StructType])
  extends V1Scan {

  override def readSchema(): StructType = aggSchema.getOrElse(required)

  override def description(): String =
    s"${table.name()} required=[${readSchema().fieldNames.mkString(",")}]" +
      (if (filters.nonEmpty) s" pushed=[${filters.mkString(",")}]" else "") +
      (if (agg.nonEmpty) " agg=fold-bypass" else "")

  /** The inner computed frame — split out so specs can assert on its
    * EXECUTED plan (the outer query shows only the opaque scan).
    */
  private[graft] def innerFrame(): DataFrame = agg match {
    case Some(aggCols) if aggCols.isEmpty =>
      // aggregate-free grouping: distinct live group-key tuples
      table.keyFrame(spark).select(aggGroups.map(col): _*).distinct()
    case Some(aggCols) if aggGroups.nonEmpty =>
      table.keyFrame(spark)
        .groupBy(aggGroups.map(col): _*)
        .agg(aggCols.head, aggCols.tail: _*)
    case Some(aggCols) =>
      table.keyFrame(spark)
        .agg(aggCols.head, aggCols.tail: _*)
    case None =>
      new VStoreRelation(spark.sqlContext, table.path,
        table.asOfTxOpt, table.asOfTimeOpt, table.changesSinceOpt,
        table.changesUntilOpt, table.isPreImageFeed)
        .scanFrame(required.fieldNames, filters)
  }

  override def toV1TableScan[T <: BaseRelation with TableScan](
      context: SQLContext): T =
    new VStoreV1Bridge(context, this).asInstanceOf[T]
}

/** The V1 execution half of [[VStoreScan]]: InternalRows of the inner
  * plan, passed through without conversion.
  */
private[graft] final class VStoreV1Bridge(override val sqlContext: SQLContext,
                                          scan: VStoreScan)
  extends BaseRelation with TableScan {
  override def schema: StructType = scan.readSchema()
  override val needConversion: Boolean = false
  override def buildScan(): RDD[Row] =
    scan.innerFrame().queryExecution.toRdd.asInstanceOf[RDD[Row]]
}
