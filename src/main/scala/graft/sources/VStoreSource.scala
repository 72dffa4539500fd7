package graft.sources

import java.sql.Timestamp

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SQLContext, SaveMode}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

import graft.store.VersionedCandleStore

/** Spark DataSource over [[VersionedCandleStore]] — the way Spark users
  * consume a versioned table (Delta's pre-catalog `timestampAsOf` shape):
  *
  * {{{
  * spark.read.format("graft-vstore").load(path)                       // latest
  * spark.read.format("graft-vstore").option("asOfTx", 2).load(path)   // VERSION AS OF
  * spark.read.format("graft-vstore")
  *   .option("asOfTime", "2024-07-02 12:00:00").load(path)            // TIMESTAMP AS OF
  * spark.read.format("graft-vstore")
  *   .option("changesSince", 2).load(path)                            // change feed (CDF)
  * }}}
  *
  * then `createOrReplaceTempView` for plain SQL. Until now time travel
  * was a Scala-only API (`scanAsOf`/`scanAsOfTime`); this closes the
  * SQL/DataSource gap the round-5 review called out.
  *
  * Filter pushdown: every pushed filter is applied to the FOLDED
  * as-of frame — Catalyst then pushes predicates that reference only
  * the fold's GROUPING keys (market/code/candle_length/ts/year) below
  * the last-wins aggregate into the Parquet scan (partition pruning +
  * row-group stats), while predicates on content columns (open/close/…)
  * stay above the fold, where they are semantically required to run: a
  * content filter below the fold could delete the WINNING version of a
  * key and resurrect an older one. Spark re-evaluates every filter on
  * the returned rows (this source declares none handled), so pushdown
  * is purely an optimization, never a semantics risk.
  *
  * Column pruning reaches BELOW the fold too: `buildScan`'s required
  * columns (plus filter references) shrink the fold's winner struct to
  * the content columns actually read, so the Parquet ReadSchema under
  * the aggregation carries exactly those — a 2-of-6-column projection
  * does 2 columns of I/O against a 100 TB history (spec-asserted on
  * the executed plan).
  *
  * Architecture (DataSource V2 with the V1Scan execution bridge): a
  * versioned read is a COMPUTED plan — committed-set gate + last-wins
  * aggregation — not a bag of per-partition row readers, and V2's
  * `Batch`/`PartitionReader` contract requires the source itself to
  * produce the partitions; a global fold cannot run inside
  * per-partition readers without changing its semantics. So batch
  * reads resolve through the V2 [[VStoreTable]] — ScanBuilder-driven
  * filter/column/AGGREGATE pushdown, `Table` identity for catalog
  * surfaces — while execution crosses Spark's official
  * `connector.read.V1Scan` bridge into the computed plan (Catalyst
  * plans the fold: codegen, AQE, broadcast decisions included;
  * `needConversion = false` hands InternalRows through). This is the
  * JDBC-V2 shape (`JDBCScan extends V1Scan`) for the same reason: the
  * source's read is a query, not a file listing. Writes and streaming
  * deliberately stay on the V1 provider interfaces (the table declares
  * neither `BATCH_WRITE` nor `MICRO_BATCH_READ`, and Spark falls back
  * to `CreatableRelationProvider` / `StreamSourceProvider` on this
  * class): the journaled append-only writer needs the whole batch as
  * ONE transaction, and the change-feed source pins per-micro-batch
  * journal snapshots — both computed, neither per-partition.
  */
final class VStoreSource extends org.apache.spark.sql.connector.catalog.TableProvider
  with RelationProvider
  with CreatableRelationProvider with StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-vstore"

  // ------------------------------------------------------------------ //
  // DataSource V2: batch reads (planning via VStoreTable, execution    //
  // via the V1Scan bridge)                                             //
  // ------------------------------------------------------------------ //

  /** Options parsed to (path, asOfTx, asOfTime, since, until, preImage)
    * — keys matched case-insensitively (V2 hands the provider the
    * case-SENSITIVE map; the V1 path already matched both spellings).
    * `changesSincePre` is the change feed WITH window-start pre-image
    * rows ([[VersionedCandleStore.changesSincePre]] — the
    * `_change_kind`-discriminated schema).
    */
  private def batchOptions(parameters: Map[String, String])
      : (String, Option[Long], Option[Timestamp], Option[Long], Option[Long], Boolean) = {
    val lower = parameters.map { case (k, v) => k.toLowerCase -> v }
    val path = lower.getOrElse("path",
      throw new IllegalArgumentException(
        "graft-vstore requires a path: spark.read.format(\"graft-vstore\").load(path)"))
    def longOpt(name: String): Option[Long] =
      lower.get(name.toLowerCase).map { s =>
        s.toLongOption.getOrElse(throw new IllegalArgumentException(
          s"$name must be a number, got '$s'"))
      }
    val asOfTx = longOpt("asOfTx")
    val asOfTime = lower.get("asoftime")
      .map { s =>
        try Timestamp.valueOf(s)
        catch {
          case _: IllegalArgumentException => throw new IllegalArgumentException(
            s"asOfTime must be a 'yyyy-mm-dd hh:mm:ss[.f…]' timestamp, got '$s'")
        }
      }
    val sincePre = longOpt("changesSincePre")
    val since = longOpt("changesSince").orElse(sincePre)
    val until = longOpt("changesUntil")
    require(Seq(asOfTx, asOfTime, longOpt("changesSince"),
        sincePre).count(_.nonEmpty) <= 1,
      "asOfTx, asOfTime, changesSince and changesSincePre are mutually exclusive")
    require(until.isEmpty || since.nonEmpty,
      "changesUntil requires changesSince or changesSincePre")
    (path, asOfTx, asOfTime, since, until, sincePre.nonEmpty)
  }

  private def scalaOptions(options: java.util.Map[String, String]): Map[String, String] = {
    val b = Map.newBuilder[String, String]
    options.forEach((k, v) => b += (k -> v))
    b.result()
  }

  override def inferSchema(options: org.apache.spark.sql.util.CaseInsensitiveStringMap): StructType = {
    val params = scalaOptions(options) // CaseInsensitiveStringMap iterates lowercase keys
    val spark = org.apache.spark.sql.SparkSession.active
    val path = params.getOrElse("path", throw new IllegalArgumentException(
      "graft-vstore requires a path"))
    val store = VersionedCandleStore(spark, path)
    if (params.contains("changessincepre")) store.changeFeedPreSchema
    else if (params.contains("changessince"))
      store.tableSchema.add("tx_id", org.apache.spark.sql.types.LongType)
    else store.tableSchema
  }

  override def getTable(schema: StructType,
                        partitioning: Array[org.apache.spark.sql.connector.expressions.Transform],
                        properties: java.util.Map[String, String]): org.apache.spark.sql.connector.catalog.Table = {
    val params = scalaOptions(properties)
    val lower = params.map { case (k, v) => k.toLowerCase -> v }
    val spark = org.apache.spark.sql.SparkSession.active
    // a readStream probe carries stream-only options; build the table
    // leniently there (capabilities route it back to the V1 source)
    if (lower.contains("maxtxsperbatch")) {
      val path = lower.getOrElse("path", throw new IllegalArgumentException(
        "graft-vstore requires a path"))
      new VStoreTable(spark, path, None, None,
        lower.get("changessince").flatMap(_.toLongOption), None)
    } else {
      val (path, asOfTx, asOfTime, since, until, pre) = batchOptions(params)
      new VStoreTable(spark, path, asOfTx, asOfTime, since, until, pre)
    }
  }

  // ------------------------------------------------------------------ //
  // Streaming: tail the change feed (see VStoreStreamSource)           //
  // ------------------------------------------------------------------ //

  /** Parse + validate every streaming option in ONE place — called from
    * `sourceSchema` so misuse fails synchronously at `load()`, never
    * asynchronously on the stream thread mid-start. Returns
    * (path, startTx, maxTxsPerBatch, preImage). `preImage = true` makes
    * each micro-batch a pre-image window
    * ([[VersionedCandleStore.changesWindowPreTail]] of the batch's own
    * (a, b] offsets): the `_change_kind`-discriminated schema, with one
    * window-START pre-image per key the batch touches — exactly what an
    * incremental consumer maintaining content-derived state needs.
    */
  private def streamOptions(parameters: Map[String, String])
      : (String, Long, Option[Long], Boolean) = {
    require(!parameters.contains("changesUntil") && !parameters.contains("changesuntil"),
      "changesUntil is a batch-reader option; a stream tails indefinitely " +
        "(bound it with .option(\"maxTxsPerBatch\", …) or stop the query)")
    require(!parameters.contains("changesSincePre") &&
        !parameters.contains("changessincepre"),
      "changesSincePre is a batch-reader option; a stream opts into " +
        "pre-image rows with .option(\"preImage\", true) and starts at " +
        ".option(\"changesSince\", tx)")
    def longOpt(name: String): Option[Long] =
      parameters.get(name).orElse(parameters.get(name.toLowerCase)).map { s =>
        s.toLongOption.getOrElse(throw new IllegalArgumentException(
          s"$name must be a number, got '$s'"))
      }
    val startTx = longOpt("changesSince").getOrElse(0L)
    require(startTx >= 0, s"changesSince must be >= 0, got $startTx")
    val maxTxs = longOpt("maxTxsPerBatch")
    maxTxs.foreach(m => require(m > 0,
      s"maxTxsPerBatch must be positive, got $m (0 would stall the stream forever)"))
    val preImage = parameters.get("preImage")
      .orElse(parameters.get("preimage")).exists { s =>
        s.toBooleanOption.getOrElse(throw new IllegalArgumentException(
          s"preImage must be true or false, got '$s'"))
      }
    val path = parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-vstore requires a path: spark.readStream.format(\"graft-vstore\").load(path)"))
    (path, startTx, maxTxs, preImage)
  }

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): (String, StructType) = {
    val (path, _, _, preImage) = streamOptions(parameters)
    val store = VersionedCandleStore(sqlContext.sparkSession, path)
    (shortName(),
      if (preImage) store.changeFeedPreSchema else store.changeFeedSchema)
  }

  override def createSource(sqlContext: SQLContext,
                            metadataPath: String,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): org.apache.spark.sql.execution.streaming.Source = {
    val (path, startTx, maxTxs, preImage) = streamOptions(parameters)
    new VStoreStreamSource(sqlContext, path, startTx, maxTxs, preImage)
  }

  override def createRelation(sqlContext: SQLContext,
                              parameters: Map[String, String]): BaseRelation = {
    // ONE option parser for both read paths: the V1 fallback delegates
    // to batchOptions (which already matches keys case-insensitively),
    // so an option added to the V2 path can never silently drift the
    // V1 semantics apart
    val (path, asOfTx, asOfTime, since, until, pre) = batchOptions(parameters)
    new VStoreRelation(sqlContext, path, asOfTx, asOfTime, since, until, pre)
  }

  /** Writer surface: `df.write.format("graft-vstore").mode("append")
    * .save(path)` journals the batch as ONE transaction (optionally
    * ordered within the batch via `.option("ordinalCol", …)`).
    * `Append` is the only mutating mode — the store is append-only by
    * design (history IS the data model); `Overwrite` would need
    * tombstone semantics the reference doesn't have either, so it fails
    * loudly rather than silently truncating history.
    */
  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
                              parameters: Map[String, String],
                              data: DataFrame): BaseRelation = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "graft-vstore requires a path: df.write.format(\"graft-vstore\").save(path)"))
    val store = VersionedCandleStore(sqlContext.sparkSession, path)
    val ordinal = parameters.get("ordinalCol").orElse(parameters.get("ordinalcol"))
    def append(): Unit = { store.commit(data, ordinalCol = ordinal); () }
    mode match {
      case SaveMode.Append => append()
      case SaveMode.ErrorIfExists =>
        if (store.latestTxId > 0)
          throw new IllegalStateException(
            s"graft-vstore at $path already has committed data; use mode(\"append\")")
        append()
      case SaveMode.Ignore => if (store.latestTxId == 0) append()
      case SaveMode.Overwrite =>
        throw new UnsupportedOperationException(
          "graft-vstore is append-only (versioned history); Overwrite would " +
            "silently discard it — commit with mode(\"append\") and compact(), " +
            "or write to a fresh path")
    }
    new VStoreRelation(sqlContext, path, None, None)
  }
}

private[graft] final class VStoreRelation(override val sqlContext: SQLContext,
                                          path: String,
                                          asOfTx: Option[Long],
                                          asOfTime: Option[Timestamp],
                                          changesSince: Option[Long] = None,
                                          changesUntil: Option[Long] = None,
                                          preImage: Boolean = false)
  extends BaseRelation with PrunedFilteredScan {

  private val store = VersionedCandleStore(sqlContext.sparkSession, path)

  override val schema: StructType =
    if (preImage) store.changeFeedPreSchema
    else if (changesSince.nonEmpty) store.changeFeedSchema
    else store.tableSchema

  /** The rows [[buildScan]] hands back are the inner plan's
    * InternalRows verbatim — no Row round-trip at the source boundary.
    */
  override val needConversion: Boolean = false

  /** The frame this relation serves (journal is re-read per query
    * execution — a temp view over the source always sees the store's
    * CURRENT committed state, like any file-based source). `content`
    * prunes the as-of fold to the value columns the query reads (see
    * [[graft.store.VersionedCandleStore]]'s pruned scans). The change
    * feed (`changesSince`) is UNFOLDED rows with `tx_id`; every filter
    * pushed into it is safe below (there is no fold) and projection
    * prunes it naturally.
    */
  private def asOfFrame(content: Seq[String]): DataFrame =
    (changesSince, asOfTx, asOfTime) match {
      case (Some(s), _, _) if preImage =>
        store.changesSincePre(s, changesUntil.getOrElse(Long.MaxValue))
      case (Some(s), _, _) =>
        store.changesSince(s, changesUntil.getOrElse(Long.MaxValue))
      case (_, Some(tx), _) => store.scanAsOf(tx, content)
      case (_, _, Some(t)) => store.scanAsOfTime(t, content)
      case _ => store.scan(content)
    }

  /** The inner plan a (columns, filters) scan runs — split out so specs
    * can assert on its EXECUTED plan (the outer query shows only an
    * opaque row-source scan): the Parquet ReadSchema below the fold
    * must carry exactly the requested content columns.
    */
  private[graft] def scanFrame(requiredColumns: Array[String],
                               filters: Array[Filter]): DataFrame = {
    // fold only the content columns the query touches: requested ones
    // plus any a filter references (the filter must see the column even
    // when the projection drops it)
    val referenced = requiredColumns.toSet ++ filters.flatMap(_.references)
    val content = store.contentCols.filter(referenced)
    val base = filters.flatMap(V1Filters.toColumn).foldLeft(asOfFrame(content))(_.where(_))
    // empty projection (e.g. count(*)) still needs the row CARDINALITY
    if (requiredColumns.isEmpty) base.select()
    else base.select(requiredColumns.map(col).toIndexedSeq: _*)
  }

  override def buildScan(requiredColumns: Array[String],
                         filters: Array[Filter]): RDD[Row] = {
    scanFrame(requiredColumns, filters)
      .queryExecution.toRdd.asInstanceOf[RDD[Row]]
  }

}
