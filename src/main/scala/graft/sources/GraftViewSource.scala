package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

import graft.store.IncrementalView

/** Structured-Streaming tail of an [[IncrementalView]]'s OWN change
  * feed — the `VStoreStreamSource` pattern one layer up: the store's
  * journal was that source's offset log; the view's adopted
  * GENERATIONS are this one's.
  *
  * {{{
  * spark.readStream.format("graft-view")
  *   .option("sinceTx", 3)      // generation the consumer already holds
  *   .option("sinceRev", 0)     //   (repair rev; default 0)
  *   .load(viewDir)
  * }}}
  *
  * Offsets are full generation identities `(watermark tx, repair rev)`
  * — never the watermark alone: a late-commit repair lands a NEW
  * generation at the SAME watermark (`gen_<tx>_r<k>`), which a
  * watermark-keyed tail would silently miss
  * ([[IncrementalView.generation]]). Each micro-batch is exactly one
  * generation diff ([[IncrementalView.changesBetween]] of its own
  * (start, end] offsets): `_view_change_kind`-discriminated upsert /
  * delete rows, both endpoints pinned, deterministic on replay
  * (generation dirs are immutable). Without `sinceTx` the first batch
  * SELF-SEEDS: the full adopted view as 'upsert' rows — the documented
  * re-seed read, so a fresh consumer needs no side-channel snapshot.
  *
  * Retention contract (the view's one-hop GC, unchanged): a tail that
  * falls two refreshes behind — or a recovery whose checkpointed
  * offset's generation was GC'd — fails LOUDLY with the re-seed
  * message, never serves a wrong diff. Cost per batch is what the
  * VIEW weighs (two aggregate-sized generation scans), never a base
  * read — at 100 TB the tail prices in view groups, not store rows.
  */
final class GraftViewSource extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-view"

  /** Parse + validate every option in ONE place — called from
    * `sourceSchema` so misuse fails synchronously at `load()`.
    * Returns (view dir, the generation the consumer already holds).
    */
  private def streamOptions(parameters: Map[String, String])
      : (String, Option[(Long, Long)]) = {
    val lower = parameters.map { case (k, v) => k.toLowerCase -> v }
    val path = lower.getOrElse("path", throw new IllegalArgumentException(
      "graft-view requires a path: spark.readStream.format(\"graft-view\").load(viewDir)"))
    def longOpt(name: String): Option[Long] =
      lower.get(name.toLowerCase).map { s =>
        s.toLongOption.getOrElse(throw new IllegalArgumentException(
          s"$name must be a number, got '$s'"))
      }
    val tx = longOpt("sinceTx")
    val rev = longOpt("sinceRev")
    require(rev.isEmpty || tx.nonEmpty,
      "sinceRev names a repair rev OF a generation — it requires sinceTx")
    tx.foreach(t => require(t > 0, s"sinceTx must be a positive generation " +
      s"watermark, got $t (omit it to self-seed from the full view)"))
    rev.foreach(r => require(r >= 0, s"sinceRev must be >= 0, got $r"))
    (path, tx.map(t => (t, rev.getOrElse(0L))))
  }

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): (String, StructType) = {
    val (path, _) = streamOptions(parameters)
    (shortName(),
      IncrementalView.open(sqlContext.sparkSession, path).feedSchema)
  }

  override def createSource(sqlContext: SQLContext,
                            metadataPath: String,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): Source = {
    val (path, since) = streamOptions(parameters)
    new GraftViewStreamSource(sqlContext, path, since)
  }
}

/** A generation identity as a streaming offset. Recovery hands back a
  * `SerializedOffset` carrying the json — [[GenOffset.parse]] reads
  * both shapes.
  */
private[sources] final case class GenOffset(tx: Long, rev: Long)
  extends V1Offset {
  override def json: String = s"""{"tx":$tx,"rev":$rev}"""
}

private[sources] object GenOffset {
  private val Json = """\{"tx":(-?\d+),"rev":(-?\d+)\}""".r
  def parse(o: V1Offset): (Long, Long) = o match {
    case GenOffset(tx, rev) => (tx, rev)
    case other => other.json.trim match {
      case Json(tx, rev) => (tx.toLong, rev.toLong)
      case s => throw new IllegalStateException(
        s"graft-view: unreadable generation offset '$s'")
    }
  }
}

private[sources] final class GraftViewStreamSource(sqlContext: SQLContext,
                                                   path: String,
                                                   since: Option[(Long, Long)])
  extends Source {

  private val spark = sqlContext.sparkSession
  private val view = IncrementalView.open(spark, path)

  // pinned at query start: the view's columns are fixed by its
  // persisted definition, so the feed schema cannot move mid-query
  override val schema: StructType = view.feedSchema

  override def getOffset: Option[V1Offset] =
    view.generation().map { case (tx, rev) => GenOffset(tx, rev) }

  private def emptyBatch(): DataFrame =
    spark.createDataFrame(new java.util.ArrayList[Row](), schema)

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val until = GenOffset.parse(end)
    val frame =
      try start.map(GenOffset.parse).orElse(since) match {
        case Some(s) if s == until => emptyBatch()
        case Some((sTx, sRev)) =>
          view.changesBetween(sTx, sRev, until._1, until._2)
        case None =>
          // self-seed: the full pinned generation as upsert rows — on
          // recovery this replays against the RECORDED offset (a GC'd
          // one fails loudly), never a newer state
          view.readGeneration(until._1, until._2)
            .withColumn("_view_change_kind",
              org.apache.spark.sql.functions.lit("upsert"))
      } catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getMessage.contains(IncrementalView.NotRetainedMarker) =>
          // V1 restart semantics: the engine re-invokes getBatch for the
          // already-COMMITTED last batch purely to re-position the
          // source and discards the frame — if a refresh landed while
          // the query was down, that batch's endpoints may be GC'd even
          // though the tail is perfectly resumable from its committed
          // offset. Defer the failure to EXECUTION: a committed replay
          // is never executed; a genuine (uncommitted) replay of an
          // unservable window still fails loudly with the re-seed
          // message, never serves a wrong diff.
          val msg = e.getMessage
          val poison = spark.sparkContext.parallelize(Seq(0), 1)
            .map[Row](_ => throw new IllegalStateException(msg))
          spark.createDataFrame(poison, schema)
      }
    // the engine asserts isStreaming on the returned frame
    org.apache.spark.sql.graft.ColumnBridge.asStreaming(spark, frame)
  }

  override def stop(): Unit = ()
}
