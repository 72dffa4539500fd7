package graft.plans

import org.apache.spark.sql.{AnalysisException, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, Expression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{DeleteAction, InsertAction, LogicalPlan, MergeIntoTable, SubqueryAlias, UpdateAction}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graft.ColumnBridge

import graft.sources.VStoreTable
import graft.store.VersionedCandleStore

/** SQL `MERGE INTO` for graft-vstore tables, lowered into the store's
  * journaled one-tx upsert (`VersionedCandleStore.commit`) instead of a
  * row-level rewrite plan: the store's native write IS a keyed
  * last-wins merge, so the supported MERGE shapes translate to one
  * `commit()` — SQL-only users get keyed updates, not just
  * `INSERT INTO`, with the full crash-atomicity/journal semantics of
  * the Scala path. (Reference precedent: every write is an upsert
  * command executed under one WAL tx, `database/database.go:53-57`,
  * `page/page.go:114-123`.)
  *
  * Supported (validated loudly at analysis):
  *  - `ON` must be equality on exactly the store's fold key
  *    (market, code, candle_length, ts), source side arbitrary
  *    expressions over the source;
  *  - `WHEN MATCHED THEN UPDATE SET …` and/or
  *    `WHEN NOT MATCHED THEN INSERT …`, unconditioned, each assigning
  *    EVERY table column from source-only expressions (`SET *` /
  *    `INSERT *` qualify) — partial assignments can't lower to a
  *    whole-row upsert and are refused;
  *  - no DELETE (the store is append-only versioned — history is the
  *    data model), no `WHEN NOT MATCHED BY SOURCE`, no schema
  *    evolution, no time-travel/change-feed target (read-only lens).
  *
  * Plan shape: both clauses with identical projections (the canonical
  * `SET * / INSERT *` upsert) commit the projected source DIRECTLY —
  * no target scan at all, exactly the Scala `commit()` plan. Otherwise
  * matched/unmatched rows split via ONE broadcast-able semi/anti join
  * against the store's latest key set, then one commit of the union.
  */
case class ResolveVStoreMerge(session: SparkSession) extends Rule[LogicalPlan]
  with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case m: MergeIntoTable if m.resolved && vstoreOf(m.targetTable).isDefined =>
      lower(m, vstoreOf(m.targetTable).get)
  }

  private def vstoreOf(plan: LogicalPlan): Option[VStoreTable] = plan match {
    case SubqueryAlias(_, child) => vstoreOf(child)
    case r: DataSourceV2Relation => r.table match {
      case t: VStoreTable => Some(t)
      case _ => None
    }
    case _ => None
  }

  private def fail(msg: String): Nothing =
    throw new AnalysisException(
      errorClass = "_LEGACY_ERROR_TEMP_0035",
      messageParameters = Map("message" -> s"MERGE INTO graft-vstore: $msg"))

  private def lower(m: MergeIntoTable, table: VStoreTable): LogicalPlan = {
    if (table.asOfTxOpt.nonEmpty || table.asOfTimeOpt.nonEmpty ||
        table.changesSinceOpt.nonEmpty)
      fail("target is a VERSION AS OF / TIMESTAMP AS OF / change-feed " +
        "lens — read-only; merge into the latest table")
    if (m.notMatchedBySourceActions.nonEmpty)
      fail("WHEN NOT MATCHED BY SOURCE is not supported (the store has " +
        "no delete: history is the data model)")
    if (m.withSchemaEvolution) fail("schema evolution is not supported")
    val targetOut = m.targetTable.outputSet
    val sourceOut = m.sourceTable.outputSet

    // ON: conjunction of target-key = source-expression covering exactly
    // the fold key — anything else cannot lower to the keyed upsert
    val expectedKeys = (graft.model.Candle.keyCols :+ "ts").toSet
    val keyPairs = splitConjunctivePredicates(m.mergeCondition).map {
      case EqualTo(l: AttributeReference, r)
          if targetOut.contains(l) && r.references.subsetOf(sourceOut) =>
        l.name.toLowerCase -> r
      case EqualTo(l, r: AttributeReference)
          if targetOut.contains(r) && l.references.subsetOf(sourceOut) =>
        r.name.toLowerCase -> l
      case other =>
        fail(s"ON must be target-key = source-expression equalities; got: ${other.sql}")
    }
    // a key column constrained twice would silently weaken the lowered
    // match condition to whichever equality toMap kept — refuse
    keyPairs.groupBy(_._1).collect { case (k, ps) if ps.length > 1 => k } match {
      case dups if dups.nonEmpty =>
        fail(s"ON constrains ${dups.mkString(", ")} more than once — one " +
          "equality per fold-key column")
      case _ => ()
    }
    val keyMap = keyPairs.toMap
    if (keyMap.keySet != expectedKeys)
      fail(s"ON must cover exactly the fold key ${expectedKeys.mkString(", ")}; " +
        s"got ${keyMap.keySet.mkString(", ")}")

    def fullAssignments(kind: String,
                        assigns: Seq[org.apache.spark.sql.catalyst.plans.logical.Assignment]): Seq[(String, Expression)] = {
      val byName = assigns.map { a =>
        val name = a.key match {
          case ar: AttributeReference if targetOut.contains(ar) => ar.name.toLowerCase
          case other => fail(s"$kind assigns non-column ${other.sql}")
        }
        if (!a.value.references.subsetOf(sourceOut))
          fail(s"$kind assignment to $name references target columns — a " +
            "whole-row upsert needs source-only values")
        name -> a.value
      }
      val tableCols = table.schema().fields.map(_.name.toLowerCase).toSet
      if (byName.map(_._1).toSet != tableCols || byName.length != tableCols.size)
        fail(s"$kind must assign every table column exactly once " +
          s"(SET * / INSERT * qualify); got ${byName.map(_._1).mkString(", ")}")
      // KEY-PRESERVATION: each fold-key assignment must be the ON
      // condition's source expression for that key (modulo the benign
      // AssertNotNull/Cast/Alias wrappers star expansion adds). True
      // MERGE may rewrite a key (replacing the matched row at a NEW
      // key); the keyed-upsert lowering would instead commit at the new
      // key and LEAVE the matched row in place — silently wrong, so any
      // key rewrite is refused (`SET * / INSERT *` with a plain
      // key-equality ON satisfies this trivially).
      def strip(e: Expression): Expression = e match {
        case a: org.apache.spark.sql.catalyst.expressions.Alias => strip(a.child)
        case n: org.apache.spark.sql.catalyst.expressions.objects.AssertNotNull => strip(n.child)
        case c: org.apache.spark.sql.catalyst.expressions.Cast => strip(c.child)
        case other => other
      }
      byName.foreach { case (n, e) =>
        keyMap.get(n).foreach { onExpr =>
          if (strip(e).canonicalized != strip(onExpr).canonicalized)
            fail(s"$kind rewrites fold-key column $n away from its ON " +
              s"expression (${onExpr.sql} vs ${e.sql}) — a keyed upsert " +
              "cannot replace the matched row at a different key")
        }
      }
      byName
    }
    val upd = m.matchedActions match {
      case Seq() => None
      case Seq(UpdateAction(None, assigns, _)) =>
        Some(fullAssignments("UPDATE", assigns))
      case Seq(_: DeleteAction) =>
        fail("WHEN MATCHED DELETE is not supported (append-only store)")
      case _ => fail("one unconditioned WHEN MATCHED THEN UPDATE clause only")
    }
    val ins = m.notMatchedActions match {
      case Seq() => None
      case Seq(InsertAction(None, assigns)) =>
        Some(fullAssignments("INSERT", assigns))
      case _ => fail("one unconditioned WHEN NOT MATCHED THEN INSERT clause only")
    }
    if (upd.isEmpty && ins.isEmpty) fail("no UPDATE or INSERT clause")
    VStoreMergeCommand(table.path, m.sourceTable,
      keyMap.toSeq.sortBy(_._1), upd, ins)
  }
}

/** The lowered merge: project the source per clause, split
  * matched/unmatched on the store's latest keys when the clauses
  * differ, commit ONE journaled tx. Runs on the driver like every
  * store write (the commit itself is the distributed job).
  */
case class VStoreMergeCommand(path: String, source: LogicalPlan,
                              keyMap: Seq[(String, Expression)],
                              updAssigns: Option[Seq[(String, Expression)]],
                              insAssigns: Option[Seq[(String, Expression)]])
  extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(source)

  override def run(session: SparkSession): Seq[Row] = {
    val store = VersionedCandleStore(session, path)
    val src = ColumnBridge.ofRows(session, source)
    def project(assigns: Seq[(String, Expression)]): DataFrame = {
      val cols = store.tableSchema.fields.map { f =>
        val e = assigns.find(_._1 == f.name.toLowerCase).get._2
        ColumnBridge.column(e).cast(f.dataType).as(f.name)
      }
      src.select(cols.toIndexedSeq: _*)
    }
    def canon(a: Seq[(String, Expression)]) =
      a.map { case (n, e) => (n, e.canonicalized) }
    val rows = (updAssigns, insAssigns) match {
      case (Some(u), Some(i)) if canon(u) == canon(i) =>
        // SET * / INSERT *: matched ∪ unmatched = all source rows — no
        // target scan, exactly the Scala commit() plan
        project(u)
      case _ =>
        val keyNames = keyMap.map(_._1)
        val tgtKeys = store.scan().select(keyNames.map(col): _*)
        def half(assigns: Seq[(String, Expression)], joinType: String) = {
          val keyed = keyMap.foldLeft(src) { case (df, (n, e)) =>
            df.withColumn(s"_mk_$n", ColumnBridge.column(e))
          }
          val cond = keyMap.map { case (n, _) =>
            keyed(s"_mk_$n") === tgtKeys(n)
          }.reduce(_ && _)
          val kept = keyed.join(tgtKeys, cond, joinType)
            .drop(keyMap.map(t => s"_mk_${t._1}"): _*)
          val cols = store.tableSchema.fields.map { f =>
            val e = assigns.find(_._1 == f.name.toLowerCase).get._2
            ColumnBridge.column(e).cast(f.dataType).as(f.name)
          }
          kept.select(cols.toIndexedSeq: _*)
        }
        (updAssigns.map(half(_, "left_semi")).toSeq ++
          insAssigns.map(half(_, "left_anti")).toSeq)
          .reduce(_ unionByName _)
    }
    store.commit(rows)
    Seq.empty
  }
}
