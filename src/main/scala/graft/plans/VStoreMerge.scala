package graft.plans

import org.apache.spark.sql.{AnalysisException, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, Expression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{DeleteAction, InsertAction, LogicalPlan, MergeIntoTable, SubqueryAlias, UpdateAction}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.StructType

import graft.sources.VStoreTable
import graft.store.{CandleStore, VersionedCandleStore}

/** SQL `MERGE INTO` for graft catalog tables — BOTH store shapes —
  * lowered into the store's native keyed last-wins write instead of a
  * row-level rewrite plan:
  *
  *  - graft-vstore tables → ONE journaled tx
  *    ([[VersionedCandleStore.commit]]) — SQL-only users get keyed
  *    updates with the full crash-atomicity/journal semantics of the
  *    Scala path;
  *  - plain graft-candles tables → ONE crash-atomic upsert
  *    ([[CandleStore.upsert]], the reference's page merge
  *    `page/page.go:114-123` under one WAL tx `database/database.go:53-57`)
  *    — closing the SQL surface gap where the candle catalog had only
  *    `INSERT INTO`.
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
  *  - `WHEN MATCHED [AND <cond>] THEN DELETE` on VSTORE targets only:
  *    matched keys (satisfying the condition, when given) lower to
  *    journaled TOMBSTONE rows ([[VersionedCandleStore.delete]]'s
  *    representation) in the same single tx as any NOT MATCHED
  *    inserts — as-of reads before the delete still see the rows, the
  *    change feed carries `_deleted`. The condition must reference
  *    SOURCE columns only (the keyed lowering never scans target
  *    content — target references are refused loudly, not silently
  *    mis-evaluated); matched keys failing it are untouched (ANSI's
  *    matched-but-unsatisfied semantics under one matched clause).
  *    Candle targets keep refusing DELETE (the reference's surface is
  *    insert/upsert-only, `database/command/`);
  *  - `WHEN NOT MATCHED BY SOURCE [AND <cond>] THEN DELETE` on VSTORE
  *    targets only: target keys ABSENT from the source lower to
  *    journaled tombstones in the same tx — the classic
  *    sync-target-to-source MERGE. The lowering anti-joins the store's
  *    latest KEY SET (the split's own scan) against the source keys, so
  *    no target content is read; a condition may therefore reference
  *    the FOLD-KEY columns only (market, code, candle_length, ts —
  *    e.g. a `t.ts < retention_cutoff` retention gate). Content-column
  *    conditions are refused loudly. Candle targets keep refusing
  *    (no delete in the reference's surface);
  *  - `WHEN NOT MATCHED BY SOURCE [AND <cond>] THEN UPDATE SET …` on
  *    BOTH store shapes: the one by-source arm that must READ target
  *    content — the lowering anti-joins the latest FOLD (content rows;
  *    on the plain store the scan itself, one live row per key) on the
  *    source keys and re-projects the surviving rows with the
  *    assignments, committed as updates in the same single tx / the
  *    same crash-atomic upsert (no tombstones involved, so the
  *    reference's insert/upsert-only surface is respected). Because
  *    the fold is paid anyway, the condition AND the values may
  *    reference any target column, and assignments may be PARTIAL
  *    (`SET volume = 0` keeps the other columns) — fold-key/year
  *    assignments refuse (no source expression exists to move a key
  *    to);
  *  - no schema evolution, no time-travel/change-feed target
  *    (read-only lens).
  *
  * CARDINALITY DIVERGENCE (documented, optionally strict): ANSI MERGE
  * raises an error when several source rows hit one target row; the
  * keyed-upsert lowering instead resolves them by the store's
  * deterministic within-batch last-wins dedup (vstore `commit`,
  * candle `upsert` — both mirror `page/page.go:114-123`). Set
  * `graft.sql.merge.strictSourceCardinality=true` to refuse a source
  * with duplicate fold keys loudly (one extra aggregation job).
  *
  * Plan shape: both clauses with identical projections (the canonical
  * `SET * / INSERT *` upsert) commit the projected source DIRECTLY —
  * no target scan at all, exactly the Scala path's plan. Otherwise
  * matched/unmatched rows split via ONE broadcast-able semi/anti join
  * against the store's latest key set, then one commit of the union.
  */
case class ResolveGraftMerge(session: SparkSession) extends Rule[LogicalPlan]
  with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case m: MergeIntoTable if m.resolved && vstoreOf(m.targetTable).isDefined =>
      val t = vstoreOf(m.targetTable).get
      if (t.asOfTxOpt.nonEmpty || t.asOfTimeOpt.nonEmpty ||
          t.changesSinceOpt.nonEmpty)
        fail("target is a VERSION AS OF / TIMESTAMP AS OF / change-feed " +
          "lens — read-only; merge into the latest table")
      val (keyMap, upd, ins, del, bySrcDel, bySrcUpd) =
        MergeLowering.validate(m, t.schema(), allowDelete = true)
      VStoreMergeCommand(t.path, m.sourceTable, keyMap, upd, ins, del,
        bySrcDel, bySrcUpd)
    case m: MergeIntoTable if m.resolved && candleOf(m.targetTable).isDefined =>
      val t = candleOf(m.targetTable).get
      val (keyMap, upd, ins, _, _, bySrcUpd) =
        MergeLowering.validate(m, t.schema(), allowDelete = false)
      CandleMergeCommand(t.path, m.sourceTable, keyMap, upd, ins, bySrcUpd)
  }

  private def vstoreOf(plan: LogicalPlan): Option[VStoreTable] = plan match {
    case SubqueryAlias(_, child) => vstoreOf(child)
    case r: DataSourceV2Relation => r.table match {
      case t: VStoreTable => Some(t)
      case _ => None
    }
    case _ => None
  }

  private def candleOf(plan: LogicalPlan): Option[graft.sources.CandleTable] =
    plan match {
      case SubqueryAlias(_, child) => candleOf(child)
      case r: DataSourceV2Relation => r.table match {
        case t: graft.sources.CandleTable => Some(t)
        case _ => None
      }
      case _ => None
    }

  private[plans] def fail(msg: String): Nothing =
    throw new AnalysisException(
      errorClass = "_LEGACY_ERROR_TEMP_0035",
      messageParameters = Map("message" -> s"MERGE INTO graft table: $msg"))
}

/** The shared shape validation of both MERGE lowerings: fold-key ON,
  * whole-row source-only assignments, key preservation.
  */
private[plans] object MergeLowering extends PredicateHelper {

  private def fail(msg: String): Nothing =
    throw new AnalysisException(
      errorClass = "_LEGACY_ERROR_TEMP_0035",
      messageParameters = Map("message" -> s"MERGE INTO graft table: $msg"))

  def validate(m: MergeIntoTable, tableSchema: StructType,
               allowDelete: Boolean): (Seq[(String, Expression)],
      Option[Seq[(String, Expression)]], Option[Seq[(String, Expression)]],
      Option[Option[Expression]], Option[Option[Expression]],
      Option[(Seq[(String, Expression)], Option[Expression])]) = {
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
      val tableCols = tableSchema.fields.map(_.name.toLowerCase).toSet
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
    val (upd, del) = m.matchedActions match {
      case Seq() => (None, None)
      case Seq(UpdateAction(None, assigns, _)) =>
        (Some(fullAssignments("UPDATE", assigns)), None)
      case Seq(DeleteAction(None)) if allowDelete => (None, Some(None))
      case Seq(DeleteAction(None)) =>
        fail("WHEN MATCHED DELETE is not supported on graft-candles " +
          "(the reference's surface is insert/upsert-only, " +
          "database/command/ has no delete) — only the VERSIONED store " +
          "supports journaled tombstone deletes")
      case Seq(DeleteAction(Some(cond))) if allowDelete =>
        // conditioned delete: the keyed lowering never scans target
        // CONTENT (only the key set), so the condition must be decidable
        // per SOURCE row — target-column references are refused, not
        // silently mis-evaluated
        if (!cond.references.subsetOf(sourceOut))
          fail("WHEN MATCHED AND … THEN DELETE condition may reference " +
            "source columns only (the keyed tombstone lowering never " +
            "scans target content) — got target references in: " +
            cond.sql + "; move them into the source query")
        (None, Some(Some(cond)))
      case Seq(DeleteAction(Some(_))) =>
        fail("WHEN MATCHED … THEN DELETE is not supported on " +
          "graft-candles (the reference's surface is insert/upsert-only) " +
          "— only the VERSIONED store supports journaled tombstone deletes")
      case _ => fail("one WHEN MATCHED clause only " +
        "(THEN UPDATE SET …, or THEN DELETE — optionally conditioned — " +
        "on a vstore target)")
    }
    val ins = m.notMatchedActions match {
      case Seq() => None
      case Seq(InsertAction(None, assigns)) =>
        Some(fullAssignments("INSERT", assigns))
      case _ => fail("one unconditioned WHEN NOT MATCHED THEN INSERT clause only")
    }
    // WHEN NOT MATCHED BY SOURCE: the one target-driven arm the keyed
    // lowering CAN serve is DELETE — the split already scans the latest
    // key set, and target-minus-source-keys is one anti-join on it. A
    // condition is decidable iff it reads only the key columns that
    // scan carries; anything touching content (or a BY SOURCE UPDATE,
    // whose assignments read content) is refused, never mis-evaluated.
    val (bySrcDel: Option[Option[Expression]],
         bySrcUpd: Option[(Seq[(String, Expression)], Option[Expression])]) =
      m.notMatchedBySourceActions match {
      case Seq() => (None, None)
      case Seq(DeleteAction(cond)) if allowDelete =>
        cond.foreach { c =>
          if (!c.references.subsetOf(targetOut))
            fail("WHEN NOT MATCHED BY SOURCE AND … THEN DELETE condition " +
              "may reference target columns only (the source row is " +
              "absent by definition); got: " + c.sql)
          val nonKey = c.references.map(_.name.toLowerCase).toSeq.distinct
            .filterNot(expectedKeys)
          if (nonKey.nonEmpty)
            fail("WHEN NOT MATCHED BY SOURCE AND … THEN DELETE condition " +
              s"may reference fold-key columns only (${expectedKeys.toSeq.sorted
                .mkString(", ")}) — the keyed lowering scans the target's " +
              "key set, never its content; got content columns: " +
              nonKey.sorted.mkString(", "))
        }
        (Some(cond), None)
      case Seq(_: DeleteAction) =>
        fail("WHEN NOT MATCHED BY SOURCE … THEN DELETE is not supported " +
          "on graft-candles (the reference's surface is insert/upsert-" +
          "only, database/command/ has no delete) — only the VERSIONED " +
          "store supports journaled tombstone deletes")
      // BY SOURCE UPDATE reads and rewrites TARGET content: the lowering
      // folds the latest rows at the source-absent keys and re-projects
      // them with the assignments — so (unlike the DELETE arm) both the
      // condition and the values may reference any target column, and
      // assignments may be PARTIAL (unassigned columns keep the row's
      // values). Fold-key assignments refuse — a by-source arm has no
      // source expression to move a key to. Unlike the DELETE arms this
      // one needs NO tombstones (it rewrites rows in place), so BOTH
      // store shapes support it — on candles the rewrites ride the same
      // crash-atomic upsert as the other halves.
      case Seq(UpdateAction(cond, assigns, _)) =>
        cond.foreach { c =>
          if (!c.references.subsetOf(targetOut))
            fail("WHEN NOT MATCHED BY SOURCE AND … THEN UPDATE condition " +
              "may reference target columns only (the source row is " +
              "absent by definition); got: " + c.sql)
          // non-deterministic conditions would also make the strict
          // cardinality probe disagree with the committed rows (the
          // plan executes twice) — refuse like the row-level UPDATE
          if (!c.deterministic)
            fail("WHEN NOT MATCHED BY SOURCE AND … THEN UPDATE condition " +
              "must be deterministic; got: " + c.sql)
        }
        val byName = assigns.map { a =>
          val name = a.key match {
            case ar: AttributeReference if targetOut.contains(ar) =>
              ar.name.toLowerCase
            case other =>
              fail(s"BY SOURCE UPDATE assigns non-column ${other.sql}")
          }
          if (expectedKeys(name) || name == "year")
            fail(s"BY SOURCE UPDATE may not assign fold-key column $name " +
              "— there is no source row to move the key to (key moves " +
              "are the row-level UPDATE statement's job)")
          if (!a.value.references.subsetOf(targetOut))
            fail(s"BY SOURCE UPDATE assignment to $name may reference " +
              "target columns only (the source row is absent by " +
              "definition); got: " + a.value.sql)
          if (!a.value.deterministic)
            fail(s"BY SOURCE UPDATE assignment to $name must be " +
              "deterministic; got: " + a.value.sql)
          name -> a.value
        }
        byName.groupBy(_._1).collect { case (n, as) if as.length > 1 => n }
          .toSeq.sorted match {
          case Nil => ()
          case dups => fail("BY SOURCE UPDATE assigns " +
            s"${dups.mkString(", ")} more than once")
        }
        (None, Some((byName, cond)))
      case _ => fail("one WHEN NOT MATCHED BY SOURCE clause only (THEN " +
        "DELETE — conditioned on fold-key columns, vstore targets only — " +
        "or THEN UPDATE, both store shapes)")
    }
    if (upd.isEmpty && ins.isEmpty && del.isEmpty && bySrcDel.isEmpty &&
        bySrcUpd.isEmpty)
      fail("no UPDATE, DELETE or INSERT clause")
    (keyMap.toSeq.sortBy(_._1), upd, ins, del, bySrcDel, bySrcUpd)
  }

  /** Shared run body: project the source per clause, split
    * matched/unmatched against `targetKeys` when the clauses differ,
    * return the single batch to commit. `targetKeys` is by-name so the
    * fast `SET * / INSERT *` path never builds it; `targetRows` (the
    * latest full fold) is required — and only evaluated — when a
    * `bySourceUpd` arm is present (the one arm that re-projects target
    * CONTENT), checked loudly at entry rather than by NPE deep inside
    * the arm.
    */
  def mergedRows(session: SparkSession, source: LogicalPlan,
                 tableSchema: StructType,
                 keyMap: Seq[(String, Expression)],
                 updAssigns: Option[Seq[(String, Expression)]],
                 insAssigns: Option[Seq[(String, Expression)]],
                 del: Option[Option[Expression]] = None,
                 bySourceDel: Option[Option[Expression]] = None,
                 bySourceUpd: Option[(Seq[(String, Expression)], Option[Expression])] = None)
                (targetKeys: => DataFrame,
                 targetRows: => DataFrame = null): DataFrame = {
    // contract check up front (by-name: only forces when the arm needs
    // it) — a missing targetRows must fail with the contract, not an
    // NPE inside bySourceUpdateHalf
    lazy val tgtRows: DataFrame = {
      val t = targetRows
      require(t != null, "mergedRows: a WHEN NOT MATCHED BY SOURCE " +
        "UPDATE arm re-projects target content — the caller must pass " +
        "targetRows (the latest fold)")
      t
    }
    if (bySourceUpd.nonEmpty) { tgtRows; () }
    val src = ColumnBridge.ofRows(session, source)
    def project(assigns: Seq[(String, Expression)]): DataFrame = {
      val cols = tableSchema.fields.map { f =>
        val e = assigns.find(_._1 == f.name.toLowerCase).get._2
        ColumnBridge.column(e).cast(f.dataType).as(f.name)
      }
      src.select(cols.toIndexedSeq: _*)
    }
    def canon(a: Seq[(String, Expression)]) =
      a.map { case (n, e) => (n, e.canonicalized) }
    def keyed = keyMap.foldLeft(src) { case (df, (n, e)) =>
      df.withColumn(s"_mk_$n", ColumnBridge.column(e))
    }
    // lazy: the SET * / INSERT * fast path with no delete arm never
    // scans the target at all
    lazy val tgtKeys = targetKeys
    def joinCond(k: DataFrame) = keyMap.map { case (n, _) =>
      k(s"_mk_$n") === tgtKeys(n)
    }.reduce(_ && _)
    def half(assigns: Seq[(String, Expression)], joinType: String) = {
      val k = keyed
      val kept = k.join(tgtKeys, joinCond(k), joinType)
        .drop(keyMap.map(t => s"_mk_${t._1}"): _*)
      val cols = tableSchema.fields.map { f =>
        val e = assigns.find(_._1 == f.name.toLowerCase).get._2
        ColumnBridge.column(e).cast(f.dataType).as(f.name)
      }
      kept.select(cols.toIndexedSeq: _*)
    }
    def tombstoneCols(keyCol: String => org.apache.spark.sql.Column) =
      tableSchema.fields.map { f =>
        keyMap.find(_._1 == f.name.toLowerCase) match {
          case Some((n, _)) => keyCol(n).cast(f.dataType).as(f.name)
          case None => lit(0).cast(f.dataType).as(f.name)
        }
      }
    // WHEN MATCHED [AND cond] THEN DELETE: the matched source keys
    // become TOMBSTONE rows (zeroed content, `_deleted = true`) —
    // committed in the SAME tx as any NOT MATCHED inserts, so MERGE
    // stays one journaled transaction. A condition (validated
    // source-only) filters the source BEFORE the semi-join — matched
    // keys failing it are untouched, exactly ANSI's
    // matched-but-unsatisfied semantics under a single matched
    // clause. Deduped: deleting a key twice is one tombstone.
    def deleteHalf(cond: Option[Expression]): DataFrame = {
      val k = cond.foldLeft(keyed)((df, c) =>
        df.where(ColumnBridge.column(c)))
      val matched = k.join(tgtKeys, joinCond(k), "left_semi")
      matched.select(tombstoneCols(n => matched(s"_mk_$n")).toIndexedSeq: _*)
        .distinct().withColumn("_deleted", lit(true))
    }
    // WHEN NOT MATCHED BY SOURCE [AND cond] THEN DELETE: target keys
    // ABSENT from the source tombstone — ONE anti-join of the latest
    // key set (already scanned for the split) against the distinct
    // source keys; no target content is read. The condition (validated
    // fold-key-only) filters the surviving keys — its resolved target
    // attributes re-bind by NAME against the key-set frame. Deduped:
    // the raw key scan may carry a key once per batch.
    def bySourceDeleteHalf(cond: Option[Expression]): DataFrame = {
      val k = keyed
      val srcKeys = k.select(keyMap.map { case (n, _) =>
        k(s"_mk_$n").as(n)
      }.toIndexedSeq: _*)
      val absent = tgtKeys.join(srcKeys, keyMap.map(_._1), "left_anti")
      val kept = cond.foldLeft(absent) { (df, c) =>
        df.where(ColumnBridge.column(c.transform {
          case a: AttributeReference =>
            org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
              .quoted(a.name)
        }))
      }
      kept.select(tombstoneCols(n => kept(n)).toIndexedSeq: _*)
        .distinct().withColumn("_deleted", lit(true))
    }
    // WHEN NOT MATCHED BY SOURCE [AND cond] THEN UPDATE SET …: the
    // latest rows at source-absent keys, re-projected with the
    // assignments (partial SETs keep unassigned columns) — the one
    // by-source arm that must READ target content, so it anti-joins the
    // full fold (`targetRows`) on the distinct source keys; condition
    // and values re-bind by NAME against that frame. Keys are unique by
    // construction (one fold row per key), so no dedup.
    def bySourceUpdateHalf(assigns: Seq[(String, Expression)],
                           cond: Option[Expression]): DataFrame = {
      val k = keyed
      val srcKeys = k.select(keyMap.map { case (n, _) =>
        k(s"_mk_$n").as(n)
      }.toIndexedSeq: _*)
      val absent = tgtRows.join(srcKeys, keyMap.map(_._1), "left_anti")
      val kept = cond.foldLeft(absent)((df, c) =>
        df.where(VStoreDml.rebind(c)))
      kept.select(tableSchema.fields.map { f =>
        assigns.find(_._1 == f.name.toLowerCase) match {
          case Some((_, e)) => VStoreDml.rebind(e).cast(f.dataType).as(f.name)
          case None => col(f.name)
        }
      }.toIndexedSeq: _*)
    }
    val upserts: Seq[DataFrame] = ((updAssigns, insAssigns) match {
      case (Some(u), Some(i)) if canon(u) == canon(i) =>
        // SET * / INSERT *: matched ∪ unmatched = all source rows — no
        // target split, exactly the Scala commit()/upsert() plan
        Seq(project(u))
      case _ =>
        updAssigns.map(half(_, "left_semi")).toSeq ++
          insAssigns.map(half(_, "left_anti")).toSeq
    }) ++ bySourceUpd.map { case (a, c) => bySourceUpdateHalf(a, c) }.toSeq
    val tombstones: Seq[DataFrame] =
      del.map(deleteHalf).toSeq ++ bySourceDel.map(bySourceDeleteHalf).toSeq
    val rows =
      if (tombstones.isEmpty) upserts.reduce(_ unionByName _)
      else (upserts.map(_.withColumn("_deleted", lit(false))) ++ tombstones)
        .reduce(_ unionByName _)
    strictCardinalityCheck(session, rows, keyMap.map(_._1))
    rows
  }

  /** The ANSI-divergence guard, off by default (see class doc): with
    * `graft.sql.merge.strictSourceCardinality=true`, a source batch
    * carrying several rows for one fold key is refused loudly instead
    * of resolved by the store's last-wins dedup.
    */
  private def strictCardinalityCheck(session: SparkSession, rows: DataFrame,
                                     keyNames: Seq[String]): Unit =
    StrictKeys.duplicate(session, rows, keyNames).foreach { dupDesc =>
      throw new AnalysisException(
        errorClass = "_LEGACY_ERROR_TEMP_0035",
        messageParameters = Map("message" ->
          (s"MERGE INTO graft table: several source rows share fold key " +
            s"($dupDesc) — ANSI MERGE raises a cardinality violation " +
            "here; graft's default lowering resolves it by last-wins " +
            "dedup. Unset graft.sql.merge.strictSourceCardinality to " +
            "accept that, or dedup the source.")))
    }
}

/** The opt-in ANSI-divergence probe shared by the MERGE lowering and
  * the key-moving UPDATE: under
  * `graft.sql.merge.strictSourceCardinality=true`, returns a
  * description of one fold key carried by several rows (None when the
  * mode is off or the batch is key-unique); callers raise their own
  * statement-specific message.
  */
private[plans] object StrictKeys {
  def enabled(session: SparkSession): Boolean = session.conf
    .getOption("graft.sql.merge.strictSourceCardinality")
    .exists(_.equalsIgnoreCase("true"))

  def duplicate(session: SparkSession, rows: DataFrame,
                keyNames: Seq[String]): Option[String] = {
    if (!enabled(session)) return None
    rows.groupBy(keyNames.map(col).toIndexedSeq: _*)
      .count().where(col("count") > 1).limit(1).collect().headOption
      .map(dup => keyNames.zip(dup.toSeq)
        .map { case (k, v) => s"$k=$v" }.mkString(", "))
  }
}

/** The lowered vstore merge: one journaled tx. The latest-key set for
  * the split comes from the gated raw (pre-fold) key scan — the
  * last-wins fold replaces content, never keys, so the folded table's
  * keys are exactly the raw rows' distinct key tuples (the
  * aggregate-pushdown derivation, `keyRowsAsOf`), and the semi/anti
  * join dedups inherently — no winner fold is paid for the split.
  */
case class VStoreMergeCommand(path: String, source: LogicalPlan,
                              keyMap: Seq[(String, Expression)],
                              updAssigns: Option[Seq[(String, Expression)]],
                              insAssigns: Option[Seq[(String, Expression)]],
                              del: Option[Option[Expression]] = None,
                              bySourceDel: Option[Option[Expression]] = None,
                              bySourceUpd: Option[(Seq[(String, Expression)], Option[Expression])] = None)
  extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(source)

  override def run(session: SparkSession): Seq[Row] = {
    val store = VersionedCandleStore(session, path)
    val keyNames = keyMap.map(_._1)
    val rows = MergeLowering.mergedRows(session, source, store.tableSchema,
      keyMap, updAssigns, insAssigns, del, bySourceDel, bySourceUpd)(
      store.keyRowsAsOf(Long.MaxValue).select(keyNames.map(col): _*),
      store.scan()) // full fold, paid only when a BY SOURCE UPDATE arm reads it
    store.commit(rows)
    Seq.empty
  }
}

/** The lowered plain-candle merge: one crash-atomic [[CandleStore.upsert]]
  * (publish-intent + install). The split's target keys come straight
  * off the store scan with only the key columns selected — the plain
  * store holds one live row per key by construction, so the key scan is
  * a pruned parquet read, no fold. `year` rides through the same
  * derive-or-verify contract as `INSERT INTO` (a value disagreeing with
  * `year(ts)` is refused, the store re-derives it).
  */
case class CandleMergeCommand(path: String, source: LogicalPlan,
                              keyMap: Seq[(String, Expression)],
                              updAssigns: Option[Seq[(String, Expression)]],
                              insAssigns: Option[Seq[(String, Expression)]],
                              bySourceUpd: Option[(Seq[(String, Expression)], Option[Expression])] = None)
  extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(source)

  override def run(session: SparkSession): Seq[Row] = {
    val store = CandleStore(session, path)
    val keyNames = keyMap.map(_._1)
    // stamped-but-empty store (CREATE TABLE then MERGE): no partition
    // dirs to scan — the key set is empty, every source row unmatched
    // (the catalog scan's own empty-store guard, mirrored — INCLUDING
    // its recover-first: a crashed-install predecessor batch must be
    // rolled forward before the probe, or its keys read as absent and
    // a matched-update merge silently drops the updates)
    def targetRows: DataFrame = {
      store.recover()
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(session.sparkContext.hadoopConfiguration)
      val hasData = fs.exists(p) &&
        fs.listStatus(p).exists(_.getPath.getName.startsWith("market="))
      if (hasData) store.scan()
      else session.createDataFrame(new java.util.ArrayList[Row](),
        graft.sources.CandleTable.tableSchema)
    }
    // ONE evaluation serves both by-name params (recover + the
    // empty-store probe must not run twice when a split coexists with
    // a by-source arm) while the SET */INSERT * fast path stays lazy
    lazy val tr = targetRows
    val rows = MergeLowering.mergedRows(session, source,
      graft.sources.CandleTable.tableSchema, keyMap, updAssigns, insAssigns,
      bySourceUpd = bySourceUpd)(
      tr.select(keyNames.map(col): _*),
      // the plain store holds one live row per key, so the latest
      // "fold" the by-source rewrite reads IS the scan itself
      tr)
    graft.sources.CandleInserts.insert(rows, overwrite = false,
      "graft-candles", "MERGE never overwrites") { clean =>
      store.upsert(clean); ()
    }
    Seq.empty
  }
}
