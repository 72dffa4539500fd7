package graft.plans

import org.apache.spark.sql.{AnalysisException, Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{DeleteFromTable, Filter, LogicalPlan, SubqueryAlias, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.graft.ColumnBridge

import graft.sources.{CandleTable, VStoreTable}
import graft.store.{CandleStore, VersionedCandleStore}

/** SQL `DELETE FROM` / `UPDATE` for graft catalog tables — the
  * row-level DML statements MERGE already lowers arm-by-arm, now as
  * their direct ANSI forms:
  *
  *  - `DELETE FROM <vstore> WHERE <cond>` → the latest fold scanned
  *    under the condition (ANY deterministic column predicate — unlike
  *    the keyed MERGE lowering this path DOES read content, that is
  *    what a row-level delete is), matching keys journaled as ONE
  *    tombstone tx ([[VersionedCandleStore.delete]]). Candle targets
  *    refuse (the reference's surface is insert/upsert-only,
  *    `database/command/`);
  *  - `UPDATE <table> SET <col> = <expr>, … [WHERE <cond>]` on BOTH
  *    store shapes → matching rows re-projected with the assignments
  *    (values may reference the row's own columns — `SET close =
  *    close * 2` works) and committed back as ONE journaled tx
  *    (vstore) / ONE crash-atomic upsert (candle) — semantically an
  *    upsert of the rewritten rows, which is exactly the reference's
  *    write primitive (`page/page.go:114-123`). Fold-key assignments
  *    (market, code, candle_length, ts) MOVE rows: on the VERSIONED
  *    store the move lowers to tombstone-old-key + insert-new-key in
  *    one tx (see [[VStoreUpdateCommand]]); the plain candle store has
  *    no tombstones, so it refuses key assignments — silently leaving
  *    the old key in place is the one wrong answer. `year` is refused
  *    on both (derived from ts).
  *
  * WHERE conditions may contain SUBQUERIES (IN / EXISTS / scalar,
  * correlated or not, self-referencing included — ANSI's evaluate-
  * against-pre-delete-state semantics hold because the matching keys
  * are computed before anything commits): the command carries the
  * statement's own resolved filter plan and Spark's subquery rewrite
  * plans it. Everything must stay DETERMINISTIC — including inside
  * subquery plans, which `Expression.deterministic` does not descend
  * into. Assignment VALUES stay subquery-free (rewrite as `MERGE …
  * USING <source query>`). Zero matching rows is a no-op — no empty
  * tx is journaled. Time-travel / change-feed lenses refuse as
  * targets.
  *
  * Scale note: both statements are one scan of the latest fold plus
  * one commit of only the affected rows — never a rewrite of untouched
  * data files. With a PLAIN WHERE, partition-prunable predicates reach
  * the parquet scan; with a SUBQUERY in the WHERE, the carried filter
  * plan lowers to a join (semi/anti/scalar broadcast), so only the
  * condition's residual non-subquery conjuncts prune the target scan —
  * a subquery-only WHERE reads the whole fold once.
  */
case class ResolveGraftDml(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case d @ DeleteFromTable(target, condition)
        if d.resolved && vstoreOf(target).isDefined =>
      val t = vstoreOf(target).get
      lensGuard(t, "DELETE FROM")
      validateCond(condition, "DELETE condition")
      // a subquery condition (IN / EXISTS / scalar, correlated or not)
      // cannot re-bind by name against a fresh scan — carry the
      // resolved Filter(cond, relation) instead and let the optimizer's
      // own subquery rewrite plan it (ANSI: the subquery evaluates
      // against PRE-delete state, which computing the keys first gives).
      // The command's own condition FIELD must stay subquery-free —
      // CheckAnalysis only admits subqueries under known node kinds,
      // and Filter is one
      if (hasSubquery(condition))
        VStoreDeleteCommand(t.path,
          org.apache.spark.sql.catalyst.expressions.Literal.TrueLiteral,
          matchedPlan = Some(Filter(condition, target)))
      else VStoreDeleteCommand(t.path, condition)
    case d @ DeleteFromTable(target, _)
        if d.resolved && candleOf(target).isDefined =>
      fail("DELETE FROM is not supported on graft-candles (the " +
        "reference's surface is insert/upsert-only, database/command/ " +
        "has no delete) — only the VERSIONED store supports journaled " +
        "tombstone deletes")
    case u @ UpdateTable(target, assignments, condition)
        if u.resolved && vstoreOf(target).isDefined =>
      val t = vstoreOf(target).get
      lensGuard(t, "UPDATE")
      val subPlan = condition.filter(hasSubquery).map(c => Filter(c, target))
      VStoreUpdateCommand(t.path,
        validateAssignments(assignments, condition, allowKeyMove = true),
        if (subPlan.isDefined) None else condition,
        matchedPlan = subPlan)
    case u @ UpdateTable(target, assignments, condition)
        if u.resolved && candleOf(target).isDefined =>
      val t = candleOf(target).get
      val subPlan = condition.filter(hasSubquery).map(c => Filter(c, target))
      CandleUpdateCommand(t.path,
        validateAssignments(assignments, condition, allowKeyMove = false),
        if (subPlan.isDefined) None else condition,
        matchedPlan = subPlan)
  }

  private def hasSubquery(e: Expression): Boolean =
    e.exists(_.isInstanceOf[SubqueryExpression])

  private def lensGuard(t: VStoreTable, stmt: String): Unit =
    if (t.asOfTxOpt.nonEmpty || t.asOfTimeOpt.nonEmpty ||
        t.changesSinceOpt.nonEmpty)
      fail(s"$stmt target is a VERSION AS OF / TIMESTAMP AS OF / " +
        "change-feed lens — read-only; write to the latest table")

  private def validateAssignments(
      assignments: Seq[org.apache.spark.sql.catalyst.plans.logical.Assignment],
      condition: Option[Expression],
      allowKeyMove: Boolean): Seq[(String, Expression)] = {
    condition.foreach(validateCond(_, "UPDATE condition"))
    val keys = (graft.model.Candle.keyCols :+ "ts").toSet
    // ANSI requires an error for duplicate SET targets; updatedRows
    // resolves by `find`, which would otherwise silently apply the FIRST
    val dupTargets = assignments.flatMap(_.key match {
      case ar: AttributeReference => Some(ar.name.toLowerCase)
      case _ => None
    }).groupBy(identity).collect { case (n, as) if as.length > 1 => n }
    if (dupTargets.nonEmpty)
      fail(s"UPDATE assigns ${dupTargets.toSeq.sorted.mkString(", ")} more " +
        "than once — one assignment per column (ANSI duplicate SET target)")
    assignments.map { a =>
      val name = a.key match {
        case ar: AttributeReference => ar.name.toLowerCase
        case other => fail(s"UPDATE assigns non-column ${other.sql}")
      }
      if (name == "year")
        fail("UPDATE may not assign year — it derives from ts")
      // a LITERAL NULL into a fold key is refused here with a real
      // message; a data-dependent null cannot be decided statically and
      // trips Spark's own AssertNotNull at run (the analyzer wraps
      // assignment values for non-nullable targets) — loud either way,
      // never a silent null-key collapse
      def strip(x: Expression): Expression = x match {
        case al: org.apache.spark.sql.catalyst.expressions.Alias => strip(al.child)
        case n: org.apache.spark.sql.catalyst.expressions.objects.AssertNotNull => strip(n.child)
        case cst: org.apache.spark.sql.catalyst.expressions.Cast => strip(cst.child)
        case other => other
      }
      if (keys(name) && (strip(a.value) match {
        case l: org.apache.spark.sql.catalyst.expressions.Literal => l.value == null
        case _ => false
      }))
        fail(s"UPDATE assigns NULL to a fold-key column ($name) — fold " +
          "keys are non-null")
      // fold-key assignments MOVE rows: the versioned store lowers the
      // move to tombstone-old-key + insert-new-key in ONE tx; the plain
      // candle store has no tombstones, so it keeps refusing
      if (keys(name) && !allowKeyMove)
        fail(s"UPDATE may not assign $name on graft-candles — a keyed " +
          "upsert cannot move a row and the plain store has no " +
          "tombstones (the VERSIONED store supports key-moving UPDATE)")
      validateExpr(a.value, s"UPDATE assignment to $name")
      name -> a.value
    }
  }

  private[plans] def fail(msg: String): Nothing = VStoreDml.fail(msg)

  private def validateExpr(e: Expression, what: String): Unit = {
    if (!e.deterministic)
      fail(s"$what must be deterministic; got: ${e.sql}")
    if (e.exists(_.isInstanceOf[SubqueryExpression]))
      fail(s"$what may not contain a subquery — rewrite as " +
        s"MERGE INTO … USING <source query>; got: ${e.sql}")
  }

  /** WHERE conditions: subqueries allowed (the command carries the
    * resolved filter plan), but everything must stay deterministic —
    * including expressions INSIDE subquery plans, which Spark's own
    * `Expression.deterministic` does not descend into.
    */
  private def validateCond(e: Expression, what: String): Unit = {
    // the specific message first: a rand() INSIDE a subquery plan also
    // flips e.deterministic
    if (subqueryNonDet(e))
      fail(s"$what contains a non-deterministic subquery; got: ${e.sql}")
    if (!e.deterministic)
      fail(s"$what must be deterministic; got: ${e.sql}")
  }

  private def subqueryNonDet(e: Expression): Boolean =
    e.collect { case s: SubqueryExpression => s }.exists { s =>
      s.plan.exists(node => node.expressions.exists(x =>
        !x.deterministic || subqueryNonDet(x)))
    }

  private def vstoreOf(plan: LogicalPlan): Option[VStoreTable] = plan match {
    case SubqueryAlias(_, child) => vstoreOf(child)
    case r: DataSourceV2Relation => r.table match {
      case t: VStoreTable => Some(t)
      case _ => None
    }
    case _ => None
  }

  private def candleOf(plan: LogicalPlan): Option[CandleTable] = plan match {
    case SubqueryAlias(_, child) => candleOf(child)
    case r: DataSourceV2Relation => r.table match {
      case t: CandleTable => Some(t)
      case _ => None
    }
    case _ => None
  }
}

private[plans] object VStoreDml {
  def fail(msg: String): Nothing =
    throw new AnalysisException(
      errorClass = "_LEGACY_ERROR_TEMP_0035",
      messageParameters = Map("message" -> s"DML on graft table: $msg"))

  /** The human-facing condition for a command's simpleString: the
    * carried subquery plan's own Filter condition when present (the
    * command's `condition` field is then a placeholder TrueLiteral —
    * rendering it would hide the real predicate from EXPLAIN).
    */
  def condDesc(condition: Expression,
               matchedPlan: Option[LogicalPlan]): String =
    matchedPlan.collectFirst { case f: Filter => f.condition.sql }
      .getOrElse(condition.sql)

  /** Re-bind a resolved target expression by NAME against a fresh scan
    * frame (the command runs against its own `store.scan()` plan whose
    * attribute ids differ from the analyzed statement's).
    */
  def rebind(e: Expression): Column =
    ColumnBridge.column(e.transform {
      case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
    })

  /** The matched rows re-projected with the assignments; unassigned
    * columns keep their scanned values.
    */
  def updatedRows(scan: org.apache.spark.sql.DataFrame,
                  schema: org.apache.spark.sql.types.StructType,
                  assignments: Seq[(String, Expression)],
                  condition: Option[Expression]): org.apache.spark.sql.DataFrame = {
    val matched = condition.foldLeft(scan)((df, c) => df.where(rebind(c)))
    matched.select(schema.fields.map { f =>
      assignments.find(_._1 == f.name.toLowerCase) match {
        case Some((_, e)) => rebind(e).cast(f.dataType).as(f.name)
        case None => col(f.name)
      }
    }.toIndexedSeq: _*)
  }
}

/** `DELETE FROM <vstore> WHERE <cond>`: one pruned scan of the latest
  * fold under the condition, matching keys tombstoned in ONE journaled
  * tx. Zero matches journal nothing. A subquery condition arrives as
  * `matchedPlan` — the statement's own resolved `Filter(cond,
  * relation)`, executed as-is so Spark's subquery rewrite (semi/anti
  * join, scalar broadcast) plans it; the relation reads the same
  * latest fold the plain path scans.
  */
case class VStoreDeleteCommand(path: String, condition: Expression,
                               matchedPlan: Option[LogicalPlan] = None)
  extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = matchedPlan.toSeq

  // EXPLAIN shows the REAL predicate: the subquery path parks a
  // TrueLiteral in `condition` (CheckAnalysis admits subqueries only
  // under known node kinds) — render the carried plan's filter instead
  override def simpleString(maxFields: Int): String =
    s"VStoreDeleteCommand `$path` [${VStoreDml.condDesc(condition, matchedPlan)}]"

  override def run(session: SparkSession): Seq[Row] = {
    val store = VersionedCandleStore(session, path)
    val matched = matchedPlan match {
      case Some(p) => ColumnBridge.ofRows(session, p)
      case None => store.scan().where(VStoreDml.rebind(condition))
    }
    // one fold feeds both the zero-match probe and the tombstone tx
    // (isEmpty alone would still pay the scan's shuffle map side twice)
    val keys = matched
      .select((graft.model.Candle.keyCols :+ "ts").map(col).toIndexedSeq: _*)
      .localCheckpoint()
    try if (!keys.isEmpty) store.delete(keys)
    finally org.apache.spark.sql.graft.ColumnBridge.unpersistCheckpoint(keys)
    Seq.empty
  }
}

/** `UPDATE <vstore> SET … [WHERE …]`: matched rows re-projected and
  * committed as ONE journaled tx (history preserved — as-of before the
  * update reconstructs the old rows). Zero matches journal nothing.
  *
  * FOLD-KEY assignments MOVE rows: the matched rows' rewritten
  * versions insert at their new keys and every key that actually
  * CHANGED gets a tombstone for its old key — in the SAME tx, with
  * the new rows ordinally ranked ABOVE the tombstones so a row moving
  * onto another matched row's vacated key deterministically wins the
  * within-batch fold. ANSI divergence (the MERGE one): two rows moved
  * onto one key resolve by last-wins dedup, and a move onto an
  * EXISTING unmatched key replaces it (keyed-upsert semantics);
  * `graft.sql.merge.strictSourceCardinality=true` refuses BOTH shapes
  * loudly instead — within-batch key fan-in AND a move onto an
  * existing key the WHERE did not match.
  */
case class VStoreUpdateCommand(path: String,
                               assignments: Seq[(String, Expression)],
                               condition: Option[Expression],
                               matchedPlan: Option[LogicalPlan] = None)
  extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = matchedPlan.toSeq

  override def simpleString(maxFields: Int): String =
    s"VStoreUpdateCommand `$path` set=[${assignments.map(_._1).mkString(",")}] " +
      s"[${VStoreDml.condDesc(
        condition.getOrElse(org.apache.spark.sql.catalyst.expressions.Literal.TrueLiteral),
        matchedPlan)}]"

  /** The matched rows: the carried subquery filter plan when the WHERE
    * had one, otherwise the condition re-bound over a fresh scan.
    */
  private def matchedRows(session: SparkSession,
                          store: VersionedCandleStore): org.apache.spark.sql.DataFrame =
    matchedPlan match {
      case Some(p) => ColumnBridge.ofRows(session, p)
      case None => condition.foldLeft(store.scan())((df, c) =>
        df.where(VStoreDml.rebind(c)))
    }

  override def run(session: SparkSession): Seq[Row] = {
    val store = VersionedCandleStore(session, path)
    val keyNames = graft.model.Candle.keyCols :+ "ts"
    val keyAssigns = assignments.filter(a => keyNames.contains(a._1))
    if (keyAssigns.isEmpty) {
      // one fold feeds both the zero-match probe and the commit
      val rows = VStoreDml.updatedRows(matchedRows(session, store),
        store.tableSchema, assignments, None).localCheckpoint()
      try if (!rows.isEmpty) store.commit(rows)
      finally org.apache.spark.sql.graft.ColumnBridge.unpersistCheckpoint(rows)
      return Seq.empty
    }
    // key move: matched rows feed the new rows AND the old-key
    // tombstones — pin the fold once
    val matched = matchedRows(session, store).localCheckpoint()
    try {
      if (!matched.isEmpty) {
        val newRows = VStoreDml.updatedRows(matched, store.tableSchema,
          assignments, None)
        // null-key safety: literal NULLs refused at analysis
        // (validateAssignments); data-dependent nulls trip Spark's own
        // AssertNotNull at run — no probe here can see them (the
        // analyzer's wrapper makes isNull constant-fold to false)
        // MERGE's cardinality divergence applied to moves: strict mode
        // refuses several rows rewritten onto one fold key
        StrictKeys.duplicate(session, newRows, keyNames).foreach { dupDesc =>
          VStoreDml.fail(s"UPDATE moves several rows onto one fold key " +
            s"($dupDesc) — ANSI raises a cardinality/uniqueness " +
            "violation here; graft's default lowering resolves it by " +
            "last-wins dedup. Unset " +
            "graft.sql.merge.strictSourceCardinality to accept that.")
        }
        // …and a move onto an EXISTING key the WHERE did not match —
        // ANSI raises a uniqueness violation there too; the default
        // lowering replaces that row (keyed-upsert semantics)
        if (StrictKeys.enabled(session)) {
          val latest = store.keyRowsAsOf(Long.MaxValue)
            .select(keyNames.map(col).toIndexedSeq: _*)
          val unmatchedExisting = latest.join(
            matched.select(keyNames.map(col).toIndexedSeq: _*),
            keyNames, "left_anti")
          newRows.select(keyNames.map(col).toIndexedSeq: _*)
            .join(unmatchedExisting, keyNames, "left_semi")
            .limit(1).collect().headOption.foreach { r =>
              VStoreDml.fail("UPDATE moves a row onto an EXISTING fold " +
                s"key the WHERE did not match (${keyNames.zip(r.toSeq)
                  .map { case (k, v) => s"$k=$v" }.mkString(", ")}) — ANSI " +
                "raises a uniqueness violation; graft's default lowering " +
                "replaces that row (keyed-upsert semantics). Unset " +
                "graft.sql.merge.strictSourceCardinality to accept that.")
            }
        }
        // only keys that actually CHANGED tombstone — a same-key
        // rewrite must not race its own tombstone in the fold
        val movedCond = keyAssigns.map { case (n, e) =>
          val f = store.tableSchema.fields.find(_.name.toLowerCase == n).get
          !(VStoreDml.rebind(e).cast(f.dataType) <=> col(n))
        }.reduce(_ || _)
        val movedKeys = matched.where(movedCond)
          .select(keyNames.map(col).toIndexedSeq: _*).localCheckpoint()
        try {
          if (movedKeys.isEmpty) {
            // nothing actually moved: a plain content rewrite — do NOT
            // ship a _deleted column, which would permanently stamp a
            // never-deleting store tombstone-aware and widen its feed
            store.commit(newRows)
          } else {
            // the canonical tombstone shape (VersionedCandleStore owns
            // it); no dedup — the fold's rows are key-unique already.
            // NOT "_ord": commit() builds its own "_ord" from the
            // ordinal column and drops the caller's name first
            val tombstones = store.tombstoneRows(movedKeys, dedup = false)
              .withColumn("_move_ord", lit(0L))
            val batch = newRows
              .withColumn("_deleted", lit(false))
              .withColumn("_move_ord", lit(1L))
              .unionByName(tombstones)
            store.commit(batch, ordinalCol = Some("_move_ord"))
          }
        } finally org.apache.spark.sql.graft.ColumnBridge
          .unpersistCheckpoint(movedKeys)
      }
    } finally org.apache.spark.sql.graft.ColumnBridge
      .unpersistCheckpoint(matched)
    Seq.empty
  }
}

/** `UPDATE <candle table> SET … [WHERE …]`: matched rows re-projected
  * and upserted back crash-atomically — the reference's own write
  * primitive applied to the statement's row set.
  */
case class CandleUpdateCommand(path: String,
                               assignments: Seq[(String, Expression)],
                               condition: Option[Expression],
                               matchedPlan: Option[LogicalPlan] = None)
  extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = matchedPlan.toSeq

  override def simpleString(maxFields: Int): String =
    s"CandleUpdateCommand `$path` set=[${assignments.map(_._1).mkString(",")}] " +
      s"[${VStoreDml.condDesc(
        condition.getOrElse(org.apache.spark.sql.catalyst.expressions.Literal.TrueLiteral),
        matchedPlan)}]"

  override def run(session: SparkSession): Seq[Row] = {
    val store = CandleStore(session, path)
    // recover-first, then the stamped-but-empty guard (CREATE TABLE
    // then UPDATE): no partition dirs → nothing to match, a no-op —
    // mirrors CandleMergeCommand's targetKeys
    store.recover()
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(session.sparkContext.hadoopConfiguration)
    val hasData = fs.exists(p) &&
      fs.listStatus(p).exists(_.getPath.getName.startsWith("market="))
    if (!hasData) return Seq.empty
    // recovery already ran above — don't pay it again inside scan();
    // a subquery WHERE arrives as the statement's own resolved filter
    // plan (its relation scan re-recovers, which is idempotent)
    val matched = matchedPlan match {
      case Some(mp) => VStoreDml.updatedRows(
        ColumnBridge.ofRows(session, mp), CandleTable.tableSchema,
        assignments, None)
      case None => VStoreDml.updatedRows(store.scanNoRecover(),
        CandleTable.tableSchema, assignments, condition)
    }
    val rows = matched.localCheckpoint()
    try if (!rows.isEmpty)
      graft.sources.CandleInserts.insert(rows, overwrite = false,
        "graft-candles", "UPDATE never overwrites") { clean =>
        store.upsert(clean); ()
      }
    finally org.apache.spark.sql.graft.ColumnBridge.unpersistCheckpoint(rows)
    Seq.empty
  }
}
