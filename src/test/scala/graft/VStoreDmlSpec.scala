package graft

import java.sql.Timestamp

import org.apache.spark.sql.AnalysisException

import graft.model.Candle
import graft.store.VersionedCandleStore

/** SQL `DELETE FROM` / `UPDATE` over graft catalog tables
  * (graft.plans.ResolveGraftDml): the direct ANSI row-level DML forms,
  * lowered to one tombstone tx / one keyed upsert of the affected rows.
  */
class VStoreDmlSpec extends SparkSpec {
  import spark.implicits._

  private def c(code: String, t: String, o: Double): Candle =
    Candle("UPBIT", code, 60, ts(t), o, o + 1, o - 1, o + 0.5, 10.0, 0L)

  private lazy val base: String = {
    val b = tmpDir("vstore-dml")
    spark.conf.set("spark.sql.catalog.vd", classOf[graft.sources.VStoreCatalog].getName)
    spark.conf.set("spark.sql.catalog.vd.base", b)
    spark.conf.set("spark.sql.catalog.cd", classOf[graft.sources.CandleCatalog].getName)
    spark.conf.set("spark.sql.catalog.cd.base", b)
    b
  }

  private def opens(df: org.apache.spark.sql.DataFrame): Map[(String, Timestamp), Double] =
    df.select("code", "ts", "open").collect()
      .map(r => (r.getString(0), r.getTimestamp(1)) -> r.getDouble(2)).toMap

  test("DELETE FROM vstore WHERE <content cond>: matching rows tombstoned " +
      "in ONE tx; as-of intact; zero-match DELETE journals NOTHING") {
    val st = VersionedCandleStore(spark, s"$base/d/del")
    st.commit(Seq(c("BTC", "2022-01-01 10:00:00", 1),
      c("BTC", "2022-01-01 11:00:00", 60),
      c("ETH", "2021-06-01 00:00:00", 3)).toDF())
    // content predicate — DELETE scans the fold, unlike the keyed MERGE
    spark.sql("DELETE FROM vd.d.del WHERE open > 50")
    assert(opens(st.scan()) == Map(
      ("BTC", ts("2022-01-01 10:00:00")) -> 1.0,
      ("ETH", ts("2021-06-01 00:00:00")) -> 3.0))
    assert(st.txLog().where($"kind" === "commit").count() == 2)
    assert(opens(st.scanAsOf(1L)).contains(("BTC", ts("2022-01-01 11:00:00"))))
    // change feed carries the tombstone
    assert(st.changesSince(1L).where($"_deleted").select("code")
      .collect().map(_.getString(0)).toSeq == Seq("BTC"))
    // zero matches: NO empty tx
    spark.sql("DELETE FROM vd.d.del WHERE open > 1e9")
    assert(st.txLog().where($"kind" === "commit").count() == 2,
      "a zero-match DELETE must not journal an empty tx")
    // unconditioned DELETE empties the table
    spark.sql("DELETE FROM vd.d.del")
    assert(st.scan().count() == 0)
  }

  test("UPDATE vstore SET … WHERE …: matched rows rewritten in ONE tx " +
      "(self-referencing values allowed), others untouched, history " +
      "preserved; zero-match UPDATE journals NOTHING") {
    val st = VersionedCandleStore(spark, s"$base/d/upd")
    st.commit(Seq(c("BTC", "2022-01-01 10:00:00", 2),
      c("ETH", "2021-06-01 00:00:00", 3)).toDF())
    spark.sql("UPDATE vd.d.upd SET open = open * 10, volume = volume + 5 " +
      "WHERE code = 'BTC'")
    assert(opens(st.scan()) == Map(
      ("BTC", ts("2022-01-01 10:00:00")) -> 20.0,
      ("ETH", ts("2021-06-01 00:00:00")) -> 3.0))
    val btc = st.scan().where($"code" === "BTC").select("volume", "close").head()
    assert(btc.getDouble(0) == 15.0 && btc.getDouble(1) == 2.5,
      "assigned columns rewritten, unassigned kept")
    assert(st.txLog().where($"kind" === "commit").count() == 2)
    assert(opens(st.scanAsOf(1L))(("BTC", ts("2022-01-01 10:00:00"))) == 2.0)
    spark.sql("UPDATE vd.d.upd SET open = 0 WHERE code = 'NOPE'")
    assert(st.txLog().where($"kind" === "commit").count() == 2,
      "a zero-match UPDATE must not journal an empty tx")
    // unconditioned UPDATE touches every row
    spark.sql("UPDATE vd.d.upd SET bit_fields = 7")
    assert(st.scan().select("bit_fields").collect().forall(_.getLong(0) == 7L))
  }

  test("UPDATE on a PLAIN candle table lowers to the crash-atomic " +
      "upsert; DELETE FROM candle refuses; empty stamped table no-ops") {
    val cs = graft.store.CandleStore(spark, s"$base/pc_dml")
    cs.upsert(Seq(c("BTC", "2022-01-01 10:00:00", 1),
      c("ETH", "2022-01-01 10:00:00", 2)).toDF())
    spark.sql("UPDATE cd.pc_dml SET close = close + 100 WHERE code = 'ETH'")
    val rows = cs.scan().select("code", "close").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rows == Map("BTC" -> 1.5, "ETH" -> 102.5))
    val e = intercept[AnalysisException](
      spark.sql("DELETE FROM cd.pc_dml WHERE code = 'BTC'"))
    assert(e.getMessage.contains("not supported on graft-candles"), e.getMessage)
    // stamped-but-empty table: UPDATE is a no-op, not a scan crash
    spark.sql("CREATE TABLE cd.fresh_dml")
    spark.sql("UPDATE cd.fresh_dml SET close = 0")
  }

  test("key-moving UPDATE on vstore: rewritten keys insert and vacated " +
      "keys tombstone in ONE tx; a chain move resolves the contested " +
      "key to the MOVED row; same-key rewrites tombstone nothing; " +
      "strict mode refuses fan-in") {
    val st = VersionedCandleStore(spark, s"$base/d/mv")
    st.commit(Seq(c("BTC", "2022-01-01 10:00:00", 1),
      c("BTC", "2022-01-01 11:00:00", 2),
      c("ETH", "2021-06-01 00:00:00", 3)).toDF())
    spark.sql("UPDATE vd.d.mv SET ts = ts + INTERVAL '30' MINUTE " +
      "WHERE code = 'BTC'")
    assert(opens(st.scan()) == Map(
      ("BTC", ts("2022-01-01 10:30:00")) -> 1.0,
      ("BTC", ts("2022-01-01 11:30:00")) -> 2.0,
      ("ETH", ts("2021-06-01 00:00:00")) -> 3.0))
    assert(st.txLog().where($"kind" === "commit").count() == 2,
      "move + tombstones must be ONE journaled tx")
    assert(opens(st.scanAsOf(1L)).contains(("BTC", ts("2022-01-01 10:00:00"))))
    val flagged = st.changesSince(1L).where($"_deleted")
      .select("ts").collect().map(_.getTimestamp(0)).toSet
    assert(flagged == Set(ts("2022-01-01 10:00:00"), ts("2022-01-01 11:00:00")),
      "exactly the vacated keys carry tombstones")
    // CHAIN move: 10:30 lands on 11:30 just as 11:30 vacates it — the
    // moved row must win the contested key (new rows rank above
    // tombstones in the within-batch fold)
    spark.sql("UPDATE vd.d.mv SET ts = ts + INTERVAL '60' MINUTE " +
      "WHERE code = 'BTC'")
    assert(opens(st.scan()) == Map(
      ("BTC", ts("2022-01-01 11:30:00")) -> 1.0,
      ("BTC", ts("2022-01-01 12:30:00")) -> 2.0,
      ("ETH", ts("2021-06-01 00:00:00")) -> 3.0))
    // same-key rewrite: key assigned but value unchanged — no tombstone
    spark.sql("UPDATE vd.d.mv SET market = market WHERE code = 'ETH'")
    assert(opens(st.scan()).size == 3)
    assert(st.changesSince(3L).where($"_deleted").count() == 0,
      "a key assignment that does not move must tombstone nothing")
    // …and on a NEVER-deleting store, a no-move key rewrite must not
    // stamp the tombstone marker (its feed schema stays flagless)
    val clean = VersionedCandleStore(spark, s"$base/d/mv2")
    clean.commit(Seq(c("BTC", "2022-01-01 10:00:00", 1)).toDF())
    spark.sql("UPDATE vd.d.mv2 SET market = market")
    assert(!clean.changesSince(1L).columns.contains("_deleted"),
      "a no-move key rewrite must not widen a clean store's feed schema")
    // strict mode: two rows moved onto ONE key refuse loudly
    spark.conf.set("graft.sql.merge.strictSourceCardinality", "true")
    try {
      val e = intercept[AnalysisException](spark.sql(
        "UPDATE vd.d.mv SET ts = timestamp'2030-01-01 00:00:00' " +
          "WHERE code = 'BTC'"))
      assert(e.getMessage.contains("last-wins"), e.getMessage)
    } finally spark.conf.unset("graft.sql.merge.strictSourceCardinality")
    // default: the fan-in dedups to one row at the target key
    spark.sql("UPDATE vd.d.mv SET ts = timestamp'2030-01-01 00:00:00' " +
      "WHERE code = 'BTC'")
    assert(st.scan().where($"code" === "BTC").count() == 1)
  }

  test("strict mode also refuses a move onto an EXISTING key the WHERE " +
      "did not match (ANSI uniqueness); default replaces it (keyed upsert)") {
    val st = VersionedCandleStore(spark, s"$base/d/mv3")
    st.commit(Seq(c("BTC", "2022-01-01 10:00:00", 1),
      c("BTC", "2022-01-01 11:00:00", 2)).toDF())
    spark.conf.set("graft.sql.merge.strictSourceCardinality", "true")
    try {
      val e = intercept[AnalysisException](spark.sql(
        "UPDATE vd.d.mv3 SET ts = ts + INTERVAL '60' MINUTE " +
          "WHERE ts = timestamp'2022-01-01 10:00:00'"))
      assert(e.getMessage.contains("EXISTING fold key"), e.getMessage)
      assert(opens(st.scan()).size == 2 &&
        st.txLog().where($"kind" === "commit").count() == 1,
        "the refused move must not have committed")
      // a move onto a VACATED matched key stays allowed under strict
      // (both rows shift; no unmatched collision, no within-batch dup)
      spark.sql("UPDATE vd.d.mv3 SET ts = ts + INTERVAL '60' MINUTE")
      assert(opens(st.scan()) == Map(
        ("BTC", ts("2022-01-01 11:00:00")) -> 1.0,
        ("BTC", ts("2022-01-01 12:00:00")) -> 2.0))
    } finally spark.conf.unset("graft.sql.merge.strictSourceCardinality")
    // default mode: the same collision replaces the unmatched row
    spark.sql("UPDATE vd.d.mv3 SET ts = ts + INTERVAL '60' MINUTE " +
      "WHERE ts = timestamp'2022-01-01 11:00:00'")
    assert(opens(st.scan()) == Map(
      ("BTC", ts("2022-01-01 12:00:00")) -> 1.0))
  }

  test("subquery WHERE conditions lower on both statements and stores: " +
      "IN / correlated EXISTS / self-referencing scalar, each ONE tx " +
      "evaluated against pre-statement state") {
    val st = VersionedCandleStore(spark, s"$base/d/sq")
    st.commit(Seq(c("BTC", "2022-01-01 10:00:00", 1),
      c("ETH", "2022-01-01 10:00:00", 10),
      c("SOL", "2022-01-01 10:00:00", 100)).toDF())
    // uncorrelated IN over another table
    Seq("ETH", "SOL").toDF("victim").createOrReplaceTempView("dml_victims")
    spark.sql("DELETE FROM vd.d.sq WHERE code IN " +
      "(SELECT victim FROM dml_victims WHERE victim <> 'SOL')")
    assert(opens(st.scan()).keySet.map(_._1) == Set("BTC", "SOL"))
    assert(st.txLog().where($"kind" === "commit").count() == 2)
    // SELF-referencing scalar subquery: ANSI evaluates it against
    // pre-update state — avg(open) over {1, 100} = 50.5, so only SOL
    // matches and the new avg must NOT re-enter the predicate
    spark.sql("UPDATE vd.d.sq SET open = open + 1 " +
      "WHERE open > (SELECT avg(open) FROM vd.d.sq)")
    assert(opens(st.scan()) == Map(
      ("BTC", ts("2022-01-01 10:00:00")) -> 1.0,
      ("SOL", ts("2022-01-01 10:00:00")) -> 101.0))
    // correlated EXISTS
    spark.sql("DELETE FROM vd.d.sq WHERE EXISTS " +
      "(SELECT 1 FROM dml_victims v WHERE v.victim = code)")
    assert(opens(st.scan()).keySet.map(_._1) == Set("BTC"))
    // zero-match subquery DELETE journals nothing
    val n = st.txLog().where($"kind" === "commit").count()
    spark.sql("DELETE FROM vd.d.sq WHERE code IN " +
      "(SELECT victim FROM dml_victims WHERE victim = 'NOPE')")
    assert(st.txLog().where($"kind" === "commit").count() == n)
    // subquery WHERE on a KEY-MOVING update: the move machinery rides
    // the carried filter plan unchanged
    Seq("BTC").toDF("keep").createOrReplaceTempView("dml_keep")
    spark.sql("UPDATE vd.d.sq SET ts = ts + INTERVAL '30' MINUTE " +
      "WHERE code IN (SELECT keep FROM dml_keep)")
    assert(opens(st.scan()).keySet ==
      Set(("BTC", ts("2022-01-01 10:30:00"))))
    // …and on the PLAIN candle store
    val cs = graft.store.CandleStore(spark, s"$base/pc_sq")
    cs.upsert(Seq(c("BTC", "2022-01-01 10:00:00", 1),
      c("ETH", "2022-01-01 10:00:00", 2)).toDF())
    spark.sql("UPDATE cd.pc_sq SET close = close + 100 WHERE code IN " +
      "(SELECT victim FROM dml_victims WHERE victim = 'ETH')")
    val rows = cs.scan().select("code", "close").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rows == Map("BTC" -> 1.5, "ETH" -> 102.5))
  }

  test("refusals are loud: fold-key/year assignment, subquery condition, " +
      "non-deterministic condition, time-travel target") {
    val st = VersionedCandleStore(spark, s"$base/d/no")
    st.commit(Seq(c("BTC", "2022-01-01 10:00:00", 1)).toDF())
    def refused(sql: String, needle: String): Unit = {
      val e = intercept[AnalysisException](spark.sql(sql))
      assert(e.getMessage.contains(needle), s"got: ${e.getMessage}")
    }
    // key assignments MOVE rows on the vstore (tested below) but the
    // plain candle store has no tombstones — refused there (own table:
    // this test must not depend on another test's fixture)
    graft.store.CandleStore(spark, s"$base/pc_no")
      .upsert(Seq(c("BTC", "2022-01-01 10:00:00", 1)).toDF())
    refused("UPDATE cd.pc_no SET ts = ts + INTERVAL '1' MINUTE",
      "may not assign ts on graft-candles")
    refused("UPDATE cd.pc_no SET code = 'X'",
      "may not assign code on graft-candles")
    refused("UPDATE vd.d.no SET year = 1999", "may not assign year")
    refused("UPDATE vd.d.no SET open = 1, open = 2", "more than once")
    // a NULL key assignment would collapse matched rows into one
    // unaddressable null-key group — refused at run, nothing committed
    refused("UPDATE vd.d.no SET ts = CAST(NULL AS TIMESTAMP)",
      "assigns NULL to a fold-key column")
    // WHERE subqueries are supported; assignment-VALUE subqueries and
    // non-deterministic subquery PLANS are not
    refused("UPDATE vd.d.no SET open = (SELECT avg(open) FROM vd.d.no)",
      "subquery")
    refused("DELETE FROM vd.d.no WHERE open > (SELECT avg(open) " +
      "FROM vd.d.no WHERE rand() > 0.5)", "non-deterministic subquery")
    refused("UPDATE vd.d.no SET open = 0 WHERE rand() > 0.5",
      "deterministic")
    refused("DELETE FROM vd.d.no WHERE rand() > 0.5", "deterministic")
    intercept[Exception](spark.sql(
      "DELETE FROM vd.d.no VERSION AS OF 1 WHERE open > 0"))
    assert(opens(st.scan()) == Map(("BTC", ts("2022-01-01 10:00:00")) -> 1.0),
      "refused statements must not have committed")
    assert(st.txLog().where($"kind" === "commit").count() == 1)
  }
}
