package graft

import java.sql.Timestamp

import org.apache.spark.sql.AnalysisException

import graft.model.Candle
import graft.store.VersionedCandleStore

/** SQL `MERGE INTO` over graft-vstore catalog tables, lowered to the
  * journaled one-tx upsert (graft.plans.VStoreMerge): the SQL-only
  * user's keyed-update surface. Semantics gates mirror the Scala
  * `commit()` differential; refusal gates keep the append-only model
  * loud (no DELETE, no partial-row update, OVERWRITE still refused).
  */
class VStoreMergeSpec extends SparkSpec {
  import spark.implicits._

  private def c(code: String, t: String, o: Double): Candle =
    Candle("UPBIT", code, 60, ts(t), o, o + 1, o - 1, o + 0.5, 10.0, 0L)

  private lazy val base: String = {
    val b = tmpDir("vstore-merge")
    spark.conf.set("spark.sql.catalog.vm", classOf[graft.sources.VStoreCatalog].getName)
    spark.conf.set("spark.sql.catalog.vm.base", b)
    b
  }

  private def opens(df: org.apache.spark.sql.DataFrame): Map[(String, Timestamp), Double] =
    df.select("code", "ts", "open").collect()
      .map(r => (r.getString(0), r.getTimestamp(1)) -> r.getDouble(2)).toMap

  test("MERGE SET * / INSERT * == the Scala upsert commit: one journaled " +
      "tx, matched keys updated, new keys inserted") {
    val st = VersionedCandleStore(spark, s"$base/m/up")
    st.commit(Seq(c("BTC", "2022-01-01 10:00:00", 1),
      c("BTC", "2022-01-01 10:01:00", 2)).toDF())
    Seq(c("BTC", "2022-01-01 10:01:00", 20), // update
      c("ETH", "2021-06-01 00:00:00", 5))    // insert
      .toDF().withColumn("year", org.apache.spark.sql.functions.year($"ts"))
      .createOrReplaceTempView("src_up")
    spark.sql(
      """MERGE INTO vm.m.up t USING src_up s
         ON t.market = s.market AND t.code = s.code
            AND t.candle_length = s.candle_length AND t.ts = s.ts
         WHEN MATCHED THEN UPDATE SET *
         WHEN NOT MATCHED THEN INSERT *""")
    assert(opens(st.scan()) == Map(
      ("BTC", ts("2022-01-01 10:00:00")) -> 1.0,
      ("BTC", ts("2022-01-01 10:01:00")) -> 20.0,
      ("ETH", ts("2021-06-01 00:00:00")) -> 5.0))
    // ONE tx for the whole merge; history is preserved (as-of tx 1)
    assert(st.txLog().where($"kind" === "commit").count() == 2)
    assert(opens(st.scanAsOf(1L)) == Map(
      ("BTC", ts("2022-01-01 10:00:00")) -> 1.0,
      ("BTC", ts("2022-01-01 10:01:00")) -> 2.0))
  }

  test("UPDATE-only merge touches matched keys ONLY; INSERT-only merge " +
      "adds new keys ONLY") {
    val st = VersionedCandleStore(spark, s"$base/m/half")
    st.commit(Seq(c("BTC", "2022-01-01 10:00:00", 1)).toDF())
    Seq(c("BTC", "2022-01-01 10:00:00", 9), c("ETH", "2022-01-01 10:00:00", 7))
      .toDF().withColumn("year", org.apache.spark.sql.functions.year($"ts"))
      .createOrReplaceTempView("src_half")
    val on =
      """ON t.market = s.market AND t.code = s.code
         AND t.candle_length = s.candle_length AND t.ts = s.ts"""
    spark.sql(s"""MERGE INTO vm.m.half t USING src_half s $on
         WHEN MATCHED THEN UPDATE SET *""")
    assert(opens(st.scan()) == Map(("BTC", ts("2022-01-01 10:00:00")) -> 9.0),
      "update-only merge must not insert the unmatched ETH row")
    spark.sql(s"""MERGE INTO vm.m.half t USING src_half s $on
         WHEN NOT MATCHED THEN INSERT *""")
    assert(opens(st.scan()) == Map(
      ("BTC", ts("2022-01-01 10:00:00")) -> 9.0, // NOT re-updated to src's 9 twice
      ("ETH", ts("2022-01-01 10:00:00")) -> 7.0))
    assert(st.txLog().where($"kind" === "commit").count() == 3)
  }

  test("explicit column assignments lower too, with casts to the table " +
      "schema; expressions over the source allowed") {
    val st = VersionedCandleStore(spark, s"$base/m/expr")
    st.commit(Seq(c("BTC", "2022-01-01 10:00:00", 1)).toDF())
    Seq(c("BTC", "2022-01-01 10:00:00", 3)).toDF()
      .withColumn("year", org.apache.spark.sql.functions.year($"ts"))
      .createOrReplaceTempView("src_expr")
    spark.sql(
      """MERGE INTO vm.m.expr t USING src_expr s
         ON t.market = s.market AND t.code = s.code
            AND t.candle_length = s.candle_length AND t.ts = s.ts
         WHEN MATCHED THEN UPDATE SET
           market = s.market, code = s.code, candle_length = s.candle_length,
           ts = s.ts, year = s.year, open = s.open * 10, high = s.high, low = s.low,
           close = s.close, volume = s.volume + 1, bit_fields = s.bit_fields""")
    val row = st.scan().select("open", "volume").head()
    assert(row.getDouble(0) == 30.0 && row.getDouble(1) == 11.0)
  }

  test("the split-path latest-key set bypasses the winner fold: the gated " +
      "raw key scan plans NO fold aggregate/window yet yields scan()'s keys") {
    val st = VersionedCandleStore(spark, s"$base/m/keys")
    st.commit(Seq(c("BTC", "2022-01-01 10:00:00", 1),
      c("ETH", "2022-01-01 10:00:00", 2)).toDF())
    st.commit(Seq(c("BTC", "2022-01-01 10:00:00", 9)).toDF()) // overlap
    val raw = st.keyRowsAsOf(Long.MaxValue)
    val plan = raw.queryExecution.optimizedPlan.toString
    assert(!plan.contains("max_by") && !plan.toLowerCase.contains("window"),
      s"raw key scan pays a fold:\n$plan")
    assert(raw.count() == 3, "raw scan must see PRE-fold rows (2+1)")
    assert(raw.select("market", "code", "candle_length", "ts").distinct()
      .count() == st.scan().count(),
      "distinct raw keys must equal the folded table's key set")
  }

  test("MERGE INTO a PLAIN candle-catalog table lowers to the atomic " +
      "upsert: SET*/INSERT* equals the Scala upsert; half-merges split " +
      "matched/unmatched; refusals and history semantics match") {
    spark.conf.set("spark.sql.catalog.cm", classOf[graft.sources.CandleCatalog].getName)
    spark.conf.set("spark.sql.catalog.cm.base", base)
    val cs = graft.store.CandleStore(spark, s"$base/pc")
    cs.upsert(Seq(c("BTC", "2022-01-01 10:00:00", 1),
      c("BTC", "2022-01-01 10:01:00", 2)).toDF())
    Seq(c("BTC", "2022-01-01 10:01:00", 20), // update
      c("ETH", "2021-06-01 00:00:00", 5))    // insert
      .toDF().withColumn("year", org.apache.spark.sql.functions.year($"ts"))
      .createOrReplaceTempView("src_pc")
    val on =
      """ON t.market = s.market AND t.code = s.code
         AND t.candle_length = s.candle_length AND t.ts = s.ts"""
    spark.sql(s"""MERGE INTO cm.pc t USING src_pc s $on
         WHEN MATCHED THEN UPDATE SET *
         WHEN NOT MATCHED THEN INSERT *""")
    assert(opens(cs.scan()) == Map(
      ("BTC", ts("2022-01-01 10:00:00")) -> 1.0,
      ("BTC", ts("2022-01-01 10:01:00")) -> 20.0,
      ("ETH", ts("2021-06-01 00:00:00")) -> 5.0))
    // half-merges: update-only touches matched keys, insert-only adds new
    Seq(c("BTC", "2022-01-01 10:00:00", 7), c("SOL", "2022-02-01 00:00:00", 3))
      .toDF().withColumn("year", org.apache.spark.sql.functions.year($"ts"))
      .createOrReplaceTempView("src_pc2")
    spark.sql(s"""MERGE INTO cm.pc t USING src_pc2 s $on
         WHEN MATCHED THEN UPDATE SET *""")
    assert(opens(cs.scan())(("BTC", ts("2022-01-01 10:00:00"))) == 7.0)
    assert(!opens(cs.scan()).contains(("SOL", ts("2022-02-01 00:00:00"))),
      "update-only merge must not insert the unmatched SOL row")
    spark.sql(s"""MERGE INTO cm.pc t USING src_pc2 s $on
         WHEN NOT MATCHED THEN INSERT *""")
    assert(opens(cs.scan())(("SOL", ts("2022-02-01 00:00:00"))) == 3.0)
    // refusals mirror the vstore lowering
    def refusedC(sql: String, needle: String): Unit = {
      val e = intercept[AnalysisException](spark.sql(sql))
      assert(e.getMessage.contains(needle), e.getMessage)
    }
    refusedC(s"MERGE INTO cm.pc t USING src_pc2 s $on " +
      "WHEN MATCHED THEN DELETE", "DELETE is not supported")
    refusedC(s"MERGE INTO cm.pc t USING src_pc2 s $on " +
      "WHEN MATCHED THEN UPDATE SET open = s.open", "every table column")
    refusedC("MERGE INTO cm.pc t USING src_pc2 s ON t.code = s.code " +
      "WHEN MATCHED THEN UPDATE SET *", "exactly the fold key")
    // a lying year is refused through the same INSERT contract
    Seq(c("ADA", "2022-01-01 10:00:00", 1)).toDF()
      .withColumn("year", org.apache.spark.sql.functions.lit(1999))
      .createOrReplaceTempView("src_pc_bad")
    intercept[Exception](spark.sql(s"""MERGE INTO cm.pc t USING src_pc_bad s
         $on WHEN NOT MATCHED THEN INSERT *"""))
  }

  test("half-merge into a FRESHLY CREATED empty candle table: the target " +
      "key set is empty (no schema-inference crash), every row inserts") {
    spark.conf.set("spark.sql.catalog.cme", classOf[graft.sources.CandleCatalog].getName)
    spark.conf.set("spark.sql.catalog.cme.base", base)
    spark.sql("CREATE TABLE cme.fresh")
    Seq(c("BTC", "2022-01-01 10:00:00", 4)).toDF()
      .withColumn("year", org.apache.spark.sql.functions.year($"ts"))
      .createOrReplaceTempView("src_fresh")
    spark.sql(
      """MERGE INTO cme.fresh t USING src_fresh s
         ON t.market = s.market AND t.code = s.code
            AND t.candle_length = s.candle_length AND t.ts = s.ts
         WHEN NOT MATCHED THEN INSERT *""")
    val cs = graft.store.CandleStore(spark, s"$base/fresh")
    assert(opens(cs.scan()) == Map(("BTC", ts("2022-01-01 10:00:00")) -> 4.0))
    // update-only against the now one-row store: unmatched rows ignored
    spark.sql(
      """MERGE INTO cme.fresh t USING src_fresh s
         ON t.market = s.market AND t.code = s.code
            AND t.candle_length = s.candle_length AND t.ts = s.ts
         WHEN MATCHED THEN UPDATE SET *""")
    assert(cs.scan().count() == 1)
  }

  test("strict source-cardinality mode refuses duplicate fold keys in the " +
      "source (the documented ANSI divergence); default last-wins dedups") {
    val st = VersionedCandleStore(spark, s"$base/m/card")
    st.commit(Seq(c("BTC", "2022-01-01 10:00:00", 1)).toDF())
    // TWO source rows on one fold key
    Seq(c("BTC", "2022-01-01 10:00:00", 5), c("BTC", "2022-01-01 10:00:00", 6))
      .toDF().withColumn("year", org.apache.spark.sql.functions.year($"ts"))
      .createOrReplaceTempView("src_card")
    val m =
      """MERGE INTO vm.m.card t USING src_card s
         ON t.market = s.market AND t.code = s.code
            AND t.candle_length = s.candle_length AND t.ts = s.ts
         WHEN MATCHED THEN UPDATE SET *"""
    spark.conf.set("graft.sql.merge.strictSourceCardinality", "true")
    try {
      val e = intercept[AnalysisException](spark.sql(m))
      assert(e.getMessage.contains("cardinality"), e.getMessage)
      assert(opens(st.scan()) == Map(("BTC", ts("2022-01-01 10:00:00")) -> 1.0),
        "strict refusal must not have committed")
    } finally spark.conf.unset("graft.sql.merge.strictSourceCardinality")
    // default: deterministic last-wins dedup (documented divergence)
    spark.sql(m)
    assert(st.scan().count() == 1)
  }

  test("MERGE WHEN MATCHED THEN DELETE on a vstore target: matched keys " +
      "tombstoned in ONE journaled tx (with NOT MATCHED inserts in the " +
      "SAME tx), as-of before the delete intact, change feed flags") {
    val st = VersionedCandleStore(spark, s"$base/m/del")
    st.commit(Seq(c("BTC", "2022-01-01 10:00:00", 1),
      c("BTC", "2022-01-01 10:01:00", 2),
      c("ETH", "2021-06-01 00:00:00", 3)).toDF())
    val on =
      """ON t.market = s.market AND t.code = s.code
         AND t.candle_length = s.candle_length AND t.ts = s.ts"""
    // DELETE-only: drop one matched key; an unmatched source key is a
    // no-op (nothing inserted, nothing tombstoned for live reads)
    Seq(c("BTC", "2022-01-01 10:01:00", 99), // matched -> delete
      c("SOL", "2020-01-01 00:00:00", 7))    // unmatched -> ignored
      .toDF().withColumn("year", org.apache.spark.sql.functions.year($"ts"))
      .createOrReplaceTempView("src_del")
    spark.sql(s"MERGE INTO vm.m.del t USING src_del s $on " +
      "WHEN MATCHED THEN DELETE")
    assert(opens(st.scan()) == Map(
      ("BTC", ts("2022-01-01 10:00:00")) -> 1.0,
      ("ETH", ts("2021-06-01 00:00:00")) -> 3.0))
    assert(opens(spark.sql("SELECT * FROM vm.m.del")) == opens(st.scan()),
      "SQL scan of the tombstoned store diverges from the Scala scan")
    // ONE tx; as-of before the delete still shows the key
    assert(st.txLog().where($"kind" === "commit").count() == 2)
    assert(opens(st.scanAsOf(1L)).contains(("BTC", ts("2022-01-01 10:01:00"))))
    // DELETE + INSERT in one statement = one tx: matched keys
    // tombstoned, unmatched inserted (ANSI: a previously-deleted source
    // key counts as unmatched and RE-INSERTS)
    Seq(c("ETH", "2021-06-01 00:00:00", 88), // matched -> delete
      c("SOL", "2020-01-01 00:00:00", 7))    // unmatched -> insert
      .toDF().withColumn("year", org.apache.spark.sql.functions.year($"ts"))
      .createOrReplaceTempView("src_del2")
    spark.sql(s"MERGE INTO vm.m.del t USING src_del2 s $on " +
      "WHEN MATCHED THEN DELETE WHEN NOT MATCHED THEN INSERT *")
    assert(opens(st.scan()) == Map(
      ("BTC", ts("2022-01-01 10:00:00")) -> 1.0,
      ("SOL", ts("2020-01-01 00:00:00")) -> 7.0),
      "DELETE+INSERT merge: ETH tombstoned, SOL inserted")
    assert(st.txLog().where($"kind" === "commit").count() == 3,
      "DELETE+INSERT must be ONE journaled tx")
    // the change feed carries the tombstone flag; tombstone rows are
    // flagged, inserts are not
    val feed = st.changesSince(1L)
    assert(feed.columns.contains("_deleted"))
    val flags = feed.select("code", "ts", "tx_id", "_deleted").collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2)) -> r.getBoolean(3))
      .toMap
    assert(flags(("BTC", ts("2022-01-01 10:01:00"), 2L)),
      "deleted key's feed row must carry _deleted = true")
    assert(flags(("ETH", ts("2021-06-01 00:00:00"), 3L)))
    assert(!flags(("SOL", ts("2020-01-01 00:00:00"), 3L)))
    // re-committing a deleted key resurrects it (append-only history)
    st.commit(Seq(c("BTC", "2022-01-01 10:01:00", 42)).toDF())
    assert(opens(st.scan())(("BTC", ts("2022-01-01 10:01:00"))) == 42.0)
    // the DataSource change-feed lens exposes the flag too
    assert(spark.read.format("graft-vstore").option("changesSince", "1")
      .load(st.path).columns.contains("_deleted"))
  }

  test("conditioned MERGE WHEN MATCHED AND <cond> THEN DELETE: only " +
      "matched keys satisfying the source-decidable condition are " +
      "tombstoned; matched-but-unsatisfied keys untouched; composes " +
      "with NOT MATCHED INSERT in one tx; change feed exact") {
    val st = VersionedCandleStore(spark, s"$base/m/cdel")
    st.commit(Seq(c("BTC", "2022-01-01 10:00:00", 1),
      c("BTC", "2022-01-01 10:01:00", 2),
      c("ETH", "2021-06-01 00:00:00", 3)).toDF())
    val on =
      """ON t.market = s.market AND t.code = s.code
         AND t.candle_length = s.candle_length AND t.ts = s.ts"""
    // source matches BOTH BTC keys, but the condition admits only the
    // open > 50 row; the unmatched SOL row must stay ignored under a
    // DELETE-only merge even when it satisfies the condition
    Seq(c("BTC", "2022-01-01 10:00:00", 10), // matched, cond FALSE -> kept
      c("BTC", "2022-01-01 10:01:00", 99),   // matched, cond TRUE  -> delete
      c("SOL", "2020-01-01 00:00:00", 77))   // unmatched           -> ignored
      .toDF().withColumn("year", org.apache.spark.sql.functions.year($"ts"))
      .createOrReplaceTempView("src_cdel")
    spark.sql(s"MERGE INTO vm.m.cdel t USING src_cdel s $on " +
      "WHEN MATCHED AND s.open > 50 THEN DELETE")
    assert(opens(st.scan()) == Map(
      ("BTC", ts("2022-01-01 10:00:00")) -> 1.0,
      ("ETH", ts("2021-06-01 00:00:00")) -> 3.0),
      "conditioned delete must drop exactly the satisfying matched key")
    // ONE tx; as-of before it intact
    assert(st.txLog().where($"kind" === "commit").count() == 2)
    assert(opens(st.scanAsOf(1L)).contains(("BTC", ts("2022-01-01 10:01:00"))))
    // conditioned DELETE + INSERT in one statement: the condition gates
    // only the tombstone half — unmatched rows insert regardless of it
    Seq(c("ETH", "2021-06-01 00:00:00", 60), // matched, cond TRUE -> delete
      c("SOL", "2020-01-01 00:00:00", 7))    // unmatched, cond FALSE -> insert
      .toDF().withColumn("year", org.apache.spark.sql.functions.year($"ts"))
      .createOrReplaceTempView("src_cdel2")
    spark.sql(s"MERGE INTO vm.m.cdel t USING src_cdel2 s $on " +
      "WHEN MATCHED AND s.open > 50 THEN DELETE " +
      "WHEN NOT MATCHED THEN INSERT *")
    assert(opens(st.scan()) == Map(
      ("BTC", ts("2022-01-01 10:00:00")) -> 1.0,
      ("SOL", ts("2020-01-01 00:00:00")) -> 7.0),
      "conditioned DELETE+INSERT: ETH tombstoned, SOL inserted")
    assert(st.txLog().where($"kind" === "commit").count() == 3,
      "conditioned DELETE+INSERT must be ONE journaled tx")
    // feed: exactly the two satisfying keys flagged across both txs
    val flagged = st.changesSince(1L).where($"_deleted")
      .select("code").collect().map(_.getString(0)).toSeq.sorted
    assert(flagged == Seq("BTC", "ETH"), flagged.toString)
  }

  test("MERGE WHEN NOT MATCHED BY SOURCE THEN DELETE: the sync-to-source " +
      "merge — absent target keys tombstoned in the SAME tx as updates " +
      "and inserts; end state == source; history + feed exact") {
    val st = VersionedCandleStore(spark, s"$base/m/sync")
    st.commit(Seq(c("BTC", "2022-01-01 10:00:00", 1), // absent from src -> delete
      c("BTC", "2022-01-01 11:00:00", 2),             // absent from src -> delete
      c("ETH", "2021-06-01 00:00:00", 3)).toDF())     // matched -> update
    val on =
      """ON t.market = s.market AND t.code = s.code
         AND t.candle_length = s.candle_length AND t.ts = s.ts"""
    Seq(c("ETH", "2021-06-01 00:00:00", 30), // matched   -> SET *
      c("SOL", "2020-01-01 00:00:00", 7))    // unmatched -> INSERT *
      .toDF().withColumn("year", org.apache.spark.sql.functions.year($"ts"))
      .createOrReplaceTempView("src_sync")
    spark.sql(s"MERGE INTO vm.m.sync t USING src_sync s $on " +
      "WHEN MATCHED THEN UPDATE SET * " +
      "WHEN NOT MATCHED THEN INSERT * " +
      "WHEN NOT MATCHED BY SOURCE THEN DELETE")
    assert(opens(st.scan()) == Map(
      ("ETH", ts("2021-06-01 00:00:00")) -> 30.0,
      ("SOL", ts("2020-01-01 00:00:00")) -> 7.0),
      "full sync merge must leave the target equal to the source")
    // ONE journaled tx for all three arms; pre-sync history intact
    assert(st.txLog().where($"kind" === "commit").count() == 2)
    assert(opens(st.scanAsOf(1L)) == Map(
      ("BTC", ts("2022-01-01 10:00:00")) -> 1.0,
      ("BTC", ts("2022-01-01 11:00:00")) -> 2.0,
      ("ETH", ts("2021-06-01 00:00:00")) -> 3.0))
    // feed: exactly the two absent keys flagged, the upserts not
    val feed = st.changesSince(1L)
      .select("code", "ts", "_deleted").collect()
      .map(r => (r.getString(0), r.getTimestamp(1)) -> r.getBoolean(2)).toMap
    assert(feed(("BTC", ts("2022-01-01 10:00:00"))) &&
      feed(("BTC", ts("2022-01-01 11:00:00"))))
    assert(!feed(("ETH", ts("2021-06-01 00:00:00"))) &&
      !feed(("SOL", ts("2020-01-01 00:00:00"))))
  }

  test("conditioned WHEN NOT MATCHED BY SOURCE AND <fold-key cond> THEN " +
      "DELETE: a retention gate over the key set — absent keys failing " +
      "the condition survive; works as the ONLY clause") {
    val st = VersionedCandleStore(spark, s"$base/m/sync2")
    st.commit(Seq(c("BTC", "2022-01-01 10:00:00", 1), // absent, hour 10 even -> kept
      c("BTC", "2022-01-01 11:00:00", 2),             // absent, hour 11 odd  -> delete
      c("ETH", "2021-06-01 00:00:00", 3)).toDF())     // matched (no matched clause) -> kept
    val on =
      """ON t.market = s.market AND t.code = s.code
         AND t.candle_length = s.candle_length AND t.ts = s.ts"""
    Seq(c("ETH", "2021-06-01 00:00:00", 99), // matches ETH only
      c("SOL", "2020-01-01 00:00:00", 7))    // unmatched (no insert clause) -> ignored
      .toDF().withColumn("year", org.apache.spark.sql.functions.year($"ts"))
      .createOrReplaceTempView("src_sync2")
    spark.sql(s"MERGE INTO vm.m.sync2 t USING src_sync2 s $on " +
      "WHEN NOT MATCHED BY SOURCE AND hour(t.ts) % 2 = 1 THEN DELETE")
    assert(opens(st.scan()) == Map(
      ("BTC", ts("2022-01-01 10:00:00")) -> 1.0,
      ("ETH", ts("2021-06-01 00:00:00")) -> 3.0),
      "only the absent key satisfying the retention condition may go")
    assert(st.txLog().where($"kind" === "commit").count() == 2,
      "a pure by-source delete is still one journaled tx")
  }

  test("WHEN NOT MATCHED BY SOURCE THEN UPDATE: source-absent rows " +
      "rewritten from their own content (PARTIAL SET, content-column " +
      "condition) in the SAME tx as the other arms; history + feed exact") {
    val st = VersionedCandleStore(spark, s"$base/m/bsu")
    st.commit(Seq(c("BTC", "2022-01-01 10:00:00", 1), // absent, open 1 -> cond fails, kept
      c("BTC", "2022-01-01 11:00:00", 2),             // absent, open 2 -> zeroed volume
      c("ETH", "2021-06-01 00:00:00", 3)).toDF())     // matched -> SET *
    val on =
      """ON t.market = s.market AND t.code = s.code
         AND t.candle_length = s.candle_length AND t.ts = s.ts"""
    Seq(c("ETH", "2021-06-01 00:00:00", 30),
      c("SOL", "2020-01-01 00:00:00", 7))
      .toDF().withColumn("year", org.apache.spark.sql.functions.year($"ts"))
      .createOrReplaceTempView("src_bsu")
    spark.sql(s"MERGE INTO vm.m.bsu t USING src_bsu s $on " +
      "WHEN MATCHED THEN UPDATE SET * " +
      "WHEN NOT MATCHED THEN INSERT * " +
      "WHEN NOT MATCHED BY SOURCE AND t.open > 1 " +
      "THEN UPDATE SET volume = 0, close = t.close * 10")
    val rows = st.scan()
      .select("code", "ts", "open", "close", "volume").collect()
      .map(r => (r.getString(0), r.getTimestamp(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(rows == Map(
      ("BTC", ts("2022-01-01 10:00:00")) -> ((1.0, 1.5, 10.0)),  // untouched
      ("BTC", ts("2022-01-01 11:00:00")) -> ((2.0, 25.0, 0.0)),  // partial SET
      ("ETH", ts("2021-06-01 00:00:00")) -> ((30.0, 30.5, 10.0)),
      ("SOL", ts("2020-01-01 00:00:00")) -> ((7.0, 7.5, 10.0))), rows.toString)
    // ONE journaled tx for all three arms; pre-merge history intact;
    // NOTHING tombstoned (updates, not deletes) so the feed stays flagless
    assert(st.txLog().where($"kind" === "commit").count() == 2)
    assert(opens(st.scanAsOf(1L))(("BTC", ts("2022-01-01 11:00:00"))) == 2.0)
    assert(!st.changesSince(1L).columns.contains("_deleted"),
      "a by-source UPDATE must not widen the feed schema")
    // the arm works as the ONLY clause too
    spark.sql(s"MERGE INTO vm.m.bsu t USING src_bsu s $on " +
      "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET bit_fields = 9")
    val bf = st.scan().select("code", "bit_fields").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bf == Map("BTC" -> 9L, "ETH" -> 0L, "SOL" -> 0L), bf.toString)
  }

  test("WHEN NOT MATCHED BY SOURCE THEN UPDATE on a PLAIN candle table: " +
      "the rewrite rides the crash-atomic upsert (no tombstones), " +
      "composed with SET * in one statement") {
    spark.conf.set("spark.sql.catalog.cmbs",
      classOf[graft.sources.CandleCatalog].getName)
    spark.conf.set("spark.sql.catalog.cmbs.base", base)
    val cs = graft.store.CandleStore(spark, s"$base/plain_bsu")
    cs.upsert(Seq(c("BTC", "2022-01-01 10:00:00", 1), // absent -> rewritten
      c("ETH", "2021-06-01 00:00:00", 3)).toDF())     // matched -> SET *
    Seq(c("ETH", "2021-06-01 00:00:00", 30))
      .toDF().withColumn("year", org.apache.spark.sql.functions.year($"ts"))
      .createOrReplaceTempView("src_cbsu")
    val on =
      """ON t.market = s.market AND t.code = s.code
         AND t.candle_length = s.candle_length AND t.ts = s.ts"""
    spark.sql(s"MERGE INTO cmbs.plain_bsu t USING src_cbsu s $on " +
      "WHEN MATCHED THEN UPDATE SET * " +
      "WHEN NOT MATCHED BY SOURCE AND t.open < 2 " +
      "THEN UPDATE SET volume = t.volume + 5")
    val rows = cs.scan().select("code", "open", "volume").collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(rows == Map("BTC" -> ((1.0, 15.0)), "ETH" -> ((30.0, 10.0))),
      rows.toString)
  }

  test("refusals are loud: candle DELETE, target-referencing DELETE " +
      "condition, partial SET, non-key ON, target-column values, " +
      "time-travel target; INSERT OVERWRITE still refused") {
    val st = VersionedCandleStore(spark, s"$base/m/no")
    st.commit(Seq(c("BTC", "2022-01-01 10:00:00", 1)).toDF())
    Seq(c("BTC", "2022-01-01 10:00:00", 2)).toDF()
      .withColumn("year", org.apache.spark.sql.functions.year($"ts"))
      .createOrReplaceTempView("src_no")
    val on =
      """ON t.market = s.market AND t.code = s.code
         AND t.candle_length = s.candle_length AND t.ts = s.ts"""
    def refused(sql: String, needle: String): Unit = {
      val e = intercept[AnalysisException](spark.sql(sql))
      assert(e.getMessage.contains(needle), s"got: ${e.getMessage}")
    }
    // candle targets keep refusing DELETE (mora is insert-only)
    spark.conf.set("spark.sql.catalog.cmno",
      classOf[graft.sources.CandleCatalog].getName)
    spark.conf.set("spark.sql.catalog.cmno.base", base)
    graft.store.CandleStore(spark, s"$base/plain_no")
      .upsert(Seq(c("BTC", "2022-01-01 10:00:00", 1)).toDF())
    refused(s"MERGE INTO cmno.plain_no t USING src_no s $on " +
      "WHEN MATCHED THEN DELETE",
      "not supported on graft-candles")
    // conditioned DELETE is supported on the vstore — but only with a
    // SOURCE-decidable condition: target references are refused loudly
    // (the keyed lowering never scans target content)
    refused(s"MERGE INTO vm.m.no t USING src_no s $on " +
      "WHEN MATCHED AND t.open > 1 THEN DELETE",
      "source columns only")
    // candle targets refuse the conditioned form too
    refused(s"MERGE INTO cmno.plain_no t USING src_no s $on " +
      "WHEN MATCHED AND s.open > 1 THEN DELETE",
      "not supported on graft-candles")
    // NOT MATCHED BY SOURCE: DELETE conditions may read fold-key
    // columns ONLY (the lowering scans the key set, never content)
    refused(s"MERGE INTO vm.m.no t USING src_no s $on " +
      "WHEN NOT MATCHED BY SOURCE AND t.open > 1 THEN DELETE",
      "content columns")
    // … BY SOURCE UPDATE may not move fold keys (no source expression
    // exists to move one to) and must stay deterministic (the strict
    // cardinality probe and the commit execute the plan twice)
    refused(s"MERGE INTO vm.m.no t USING src_no s $on " +
      "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET ts = t.ts",
      "may not assign fold-key")
    refused(s"MERGE INTO vm.m.no t USING src_no s $on " +
      "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET volume = rand()",
      "must be deterministic")
    refused(s"MERGE INTO vm.m.no t USING src_no s $on " +
      "WHEN NOT MATCHED BY SOURCE AND rand() > 0.5 THEN UPDATE SET volume = 0",
      "must be deterministic")
    // … and candle targets refuse the BY SOURCE DELETE arm (no
    // tombstones; the UPDATE arm works on both shapes — tested below)
    refused(s"MERGE INTO cmno.plain_no t USING src_no s $on " +
      "WHEN NOT MATCHED BY SOURCE THEN DELETE",
      "not supported on graft-candles")
    // UPDATE and DELETE together: two matched clauses, refused (the
    // first conditioned to get past Spark's own last-clause parse rule)
    refused(s"MERGE INTO vm.m.no t USING src_no s $on " +
      "WHEN MATCHED AND s.open > 0 THEN UPDATE SET * " +
      "WHEN MATCHED THEN DELETE",
      "one WHEN MATCHED clause")
    refused(s"MERGE INTO vm.m.no t USING src_no s $on " +
      "WHEN MATCHED THEN UPDATE SET open = s.open",
      "every table column")
    refused("MERGE INTO vm.m.no t USING src_no s ON t.code = s.code " +
      "WHEN MATCHED THEN UPDATE SET *",
      "fold key")
    refused(s"MERGE INTO vm.m.no t USING src_no s $on " +
      "WHEN MATCHED THEN UPDATE SET market = s.market, code = s.code, " +
      "candle_length = s.candle_length, ts = s.ts, year = s.year, open = t.open + s.open, " +
      "high = s.high, low = s.low, close = s.close, volume = s.volume, " +
      "bit_fields = s.bit_fields",
      "source-only")
    // a time-travel MERGE target doesn't even parse (the rule's
    // read-only-lens guard is defense in depth behind this)
    intercept[Exception](spark.sql(
      s"MERGE INTO vm.m.no VERSION AS OF 1 t USING src_no s $on " +
        "WHEN MATCHED THEN UPDATE SET *"))
    // fold-key REWRITE: true MERGE would replace the matched row at the
    // new key; a keyed upsert can't — refuse, never silently keep both
    refused(s"MERGE INTO vm.m.no t USING src_no s $on " +
      "WHEN MATCHED THEN UPDATE SET market = s.market, code = s.code, " +
      "candle_length = s.candle_length, ts = s.ts + INTERVAL '1' MINUTE, " +
      "year = s.year, open = s.open, high = s.high, low = s.low, " +
      "close = s.close, volume = s.volume, bit_fields = s.bit_fields",
      "rewrites fold-key")
    // the same divergence through the ON side: SET * keys must equal
    // the ON expressions, so a shifted ON is refused too
    refused("MERGE INTO vm.m.no t USING src_no s " +
      "ON t.market = s.market AND t.code = s.code " +
      "AND t.candle_length = s.candle_length " +
      "AND t.ts = s.ts + INTERVAL '1' MINUTE " +
      "WHEN MATCHED THEN UPDATE SET *",
      "rewrites fold-key")
    // a key constrained twice would weaken the lowered match condition
    refused(s"MERGE INTO vm.m.no t USING src_no s $on AND t.ts = s.ts " +
      "WHEN MATCHED THEN UPDATE SET *",
      "more than once")
    // the append-only INSERT surface is unchanged: OVERWRITE refused
    intercept[Exception](spark.sql(
      "INSERT OVERWRITE vm.m.no SELECT * FROM src_no"))
    assert(opens(st.scan()) == Map(("BTC", ts("2022-01-01 10:00:00")) -> 1.0),
      "a refused merge must not have committed anything")
    assert(st.txLog().where($"kind" === "commit").count() == 1)
  }
}
