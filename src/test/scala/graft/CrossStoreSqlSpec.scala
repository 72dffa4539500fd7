package graft

import graft.model.Candle
import graft.store.{CandleStore, CrossStoreTx, VersionedCandleStore}
import graft.store.CrossStoreTx.{CandleUpsert, VersionedCommit}

/** The SQL face of the cross-store transaction (SURVEY.md §2: the
  * qAB/qAG argument applied to the last Scala-only write-path
  * component): a SQL-only operator must be able to commit ONE atomic
  * tx spanning a candle store and a versioned store —
  * `CALL <cat>.system.cross_store_write` — and roll a crashed one
  * forward with `CALL cross_store_recover`, with CrossStoreTxSpec's
  * crash matrix holding through the catalogs: pre-marker crash reads
  * on NEITHER, post-marker on BOTH after recovery.
  */
class CrossStoreSqlSpec extends SparkSpec {
  import spark.implicits._

  private def c(code: String, t: String, o: Double): Candle =
    Candle("UPBIT", code, 60, ts(t), o, o + 1, o - 1, o + 0.5, 10.0, 0L)

  // one candle catalog + one vstore catalog per suite
  private lazy val bases: (String, String) = {
    val b = tmpDir("xsql")
    spark.conf.set("spark.sql.catalog.xc", classOf[graft.sources.CandleCatalog].getName)
    spark.conf.set("spark.sql.catalog.xc.base", s"$b/c")
    spark.conf.set("spark.sql.catalog.xv", classOf[graft.sources.VStoreCatalog].getName)
    spark.conf.set("spark.sql.catalog.xv.base", s"$b/v")
    (s"$b/c", s"$b/v")
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  test("cross_store_write commits atomically on both stores through SQL " +
      "only; a re-CALL of the same name (either catalog spelling) " +
      "returns the recorded tokens without re-executing") {
    val (_, vBase) = bases
    spark.sql("CREATE TABLE xc.btc")
    spark.sql("CREATE TABLE xv.btc_v")
    Seq(c("BTC", "2022-01-01 10:00:00", 1),
      c("BTC", "2022-01-01 10:01:00", 2)).toDF()
      .createOrReplaceTempView("xsql_src_c")
    Seq(c("ETH", "2022-03-01 00:00:00", 5),
      c("SOL", "2022-03-01 00:00:00", 7)).toDF()
      .createOrReplaceTempView("xsql_src_v")
    val coord = tmpDir("xsql-txs")
    val first = spark.sql(
      s"""CALL xc.system.cross_store_write(
         |  name          => 'sql-b0',
         |  coord_dir     => '$coord',
         |  candle_table  => 'xc.btc',
         |  candle_source => 'xsql_src_c',
         |  vstore_table  => 'xv.btc_v',
         |  vstore_source => 'SELECT * FROM xsql_src_v')""".stripMargin)
      .collect().head
    assert(first.getString(0) == "sql-b0")
    assert(first.getLong(2) == 1L, "the vstore half is journaled tx 1")
    // both halves visible through their catalogs, SQL-only reads
    assert(rows(spark.sql("SELECT code, open FROM xc.btc")) ==
      Set("BTC|1.0", "BTC|2.0"))
    assert(rows(spark.sql("SELECT code, open FROM xv.btc_v")) ==
      Set("ETH|5.0", "SOL|7.0"))
    // exactly-once per name: the re-CALL (through the OTHER catalog's
    // spelling — the set rides both) returns the recorded tokens
    val again = spark.sql(
      s"""CALL xv.system.cross_store_write('sql-b0', '$coord',
         |  'xc.btc', 'xsql_src_c', 'xv.btc_v', 'xsql_src_v')""".stripMargin)
      .collect().head
    assert(again.getString(1) == first.getString(1) &&
      again.getLong(2) == first.getLong(2), "recorded tokens, no re-run")
    assert(VersionedCandleStore(spark, s"$vBase/btc_v")
      .txLog().where($"kind" === "commit").count() == 1,
      "the vstore journal must hold ONE commit — the re-CALL ran nothing")
    // the replay contract survives the SOURCES disappearing: a re-CALL
    // of a committed name must return the recorded tokens WITHOUT
    // resolving the (no-longer-needed) source views
    spark.catalog.dropTempView("xsql_src_c")
    spark.catalog.dropTempView("xsql_src_v")
    val afterDrop = spark.sql(
      s"""CALL xc.system.cross_store_write('sql-b0', '$coord',
         |  'xc.btc', 'xsql_src_c', 'xv.btc_v', 'xsql_src_v')""".stripMargin)
      .collect().head
    assert(afterDrop.getString(1) == first.getString(1) &&
      afterDrop.getLong(2) == first.getLong(2),
      "recorded tokens even after the source views were dropped")
  }

  test("crash matrix through SQL: a marker-published crash reads on " +
      "NEITHER catalog until CALL cross_store_recover rolls it onto " +
      "BOTH; a pre-marker crash stays invisible forever") {
    val (cBase, vBase) = bases
    spark.sql("CREATE TABLE xc.eth")
    spark.sql("CREATE TABLE xv.eth_v")
    spark.sql("CREATE TABLE xc.ada")
    spark.sql("CREATE TABLE xv.ada_v")
    val coord = tmpDir("xsql-txs-crash")
    val cs = CandleStore(spark, s"$cBase/eth")
    val vs = VersionedCandleStore(spark, s"$vBase/eth_v")
    def crashed(body: => Unit): Unit =
      try { body; sys.error("expected simulated crash") }
      catch { case _: CrossStoreTx.SimulatedCrash => () }
    // pre-marker crash first, on its OWN table pair: prepared only —
    // never visible, and its still-held candle cross-tx lock must not
    // block the other pair. (Order matters too: a LATER
    // executeInternal's entry recover() would roll an earlier published
    // marker forward before the asserts could look.)
    crashed(CrossStoreTx.executeInternal(spark, coord, "xs-torn",
      Seq(CandleUpsert(CandleStore(spark, s"$cBase/ada"),
          Seq(c("ADA", "2022-01-01 10:00:00", 9)).toDF()),
        VersionedCommit(VersionedCandleStore(spark, s"$vBase/ada_v"),
          Seq(c("ADA", "2022-03-01 00:00:00", 9)).toDF())),
      crashAfter = 1))
    // post-marker crash: committed, nothing finalized
    crashed(CrossStoreTx.executeInternal(spark, coord, "xs-commit",
      Seq(CandleUpsert(cs, Seq(c("ETH", "2022-01-01 10:00:00", 1)).toDF()),
        VersionedCommit(vs, Seq(c("ETH", "2022-03-01 00:00:00", 5)).toDF())),
      crashAfter = 2))
    // before recovery: NEITHER catalog shows either tx (prepared and
    // committed-but-unfinalized state are both invisible)
    assert(rows(spark.sql("SELECT code FROM xv.eth_v")).isEmpty,
      "the unfinalized vstore half must be invisible")
    assert(rows(spark.sql("SELECT code FROM xc.eth")).isEmpty,
      "the unpublished candle half must be invisible")
    // SQL recovery rolls the committed tx forward on BOTH stores
    assert(spark.sql(
      s"CALL xv.system.cross_store_recover('$coord')")
      .collect().head.getInt(0) == 1, "exactly the one committed tx")
    assert(rows(spark.sql("SELECT code, open FROM xc.eth")) ==
      Set("ETH|1.0"), "post-marker tx on the candle side after recover")
    assert(rows(spark.sql("SELECT code, open FROM xv.eth_v")) ==
      Set("ETH|5.0"), "post-marker tx on the vstore side after recover")
    assert(rows(spark.sql("SELECT code FROM xc.ada")).isEmpty &&
      rows(spark.sql("SELECT code FROM xv.ada_v")).isEmpty,
      "the pre-marker tx must stay invisible on BOTH")
    // recovery is idempotent through SQL too
    assert(spark.sql(
      s"CALL xc.system.cross_store_recover('$coord')")
      .collect().head.getInt(0) == 0)
  }

  test("refusal matrix: unqualified names, unregistered catalogs, " +
      "wrong-kind catalogs, views, and missing tables all fail loudly " +
      "at the CALL — nothing half-commits") {
    bases // force catalog registration
    spark.sql("CREATE TABLE xc.sol")
    spark.sql("CREATE TABLE xv.sol_v")
    Seq(c("SOL", "2022-01-01 10:00:00", 1)).toDF()
      .createOrReplaceTempView("xsql_src_r")
    val coord = tmpDir("xsql-txs-refuse")
    def call(candleTable: String, vstoreTable: String) = spark.sql(
      s"""CALL xc.system.cross_store_write('r-0', '$coord',
         |  '$candleTable', 'xsql_src_r', '$vstoreTable', 'xsql_src_r')""".stripMargin)
      .collect()
    def refuses(msg: String)(body: => Unit): Unit = {
      val e = intercept[Exception](body)
      def all(t: Throwable): Seq[String] =
        if (t == null) Seq.empty else t.getMessage +: all(t.getCause)
      assert(all(e).exists(m => m != null && m.contains(msg)),
        s"expected '$msg', got: ${e.getMessage}")
    }
    refuses("must be catalog-qualified")(call("sol", "xv.sol_v"))
    refuses("not a registered catalog")(call("nosuchcat.sol", "xv.sol_v"))
    // wrong-kind: a vstore catalog on the candle slot and vice versa
    refuses("must name a table in a graft-candles catalog")(
      call("xv.sol_v", "xv.sol_v"))
    refuses("must name a table in a graft-vstore catalog")(
      call("xc.sol", "xc.sol"))
    // a VIEW on the vstore slot refuses through the catalog's own guard
    spark.sql("CALL xv.system.create_view('sol_view', 'sol_v', " +
      "'code', 'count(1) AS n')")
    refuses("is an incremental VIEW")(call("xc.sol", "xv.sol_view"))
    spark.sql("DROP TABLE xv.sol_view")
    // a missing table refuses with the catalog's own not-found error
    intercept[Exception](call("xc.nosuch", "xv.sol_v"))
    // nothing half-committed anywhere along the way
    assert(rows(spark.sql("SELECT code FROM xc.sol")).isEmpty)
    assert(rows(spark.sql("SELECT code FROM xv.sol_v")).isEmpty)
    // and a GOOD call still lands after all the refusals
    val ok = call("xc.sol", "xv.sol_v")
    assert(ok.head.getLong(2) == 1L)
    assert(rows(spark.sql("SELECT code FROM xc.sol")) == Set("SOL"))
  }
}
