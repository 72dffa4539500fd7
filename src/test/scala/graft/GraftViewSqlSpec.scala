package graft

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions.{col, count, lit, sum}

import graft.model.Candle
import graft.store.{IncrementalView, VersionedCandleStore}

/** The SQL face of incremental views (SURVEY.md §2: the round-17
  * maintenance argument one layer up): a SQL-only operator must be able
  * to CREATE, REFRESH, READ, and DROP a materialized view —
  * `CALL <cat>.system.{create_view, refresh_view, view_watermark}` plus
  * the catalog's readable view table — with the Scala refusal matrix
  * mirrored (IncrementalViewSpec's semantics ride underneath
  * unchanged).
  */
class GraftViewSqlSpec extends SparkSpec {
  import spark.implicits._

  private def c(code: String, t: String, o: Double): Candle =
    Candle("UPBIT", code, 60, ts(t), o, o + 1, o - 1, o + 0.5, 10.0, 0L)

  // one catalog per suite over one base tree
  private lazy val base: String = {
    val b = tmpDir("vview-catalog")
    spark.conf.set("spark.sql.catalog.vv", classOf[graft.sources.VStoreCatalog].getName)
    spark.conf.set("spark.sql.catalog.vv.base", b)
    b
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  test("SQL-only view lifecycle: create_view (validated, first refresh " +
      "included) -> SELECT; updates + tombstone DELETEs between " +
      "refresh_view calls maintain content-derived groups incrementally; " +
      "watermark observable; DROP TABLE removes it") {
    val st = VersionedCandleStore(spark, s"$base/markets/btc")
    st.commit(Seq(c("BTC", "2022-01-01 10:00:00", 1),
      c("BTC", "2022-01-02 11:00:00", 60),
      c("ETH", "2021-06-01 00:00:00", 5)).toDF())           // tx 1
    val created = spark.sql(
      """CALL vv.system.create_view(
        |  view       => 'markets.btc_daily',
        |  table      => 'markets.btc',
        |  group_by   => 'code, to_date(ts) AS day, CAST(open >= 50 AS INT) AS tier',
        |  aggregates => 'count(1) AS n, sum(volume) AS vol')""".stripMargin)
      .collect().head
    assert(created.getString(0) == s"$base/markets/btc_daily")
    assert(created.getLong(1) == 1L, "create_view runs the first refresh")
    def full() = rows(st.scan()
      .groupBy(col("code"), org.apache.spark.sql.functions.to_date(col("ts")).as("day"),
        (col("open") >= 50).cast("int").as("tier"))
      .agg(count(lit(1)).as("n"), sum(col("volume")).as("vol"))
      .select("code", "day", "tier", "n", "vol"))
    def viaSql() = rows(spark.sql(
      "SELECT code, day, tier, n, vol FROM vv.markets.btc_daily"))
    assert(viaSql() == full(), "readable immediately after create_view")
    // the view lists as a TABLE alongside the store
    val listed = spark.sql("SHOW TABLES IN vv.markets")
      .select("tableName").as[String].collect().toSet
    assert(listed == Set("btc", "btc_daily"), listed)
    // updates that move a key between tiers + a tombstone DELETE, both
    // through SQL, then a SQL refresh — the content-group (tier)
    // maintenance rides the pre-image feed underneath
    st.commit(Seq(c("BTC", "2022-01-01 10:00:00", 70),       // tier 0 -> 1
      c("SOL", "2023-03-01 00:00:00", 7)).toDF())            // tx 2
    spark.sql("DELETE FROM vv.markets.btc WHERE code = 'ETH'") // tx 3
    val w = spark.sql("CALL vv.system.refresh_view('markets.btc_daily')")
      .collect().head.getLong(0)
    assert(w == 3L, s"watermark after refresh, got $w")
    assert(viaSql() == full(), "incremental refresh == full recompute")
    assert(!viaSql().exists(_.startsWith("ETH")), "deleted group dropped")
    assert(spark.sql("CALL vv.system.view_watermark('markets.btc_daily')")
      .collect().head.getLong(0) == 3L)
    // filters push into the view's parquet scan (no fold in the way)
    val filtered = spark.sql(
      "SELECT code, n FROM vv.markets.btc_daily WHERE tier = 1")
    assert(rows(filtered) == full().filter(_.split('|')(2) == "1")
      .map(s => { val p = s.split('|'); s"${p(0)}|${p(3)}" }))
    // a view is read-only: INSERT INTO fails at analysis
    intercept[AnalysisException](spark.sql(
      "INSERT INTO vv.markets.btc_daily VALUES ('X', DATE'2022-01-01', 0, 1, 1.0)"))
    // no time travel on views (generations GC to one hop)
    val tt = intercept[AnalysisException](spark.sql(
      "SELECT * FROM vv.markets.btc_daily VERSION AS OF 1").collect())
    assert(tt.getMessage.contains("not supported on an incremental view"),
      tt.getMessage)
    // DROP TABLE removes the view, the store survives
    spark.sql("DROP TABLE vv.markets.btc_daily")
    assert(spark.sql("SHOW TABLES IN vv.markets")
      .select("tableName").as[String].collect().toSet == Set("btc"))
    assert(st.scan().count() > 0)
  }

  test("create_view validates eagerly and the refusal matrix mirrors the " +
      "Scala API: bad names, bad expressions, wrong-kind targets") {
    val st = VersionedCandleStore(spark, s"$base/markets/eth")
    st.commit(Seq(c("ETH", "2022-01-01 10:00:00", 1)).toDF())
    def call(args: String): Unit = {
      spark.sql(s"CALL vv.system.create_view($args)").collect(); ()
    }
    def refuse(args: String, needle: String): Unit = {
      val e = intercept[AnalysisException](call(args))
      assert(e.getMessage.contains(needle),
        s"expected '$needle' in: ${e.getMessage}")
    }
    // an existing STORE name refuses (and an existing foreign dir too)
    refuse("'markets.eth', 'markets.eth', 'code', 'count(1) AS n'",
      "already exists")
    val f = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(base), spark.sparkContext.hadoopConfiguration)
    // a NON-EMPTY foreign dir refuses (an empty one counts as free —
    // CREATE TABLE's own convention, and a crashed replace's leftover)
    f.mkdirs(new org.apache.hadoop.fs.Path(s"$base/markets/foreign"))
    f.create(new org.apache.hadoop.fs.Path(
      s"$base/markets/foreign/data.bin"), false).close()
    refuse("'markets.foreign', 'markets.eth', 'code', 'count(1) AS n'",
      "already exists")
    // unknown group column / non-aggregate aggregate / missing alias /
    // duplicate names — all at the CALL, nothing half-created
    refuse("'markets.v1', 'markets.eth', 'nope', 'count(1) AS n'",
      "nope")
    refuse("'markets.v1', 'markets.eth', 'code', 'volume AS v'",
      "v")
    refuse("'markets.v1', 'markets.eth', 'code', 'count(1)'",
      "explicit alias")
    refuse("'markets.v1', 'markets.eth', 'to_date(ts)', 'count(1) AS n'",
      "explicit alias")
    refuse("'markets.v1', 'markets.eth', 'code, volume AS code', 'count(1) AS n'",
      "duplicate")
    // the feed's discriminator column is a reserved output name: a view
    // aliasing it would have it silently clobbered by the change feed
    refuse("'markets.v1', 'markets.eth', 'code', " +
      "'count(1) AS _view_change_kind'", "reserved")
    assert(!f.exists(new org.apache.hadoop.fs.Path(s"$base/markets/v1")),
      "a refused create_view must leave nothing behind")
    // a view as create_view's TABLE arg refuses; store procs refuse views
    call("'markets.eth_v', 'markets.eth', 'code', 'count(1) AS n'")
    refuse("'markets.v2', 'markets.eth_v', 'code', 'count(1) AS n'",
      "VIEW, not a store")
    val e1 = intercept[AnalysisException](spark.sql(
      "CALL vv.system.compact('markets.eth_v')").collect())
    assert(e1.getMessage.contains("VIEW, not a store"), e1.getMessage)
    val e2 = intercept[AnalysisException](spark.sql(
      "CALL vv.system.refresh_view('markets.eth')").collect())
    assert(e2.getMessage.contains("STORE, not an incremental view"),
      e2.getMessage)
    spark.sql("DROP TABLE vv.markets.eth_v")
  }

  test("view maintenance through SQL: describe_view census; vacuum_view " +
      "sweeps torn generations, keeps the adopted pair, refuses under a " +
      "held refresh lock") {
    base
    val st = VersionedCandleStore(spark, s"$base/markets/ada")
    st.commit(Seq(c("ADA", "2022-01-01 10:00:00", 1)).toDF())
    spark.sql("CALL vv.system.create_view('markets.ada_v', 'markets.ada', " +
      "'code', 'count(1) AS n')")
    st.commit(Seq(c("ADA", "2022-01-01 11:00:00", 2)).toDF())
    spark.sql("CALL vv.system.refresh_view('markets.ada_v')")
    val viewDir = s"$base/markets/ada_v"
    // plant the torn generation a crash-interrupted refresh leaves
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(viewDir, "gen_99"))
    val d = spark.sql("CALL vv.system.describe_view('markets.ada_v')")
      .collect().head
    assert(d.getString(0) == "graft-view" && d.getString(1) == viewDir)
    assert(d.getString(2) == s"$base/markets/ada", "store pointer")
    assert(d.getLong(3) == 2L && d.getLong(4) == 0L, "watermark + rev")
    assert(d.getInt(5) == 3, s"gen census incl. the torn one, got ${d.getInt(5)}")
    // a held lock refuses the sweep (it would race the holder's GC)
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(viewDir, "_refresh.lock"))
    val e = intercept[Exception](spark.sql(
      "CALL vv.system.vacuum_view('markets.ada_v')").collect())
    assert(e.getMessage.contains("_refresh.lock"), e.getMessage)
    // a crashed refresh_view's lock clears through SQL too — without
    // break_view_lock a SQL-only operator would be permanently wedged
    // (break_stale_lock is a STORE procedure and refuses view targets)
    val blocked = intercept[Exception](spark.sql(
      "CALL vv.system.refresh_view('markets.ada_v')").collect())
    assert(blocked.getMessage.contains("_refresh.lock"), blocked.getMessage)
    assert(spark.sql("CALL vv.system.break_view_lock('markets.ada_v')")
      .collect().head.getBoolean(0))
    assert(spark.sql("CALL vv.system.refresh_view('markets.ada_v')")
      .collect().head.getLong(0) == 2L, "refresh recovers after the break")
    assert(spark.sql("CALL vv.system.vacuum_view('markets.ada_v')")
      .collect().head.getInt(0) == 1, "exactly the torn gen swept")
    val after = spark.sql("CALL vv.system.describe_view('markets.ada_v')")
      .collect().head
    assert(after.getInt(5) == 2, "adopted pair retained")
    // the census counts DATA files only — `_SUCCESS` markers and the
    // gap-run meta must not inflate it (one parquet part per tiny gen)
    val parts = Seq("gen_1", "gen_2").map { g =>
      new java.io.File(s"$viewDir/$g").listFiles()
        .count(f => f.isFile && !f.getName.startsWith("_") &&
          !f.getName.startsWith("."))
    }.sum
    assert(after.getLong(6) == parts.toLong,
      s"data-file census must match the parquet parts, got ${after.getLong(6)}")
    assert(rows(spark.sql("SELECT code, n FROM vv.markets.ada_v")) ==
      Set("ADA|2"), "the view still reads after the sweep")
    spark.sql("DROP TABLE vv.markets.ada_v")
    spark.sql("DROP TABLE vv.markets.ada")
  }

  test("create_view on an EMPTY store: watermark 0, read refuses loudly " +
      "until data arrives and refresh_view runs; quoted expression " +
      "round-trips through the persisted definition") {
    base // register the catalog before the first SQL touches it
    spark.sql("CREATE TABLE vv.markets.sol")
    val created = spark.sql(
      """CALL vv.system.create_view('markets.sol_m', 'markets.sol',
        |  'code, date_format(ts, ''yyyy-MM'') AS ym', 'count(1) AS n')"""
        .stripMargin).collect().head
    assert(created.getLong(1) == 0L, "empty store -> watermark 0")
    val e = intercept[Exception](
      spark.sql("SELECT * FROM vv.markets.sol_m").collect())
    assert(e.getMessage.contains("refresh"),
      s"pre-refresh read must point at refresh_view: ${e.getMessage}")
    spark.sql("INSERT INTO vv.markets.sol VALUES " +
      "('UPBIT','SOL',60,TIMESTAMP'2023-03-01 00:00:00',2023,1,2,0,1.5,10,0)," +
      "('UPBIT','SOL',60,TIMESTAMP'2023-04-02 00:00:00',2023,2,3,1,2.5,10,0)")
    assert(spark.sql("CALL vv.system.refresh_view('markets.sol_m')")
      .collect().head.getLong(0) == 1L)
    assert(rows(spark.sql("SELECT code, ym, n FROM vv.markets.sol_m")) ==
      Set("SOL|2023-03|1", "SOL|2023-04|1"),
      "the date_format('yyyy-MM') group must round-trip the definition")
    // the persisted definition survives a fresh open (new table object)
    val v = IncrementalView.open(spark, s"$base/markets/sol_m")
    assert(v.watermark() == 1L)
    spark.sql("DROP TABLE vv.markets.sol_m")
    spark.sql("DROP TABLE vv.markets.sol")
  }

  test("CREATE MATERIALIZED VIEW DDL rewrites to create_view: identical " +
      "_graft_view.json as the CALL form (group-by-alias and expression " +
      "forms both), readable immediately; unsupported shapes refuse " +
      "with the CALL-form pointer") {
    base
    val st = VersionedCandleStore(spark, s"$base/markets/dot")
    st.commit(Seq(c("DOT", "2022-01-01 10:00:00", 1),
      c("DOT", "2022-01-02 11:00:00", 60),
      c("KSM", "2021-06-01 00:00:00", 5)).toDF())
    // DDL form (GROUP BY references the select ALIAS — Spark's
    // group-by-alias shape) and the CALL twin of the same definition
    spark.sql(
      """CREATE MATERIALIZED VIEW vv.markets.dot_daily AS
        |SELECT code, to_date(ts) AS day, count(1) AS n,
        |  sum(volume) AS vol
        |FROM vv.markets.dot
        |GROUP BY code, day""".stripMargin)
    spark.sql(
      """CALL vv.system.create_view('markets.dot_daily2', 'markets.dot',
        |  'code, to_date(ts) AS day', 'count(1) AS n, sum(volume) AS vol')"""
        .stripMargin)
    def defJson(name: String): String = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
        s"$base/markets/$name", "_graft_view.json")), "UTF-8")
    // byte-identical apart from the store pointer (same here): the DDL
    // form IS the CALL form
    assert(defJson("dot_daily") == defJson("dot_daily2"),
      s"definitions diverged:\n${defJson("dot_daily")}\n${defJson("dot_daily2")}")
    assert(rows(spark.sql(
      "SELECT code, day, n, vol FROM vv.markets.dot_daily")) ==
      rows(spark.sql(
        "SELECT code, day, n, vol FROM vv.markets.dot_daily2")),
      "both forms read the same")
    // GROUP BY by expression TEXT (no alias reference) works too
    spark.sql(
      """CREATE MATERIALIZED VIEW vv.markets.dot_tier AS
        |SELECT code, CAST(open >= 50 AS INT) AS tier, count(1) AS n
        |FROM vv.markets.dot GROUP BY code, CAST(open >= 50 AS INT)"""
        .stripMargin)
    assert(rows(spark.sql(
      "SELECT code, tier, n FROM vv.markets.dot_tier")) ==
      Set("DOT|0|1", "DOT|1|1", "KSM|0|1"))
    // a string literal carrying BACKSLASHES survives the rewrite's
    // double embedding (outer CALL literal + persisted expression SQL):
    // the tier here is regexp-derived, so a lost escape level would
    // change every group
    spark.sql(
      """CREATE MATERIALIZED VIEW vv.markets.dot_rx AS
        |SELECT code, regexp_extract(code, '^\\w', 0) AS initial,
        |  count(1) AS n
        |FROM vv.markets.dot GROUP BY code, initial""".stripMargin)
    assert(rows(spark.sql(
      "SELECT code, initial, n FROM vv.markets.dot_rx")) ==
      Set("DOT|D|2", "KSM|K|1"),
      "the regex escape must survive the rewrite's literal embedding")
    // refusal matrix: each names the constraint and points at CALL
    def refuses(sql: String, needle: String): Unit = {
      val e = intercept[AnalysisException](spark.sql(sql))
      assert(e.getMessage.contains(needle), s"want '$needle': ${e.getMessage}")
    }
    // a SELECT alias SHADOWING a base column must not hijack GROUP BY:
    // Spark resolves `GROUP BY code` to the COLUMN, so the grouping
    // expression is absent from the SELECT list and the shape refuses
    // (silently grouping by upper(code) would diverge from the same
    // SELECT run directly)
    refuses("CREATE MATERIALIZED VIEW vv.markets.x AS SELECT " +
      "upper(code) AS code, count(1) AS n FROM vv.markets.dot GROUP BY code",
      "must appear in the SELECT list")
    // a FROM table in a DIFFERENT catalog refuses instead of being
    // silently reinterpreted as a namespace path inside the view's
    refuses("CREATE MATERIALIZED VIEW vv.markets.x AS SELECT code, " +
      "count(1) AS n FROM spark_catalog.default.t GROUP BY code",
      "must live in the view's catalog")
    refuses("CREATE MATERIALIZED VIEW unqualified AS SELECT code, " +
      "count(1) AS n FROM vv.markets.dot GROUP BY code",
      "catalog-qualified")
    refuses("CREATE MATERIALIZED VIEW vv.markets.x AS SELECT code, " +
      "count(1) AS n FROM vv.markets.dot WHERE code = 'DOT' GROUP BY code",
      "single table")
    refuses("CREATE MATERIALIZED VIEW vv.markets.x AS SELECT code, " +
      "count(1) FROM vv.markets.dot GROUP BY code",
      "explicit alias")
    refuses("CREATE MATERIALIZED VIEW vv.markets.x AS SELECT code, " +
      "count(1) AS n FROM vv.markets.dot GROUP BY 1",
      "ordinals")
    refuses("CREATE MATERIALIZED VIEW vv.markets.x AS SELECT count(1) " +
      "AS n FROM vv.markets.dot GROUP BY code",
      "must appear in the SELECT list")
    refuses("CREATE MATERIALIZED VIEW vv.markets.x AS " +
      "SELECT code FROM vv.markets.dot",
      "GROUP BY")
    // nothing half-created by any refusal
    assert(!new java.io.File(s"$base/markets/x").exists())
    spark.sql("DROP TABLE vv.markets.dot_daily")
    spark.sql("DROP TABLE vv.markets.dot_daily2")
    spark.sql("DROP TABLE vv.markets.dot_tier")
    spark.sql("DROP TABLE vv.markets.dot_rx")
    spark.sql("DROP TABLE vv.markets.dot")
  }

  test("CREATE MATERIALIZED VIEW modes: IF NOT EXISTS leaves an existing " +
      "view untouched, OR REPLACE swaps definition + generations; DROP " +
      "MATERIALIZED VIEW drops views only; refusal matrix") {
    base
    val st = VersionedCandleStore(spark, s"$base/markets/xrp")
    st.commit(Seq(c("XRP", "2022-01-01 10:00:00", 1),
      c("XRP", "2022-01-02 11:00:00", 60),
      c("LTC", "2021-06-01 00:00:00", 5)).toDF())             // tx 1
    spark.sql(
      """CREATE MATERIALIZED VIEW vv.markets.xrp_v AS
        |SELECT code, count(1) AS n FROM vv.markets.xrp
        |GROUP BY code""".stripMargin)
    def defJson(): String = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
        s"$base/markets/xrp_v", "_graft_view.json")), "UTF-8")
    val origDef = defJson()
    assert(rows(spark.sql("SELECT code, n FROM vv.markets.xrp_v")) ==
      Set("XRP|2", "LTC|1"))
    def refuses(sql: String, needle: String): Unit = {
      val e = intercept[AnalysisException](spark.sql(sql))
      assert(e.getMessage.contains(needle), s"want '$needle': ${e.getMessage}")
    }
    // plain CREATE still refuses an existing name
    refuses("CREATE MATERIALIZED VIEW vv.markets.xrp_v AS SELECT code, " +
      "count(1) AS n FROM vv.markets.xrp GROUP BY code", "already exists")
    // IF NOT EXISTS with a DIFFERENT definition: the existing one wins
    // (CREATE TABLE IF NOT EXISTS semantics), untouched on disk
    spark.sql(
      """CREATE MATERIALIZED VIEW IF NOT EXISTS vv.markets.xrp_v AS
        |SELECT code, sum(volume) AS vol FROM vv.markets.xrp
        |GROUP BY code""".stripMargin)
    assert(defJson() == origDef, "IF NOT EXISTS must not touch the definition")
    assert(rows(spark.sql("SELECT code, n FROM vv.markets.xrp_v")) ==
      Set("XRP|2", "LTC|1"), "view content untouched")
    // OR REPLACE: new definition, recomputed content, old generations
    // gone (they were computed under the old definition)
    st.commit(Seq(c("XRP", "2022-01-03 09:00:00", 7)).toDF()) // tx 2
    spark.sql(
      """CREATE OR REPLACE MATERIALIZED VIEW vv.markets.xrp_v AS
        |SELECT code, sum(volume) AS vol FROM vv.markets.xrp
        |GROUP BY code""".stripMargin)
    assert(defJson() != origDef, "OR REPLACE must swap the definition")
    assert(rows(spark.sql("SELECT code, vol FROM vv.markets.xrp_v")) ==
      Set("XRP|30.0", "LTC|10.0"), "replacement reflects the full store")
    assert(spark.sql("CALL vv.system.view_watermark('markets.xrp_v')")
      .collect().head.getLong(0) == 2L, "replacement re-refreshed to head")
    // the two modifiers cannot combine (Spark's own CREATE TABLE rule)
    refuses("CREATE OR REPLACE MATERIALIZED VIEW IF NOT EXISTS " +
      "vv.markets.xrp_v AS SELECT code, count(1) AS n FROM vv.markets.xrp " +
      "GROUP BY code", "cannot be combined")
    // neither relaxed mode may clobber a STORE at the name
    refuses("CREATE OR REPLACE MATERIALIZED VIEW vv.markets.xrp AS " +
      "SELECT code, count(1) AS n FROM vv.markets.xrp GROUP BY code",
      "already exists")
    refuses("CREATE MATERIALIZED VIEW IF NOT EXISTS vv.markets.xrp AS " +
      "SELECT code, count(1) AS n FROM vv.markets.xrp GROUP BY code",
      "already exists")
    assert(st.scan().count() == 4, "the store survives every refusal")
    // an unknown mode through the CALL form refuses
    refuses("CALL vv.system.create_view('markets.x2', 'markets.xrp', " +
      "'code', 'count(1) AS n', 'nope')", "unknown mode")
    // DROP MATERIALIZED VIEW on a STORE refuses — the operator typed
    // 'view'; a store must go through DROP TABLE
    refuses("DROP MATERIALIZED VIEW vv.markets.xrp",
      "not an incremental view")
    assert(st.scan().count() == 4)
    // unqualified name refuses with the drop_view pointer
    refuses("DROP MATERIALIZED VIEW unqualified", "catalog-qualified")
    // the happy path drops, the store survives
    assert(spark.sql("DROP MATERIALIZED VIEW vv.markets.xrp_v")
      .collect().head.getBoolean(0))
    assert(spark.sql("SHOW TABLES IN vv.markets")
      .select("tableName").as[String].collect().toSet.contains("xrp"))
    assert(!new java.io.File(s"$base/markets/xrp_v").exists())
    // missing: IF EXISTS is quiet (false), plain refuses
    assert(!spark.sql("DROP MATERIALIZED VIEW IF EXISTS vv.markets.xrp_v")
      .collect().head.getBoolean(0))
    refuses("DROP MATERIALIZED VIEW vv.markets.xrp_v", "does not exist")
    // an EMPTY leftover dir (what a replace crashed after its deletes
    // leaves) counts as free — the re-issued CREATE completes instead
    // of refusing 'already exists'
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$base/markets/empty_v"))
    spark.sql("CREATE MATERIALIZED VIEW vv.markets.empty_v AS SELECT code, " +
      "count(1) AS n FROM vv.markets.xrp GROUP BY code")
    assert(rows(spark.sql("SELECT code, n FROM vv.markets.empty_v")) ==
      Set("XRP|3", "LTC|1"), "create over an empty dir completes")
    spark.sql("DROP MATERIALIZED VIEW vv.markets.empty_v")
    spark.sql("DROP TABLE vv.markets.xrp")
  }

  test("repoint_view: a MOVED source store re-points keeping generations " +
      "and watermark; wrong-history and non-store targets refuse; the " +
      "crash window between delete and rename self-heals") {
    base
    val st = VersionedCandleStore(spark, s"$base/markets/avax")
    st.commit(Seq(c("AVAX", "2022-01-01 10:00:00", 1),
      c("AVAX", "2022-01-02 11:00:00", 60)).toDF())           // tx 1
    spark.sql("CALL vv.system.create_view('markets.avax_v', 'markets.avax', " +
      "'code', 'count(1) AS n')")
    st.commit(Seq(c("ATOM", "2023-03-01 00:00:00", 7)).toDF()) // tx 2
    assert(spark.sql("CALL vv.system.refresh_view('markets.avax_v')")
      .collect().head.getLong(0) == 2L)
    // move the store out from under the view — the out-of-band
    // directory move limitation 3 names (RENAME TABLE is the in-band
    // spelling of the same thing)
    java.nio.file.Files.move(
      java.nio.file.Paths.get(s"$base/markets/avax"),
      java.nio.file.Paths.get(s"$base/markets/avax2"))
    val orphaned = intercept[AnalysisException](
      spark.sql("SELECT * FROM vv.markets.avax_v").collect())
    assert(orphaned.getMessage.contains("repoint_view"),
      s"the orphan refusal must point at the remedy: ${orphaned.getMessage}")
    // IF NOT EXISTS on the ORPHANED view stays a no-op (an idempotent
    // deployment script must not start failing mid-move): the watermark
    // reports without opening the missing store
    val ine = spark.sql(
      """CREATE MATERIALIZED VIEW IF NOT EXISTS vv.markets.avax_v AS
        |SELECT code, count(1) AS n FROM vv.markets.avax2
        |GROUP BY code""".stripMargin).collect().head
    assert(ine.getLong(1) == 2L,
      "orphan watermark reported, view untouched")
    // repoint keeps the adopted generations and the watermark
    val r = spark.sql(
      "CALL vv.system.repoint_view('markets.avax_v', 'markets.avax2')")
      .collect().head
    assert(r.getString(0) == s"$base/markets/avax2")
    assert(r.getLong(1) == 2L, "watermark preserved")
    assert(rows(spark.sql("SELECT code, n FROM vv.markets.avax_v")) ==
      Set("AVAX|2", "ATOM|1"), "reads resume without a rebuild")
    // incremental maintenance continues against the new location
    val st2 = VersionedCandleStore(spark, s"$base/markets/avax2")
    st2.commit(Seq(c("AVAX", "2022-01-03 09:00:00", 3)).toDF()) // tx 3
    assert(spark.sql("CALL vv.system.refresh_view('markets.avax_v')")
      .collect().head.getLong(0) == 3L)
    assert(rows(spark.sql("SELECT code, n FROM vv.markets.avax_v")) ==
      Set("AVAX|3", "ATOM|1"))
    def refuse(call: String, needle: String): Unit = {
      val e = intercept[AnalysisException](spark.sql(call).collect())
      assert(e.getMessage.contains(needle), s"want '$needle': ${e.getMessage}")
    }
    // a store whose journal cannot serve the watermark refuses — repoint
    // targets the SAME store at a new path, not a different history
    val fresh = VersionedCandleStore(spark, s"$base/markets/avax_fresh")
    fresh.commit(Seq(c("X", "2022-01-01 10:00:00", 1)).toDF()) // head 1 < 3
    refuse("CALL vv.system.repoint_view('markets.avax_v', 'markets.avax_fresh')",
      "not servable")
    // a view target for the TABLE arg refuses through the catalog guard
    refuse("CALL vv.system.repoint_view('markets.avax_v', 'markets.avax_v')",
      "VIEW, not a store")
    assert(rows(spark.sql("SELECT code, n FROM vv.markets.avax_v")) ==
      Set("AVAX|3", "ATOM|1"), "every refusal leaves the view intact")
    // crash window: definition deleted, complete .new left behind — the
    // view still resolves + reads, and a repoint re-CALL finishes it
    val dir = java.nio.file.Paths.get(s"$base/markets/avax_v")
    java.nio.file.Files.copy(dir.resolve("_graft_view.json"),
      dir.resolve("_graft_view.json.new"))
    java.nio.file.Files.delete(dir.resolve("_graft_view.json"))
    assert(rows(spark.sql("SELECT code, n FROM vv.markets.avax_v")) ==
      Set("AVAX|3", "ATOM|1"), "the .new fallback serves reads")
    assert(spark.sql(
      "CALL vv.system.repoint_view('markets.avax_v', 'markets.avax2')")
      .collect().head.getLong(1) == 3L)
    assert(java.nio.file.Files.exists(dir.resolve("_graft_view.json")) &&
      !java.nio.file.Files.exists(dir.resolve("_graft_view.json.new")),
      "the re-CALL completes the move")
    spark.sql("DROP TABLE vv.markets.avax_v")
    spark.sql("DROP TABLE vv.markets.avax2")
    spark.sql("DROP TABLE vv.markets.avax_fresh")
  }
}
