package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions.col

import graft.model.Candle
import graft.store.VersionedCandleStore

/** The vstore catalog plugin (SURVEY.md §2 storage modernization):
  * versioned stores as first-class SQL names — listing, reads, SQL
  * time travel, CREATE/DROP — with the directory tree as the catalog
  * and [[VersionedCandleStore.looksLikeStore]] as the table predicate.
  */
class VStoreCatalogSpec extends SparkSpec {
  import spark.implicits._

  private def c(code: String, t: String, o: Double): Candle =
    Candle("UPBIT", code, 60, ts(t), o, o + 1, o - 1, o + 0.5, 10.0, 0L)

  // one catalog per suite over one base tree
  private lazy val base: String = {
    val b = tmpDir("vstore-catalog")
    spark.conf.set("spark.sql.catalog.vc", classOf[graft.sources.VStoreCatalog].getName)
    spark.conf.set("spark.sql.catalog.vc.base", b)
    b
  }

  private def opens(df: org.apache.spark.sql.DataFrame): Map[(String, Timestamp), Double] =
    df.select("code", "ts", "open").collect()
      .map(r => (r.getString(0), r.getTimestamp(1)) -> r.getDouble(2)).toMap

  test("catalog read == path read; SQL VERSION/TIMESTAMP AS OF time-travel " +
      "through the catalog; foreign dirs never list or load") {
    val st = VersionedCandleStore(spark, s"$base/markets/btc")
    st.commit(Seq(c("BTC", "2022-01-01 10:00:00", 1),
      c("BTC", "2022-01-01 10:01:00", 2)).toDF())
    Thread.sleep(5) // tx wall-clocks must be distinguishable for AS OF
    val t1Wall = st.txLog().where($"kind" === "commit")
      .select("committed_at").as[Timestamp].collect().max
    st.commit(Seq(c("BTC", "2022-01-01 10:01:00", 20),
      c("ETH", "2021-06-01 00:00:00", 5)).toDF())

    // a foreign directory next to the stores: not a table, not a namespace entry
    val f = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(base), spark.sparkContext.hadoopConfiguration)
    f.mkdirs(new org.apache.hadoop.fs.Path(s"$base/markets/notastore"))

    val listed = spark.sql("SHOW TABLES IN vc.markets")
      .select("tableName").as[String].collect().toSet
    assert(listed == Set("btc"), s"got $listed")

    assert(opens(spark.sql("SELECT * FROM vc.markets.btc")) == opens(st.scan()))
    assert(opens(spark.sql("SELECT * FROM vc.markets.btc VERSION AS OF 1")) ==
      opens(st.scanAsOf(1L)))
    assert(opens(spark.sql(
      s"SELECT * FROM vc.markets.btc TIMESTAMP AS OF '$t1Wall'")) ==
      opens(st.scanAsOfTime(t1Wall)))
    // catalog reads plan through the SAME pushdown surface as .load(path):
    // the grouped fold-key aggregate is served scan-side (no winner fold)
    val agg = spark.sql(
      "SELECT code, max(ts) AS last_ts, count(*) AS n FROM vc.markets.btc GROUP BY code")
    val optimized = agg.queryExecution.optimizedPlan.toString
    assert(optimized.contains("max_ts") && !optimized.contains("Aggregate"),
      s"aggregate not pushed (expected scan-served max_ts, no Aggregate):\n$optimized")
    assert(agg.collect().map(r => r.getString(0) -> r.getLong(2)).toMap ==
      Map("BTC" -> 2L, "ETH" -> 1L))
    // the foreign dir is invisible and unloadable
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT * FROM vc.markets.notastore").collect()
    }
    assert(e.getMessage.toLowerCase.contains("table"), e.getMessage)
  }

  test("CREATE TABLE stamps an empty store the writer then appends to; " +
      "DROP TABLE deletes only real stores") {
    base // force catalog registration
    spark.sql("CREATE TABLE vc.markets.eth")
    assert(spark.sql("SELECT * FROM vc.markets.eth").count() == 0L)
    // the stamped dir IS a store: the path-based writer appends tx 1
    Seq(c("ETH", "2023-01-01 00:00:00", 7)).toDF()
      .write.format("graft-vstore").mode("append").save(s"$base/markets/eth")
    assert(opens(spark.sql("SELECT * FROM vc.markets.eth")) ==
      Map(("ETH", ts("2023-01-01 00:00:00")) -> 7.0))
    // fixed schema: a mismatched column list is refused
    intercept[Exception] {
      spark.sql("CREATE TABLE vc.markets.bad (x INT, y STRING)")
    }
    // DROP deletes the store…
    spark.sql("DROP TABLE vc.markets.eth")
    assert(!new java.io.File(s"$base/markets/eth").exists())
    // …but a foreign dir under the same name space is refused (returns
    // false → Spark reports NoSuchTable; the dir survives)
    val f = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(base), spark.sparkContext.hadoopConfiguration)
    f.mkdirs(new org.apache.hadoop.fs.Path(s"$base/markets/plaindir"))
    intercept[Exception] { spark.sql("DROP TABLE vc.markets.plaindir") }
    assert(new java.io.File(s"$base/markets/plaindir").exists())
  }

  test("SQL INSERT INTO appends one journaled tx; INSERT OVERWRITE " +
      "refused; user TBLPROPERTIES refused at CREATE") {
    base
    spark.sql("CREATE TABLE vc.markets.sol")
    spark.sql(
      """INSERT INTO vc.markets.sol VALUES
         ('UPBIT', 'SOL', 60, TIMESTAMP '2024-01-01 00:00:00', 2024, 1.0, 2.0, 0.5, 1.5, 10.0, 0)""")
    val st = VersionedCandleStore(spark, s"$base/markets/sol")
    assert(st.latestTxId == 1L, s"one journaled tx expected, got ${st.latestTxId}")
    assert(opens(spark.sql("SELECT * FROM vc.markets.sol")) ==
      Map(("SOL", ts("2024-01-01 00:00:00")) -> 1.0))
    // second INSERT = second tx; VERSION AS OF 1 still sees only the first
    spark.sql(
      """INSERT INTO vc.markets.sol VALUES
         ('UPBIT', 'SOL', 60, TIMESTAMP '2024-01-01 00:01:00', 2024, 2.0, 3.0, 1.5, 2.5, 20.0, 0)""")
    assert(st.latestTxId == 2L)
    assert(spark.sql("SELECT * FROM vc.markets.sol").count() == 2L)
    assert(spark.sql("SELECT * FROM vc.markets.sol VERSION AS OF 1").count() == 1L)
    // INSERT OVERWRITE: refused (no truncate/overwrite capability)
    val e1 = intercept[Exception] {
      spark.sql(
        """INSERT OVERWRITE vc.markets.sol VALUES
           ('UPBIT', 'SOL', 60, TIMESTAMP '2024-01-01 00:02:00', 2024, 9.0, 9.0, 9.0, 9.0, 9.0, 0)""")
    }
    assert(e1.getMessage.toLowerCase.matches("(?s).*(overwrite|truncate).*"),
      e1.getMessage)
    assert(st.latestTxId == 2L, "refused overwrite must not have committed")
    // user TBLPROPERTIES would be dropped silently -> refused at CREATE
    val e2 = intercept[Exception] {
      spark.sql("CREATE TABLE vc.markets.props TBLPROPERTIES ('k'='v')")
    }
    assert(e2.getMessage.contains("TBLPROPERTIES"), e2.getMessage)
    assert(!new java.io.File(s"$base/markets/props").exists())
    spark.sql("DROP TABLE vc.markets.sol")
  }

  test("SQL maintenance procedures: CALL system.history/compact/" +
      "checkpoint_journal/vacuum/break_stale_lock drive the store's " +
      "maintenance APIs; foreign tables and unknown procedures refuse") {
    val st = VersionedCandleStore(spark, s"$base/maint/m1")
    st.commit(Seq(c("BTC", "2022-01-01 10:00:00", 1)).toDF())
    st.commit(Seq(c("BTC", "2022-01-01 10:00:00", 2),
      c("ETH", "2021-06-01 00:00:00", 5)).toDF())

    // history == the journal, newest first (the DESCRIBE HISTORY shape)
    val h = spark.sql("CALL vc.system.history('maint.m1')")
    assert(h.columns.toSeq == Seq("tx_id", "n_rows", "committed_at",
      "kind", "batch_id", "min_at"))
    val hRows = h.select("tx_id", "kind").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(hRows == Seq((2L, "commit"), (1L, "commit")), hRows.toString)

    // a stale lock blocks maintenance; break_stale_lock clears it via SQL
    val f = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(base), spark.sparkContext.hadoopConfiguration)
    f.create(new org.apache.hadoop.fs.Path(s"$base/maint/m1/_compact.lock"),
      false).close()
    intercept[IllegalStateException](
      spark.sql("CALL vc.system.compact('maint.m1')"))
    assert(spark.sql("CALL vc.system.break_stale_lock('maint.m1')")
      .head().getBoolean(0))
    assert(!spark.sql("CALL vc.system.break_stale_lock('maint.m1')")
      .head().getBoolean(0), "second break finds no lock")

    // compact returns the squash floor; reads stay exact; as-of below
    // the floor now fails loudly (the Scala contract, through SQL)
    assert(spark.sql("CALL vc.system.compact('maint.m1')")
      .head().getLong(0) == 2L)
    assert(st.squashFloorTxId == 2L)
    assert(opens(spark.sql("SELECT * FROM vc.maint.m1")) == opens(st.scan()))
    intercept[Exception](
      spark.sql("SELECT * FROM vc.maint.m1 VERSION AS OF 1").collect())
    // bare CALL vc.compact(...) resolves too (no-op: already at floor)
    assert(spark.sql("CALL vc.compact('maint.m1')").head().getLong(0) == 2L)

    // checkpoint rolls the journal tails into one file
    assert(spark.sql("CALL vc.system.checkpoint_journal('maint.m1')")
      .head().getLong(0) >= 2L)

    // vacuum sweeps a dead reservation (min_age_ms => 0: no live writers)
    st.reserveTxId()
    assert(spark.sql(
      "CALL vc.system.vacuum('maint.m1', min_age_ms => 0)")
      .head().getInt(0) >= 1)
    assert(opens(spark.sql("SELECT * FROM vc.maint.m1")) == opens(st.scan()))

    // describe_detail: the DESCRIBE DETAIL shape over the same store
    val det = spark.sql("CALL vc.system.describe_detail('maint.m1')").head()
    assert(det.getAs[String]("format") == "graft-vstore")
    assert(det.getAs[Long]("head_tx") == 2L &&
      det.getAs[Long]("squash_floor_tx") == 2L)
    assert(!det.getAs[Boolean]("has_tombstones"))
    assert(det.getAs[Int]("n_generations") == 2,
      "compaction retains the previous generation")
    assert(det.getAs[Long]("n_data_files") >= 1L &&
      det.getAs[Long]("size_bytes") > 0L)

    // discovery surface
    val listed = spark.sql("SHOW PROCEDURES IN vc.system").collect()
      .map(_.mkString("|")).mkString("\n")
    Seq("compact", "vacuum", "checkpoint_journal", "history",
      "break_stale_lock").foreach(p => assert(listed.contains(p), listed))
    val desc = spark.sql("DESCRIBE PROCEDURE vc.system.compact").collect()
      .map(_.mkString("|")).mkString("\n")
    assert(desc.toLowerCase.contains("squash"), desc)

    // refusals: unknown procedure, wrong namespace, foreign/missing table
    val e1 = intercept[Exception](spark.sql("CALL vc.system.nope('maint.m1')"))
    assert(e1.getMessage.contains("no procedure"), e1.getMessage)
    val e2 = intercept[Exception](spark.sql("CALL vc.other.compact('maint.m1')"))
    assert(e2.getMessage.contains("system"), e2.getMessage)
    f.mkdirs(new org.apache.hadoop.fs.Path(s"$base/maint/notastore"))
    intercept[Exception](
      spark.sql("CALL vc.system.compact('maint.notastore')"))
  }

  test("namespace listing walks directories, skips stores") {
    base
    spark.sql("CREATE NAMESPACE IF NOT EXISTS vc.research")
    val namespaces = spark.sql("SHOW NAMESPACES IN vc")
      .select("namespace").as[String].collect().toSet
    assert(namespaces.contains("markets") && namespaces.contains("research"),
      s"got $namespaces")
    // a store dir is a table, never a namespace
    assert(!namespaces.contains("btc"))
  }
}
