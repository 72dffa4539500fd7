package graft

import org.apache.spark.sql.functions.col

import graft.model.Candle
import graft.store.CandleStore

/** The plain-store catalog plugin (the non-versioned twin of
  * VStoreCatalogSpec): candle stores as SQL names, with the partition
  * pruning of the path API preserved UNDER the catalog, one-atomic-
  * upsert INSERT INTO, and the foreign-directory guards.
  */
class CandleCatalogSpec extends SparkSpec {
  import spark.implicits._

  private def c(code: String, t: String, o: Double): Candle =
    Candle("UPBIT", code, 60, ts(t), o, o + 1, o - 1, o + 0.5, 10.0, 0L)

  private lazy val base: String = {
    val b = tmpDir("candle-catalog")
    spark.conf.set("spark.sql.catalog.cc", classOf[graft.sources.CandleCatalog].getName)
    spark.conf.set("spark.sql.catalog.cc.base", b)
    b
  }

  test("catalog read == path read; partition pruning survives the " +
      "catalog; foreign dirs never list; vstore dirs are not claimed") {
    val st = CandleStore(spark, s"$base/markets/btc")
    st.upsert(Seq(
      c("BTC", "2023-12-31 23:59:00", 1), // year 2023 partition
      c("BTC", "2024-01-01 10:00:00", 2),
      c("ETH", "2024-01-01 10:00:00", 3)).toDF())
    // foreign dir + a VERSIONED store next door: neither is a cc table
    val f = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(base), spark.sparkContext.hadoopConfiguration)
    f.mkdirs(new org.apache.hadoop.fs.Path(s"$base/markets/notastore"))
    graft.store.VersionedCandleStore(spark, s"$base/markets/versioned")
      .commit(Seq(c("SOL", "2024-01-01 00:00:00", 9)).toDF())

    val listed = spark.sql("SHOW TABLES IN cc.markets")
      .select("tableName").as[String].collect().toSet
    assert(listed == Set("btc"), s"got $listed")

    val got = spark.sql("SELECT * FROM cc.markets.btc").collect()
    assert(got.length == 3 &&
      got.map(_.getAs[Int]("year")).sorted.toSeq == Seq(2023, 2024, 2024))

    // pruning: the EXECUTED inner plan of a year+code-filtered catalog
    // read scans only the one matching partition (same construction the
    // SQL path executes through the V1Scan bridge)
    val sql = spark.sql(
      """SELECT ts, close FROM cc.markets.btc
         WHERE market = 'UPBIT' AND code = 'BTC' AND candle_length = 60 AND year = 2024""")
    assert(sql.collect().length == 1)
    val tbl = new graft.sources.CandleTable(spark, s"$base/markets/btc")
    val sb = tbl.newScanBuilder(
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(java.util.Collections.emptyMap()))
      .asInstanceOf[graft.sources.CandleScanBuilder]
    sb.pushFilters(Array(
      org.apache.spark.sql.sources.EqualTo("market", "UPBIT"),
      org.apache.spark.sql.sources.EqualTo("code", "BTC"),
      org.apache.spark.sql.sources.EqualTo("candle_length", 60),
      org.apache.spark.sql.sources.EqualTo("year", 2024)))
    val inner = sb.build().asInstanceOf[graft.sources.CandleScan].innerFrame()
    inner.collect()
    val scans = inner.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty, "expected a FileSourceScan in the inner plan")
    val meta = scans.head.metadata.getOrElse("PartitionFilters", "")
    assert(meta.contains("code") && meta.contains("year"),
      s"partition filters not pushed: $meta")
    assert(scans.head.metrics("numFiles").value == 1L,
      s"expected 1 pruned file, scanned ${scans.head.metrics("numFiles").value}")
  }

  test("a committed-but-uninstalled first batch is visible through the " +
      "catalog: the inner scan recovers before probing for data") {
    // Regression: the catalog's empty-store probe (no market= dirs)
    // ran BEFORE recovery, so a store whose first upsert published its
    // commit intent and crashed pre-install read as an EMPTY table
    // through SQL while the path API returned the batch.
    base
    val st = CandleStore(spark, s"$base/markets/torn")
    st.upsertWithCrash(Seq(c("TORN", "2024-03-01 00:00:00", 5.0)).toDF(), maxOps = 0)
    // path read recovers and sees the batch; the catalog must agree
    assert(CandleStore(spark, s"$base/markets/torn").scan().count() == 1L)
    val viaSql = spark.sql("SELECT code, open FROM cc.markets.torn").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(viaSql == Seq(("TORN", 5.0)),
      s"catalog read of a crash-torn store: $viaSql")
  }

  test("INSERT INTO runs one atomic upsert (new row lands, same-(key,ts) " +
      "row is REPLACED); INSERT OVERWRITE refused; CREATE stamps an " +
      "empty readable store") {
    base
    spark.sql("CREATE TABLE cc.markets.doge")
    assert(spark.sql("SELECT * FROM cc.markets.doge").count() == 0L)
    spark.sql(
      """INSERT INTO cc.markets.doge VALUES
         ('UPBIT', 'DOGE', 60, TIMESTAMP '2024-05-01 00:00:00', 1.0, 2.0, 0.5, 1.5, 10.0, 0, 2024)""")
    assert(spark.sql("SELECT * FROM cc.markets.doge").count() == 1L)
    // upsert semantics: same (series, ts) replaces, new ts appends
    spark.sql(
      """INSERT INTO cc.markets.doge VALUES
         ('UPBIT', 'DOGE', 60, TIMESTAMP '2024-05-01 00:00:00', 9.0, 9.5, 8.5, 9.2, 90.0, 0, 2024),
         ('UPBIT', 'DOGE', 60, TIMESTAMP '2024-05-01 00:01:00', 2.0, 3.0, 1.0, 2.5, 20.0, 0, 2024)""")
    val rows = spark.sql("SELECT ts, open FROM cc.markets.doge ORDER BY ts")
      .collect().map(r => (r.getTimestamp(0), r.getDouble(1)))
    assert(rows.toSeq == Seq(
      (ts("2024-05-01 00:00:00"), 9.0), (ts("2024-05-01 00:01:00"), 2.0)),
      rows.mkString(", "))
    // a lying year is refused loudly, not silently recomputed
    val eY = intercept[Exception] {
      spark.sql(
        """INSERT INTO cc.markets.doge VALUES
           ('UPBIT', 'DOGE', 60, TIMESTAMP '2024-05-01 00:02:00', 1.0, 1.0, 1.0, 1.0, 1.0, 0, 1999)""")
    }
    assert(eY.getMessage.contains("year"), eY.getMessage)
    val e = intercept[Exception] {
      spark.sql(
        """INSERT OVERWRITE cc.markets.doge VALUES
           ('UPBIT', 'DOGE', 60, TIMESTAMP '2024-05-01 00:03:00', 1.0, 1.0, 1.0, 1.0, 1.0, 0, 2024)""")
    }
    assert(e.getMessage.toLowerCase.matches("(?s).*(overwrite|truncate).*"), e.getMessage)
    assert(spark.sql("SELECT * FROM cc.markets.doge").count() == 2L)
    spark.sql("DROP TABLE cc.markets.doge")
    assert(!new java.io.File(s"$base/markets/doge").exists())
  }

  test("SQL maintenance procedures: CALL system.compact folds crowded " +
      "partitions, vacuum sweeps stale debris, recover rolls forward — " +
      "all behind the store-format guard") {
    val st = CandleStore(spark, s"$base/maint/m1")
    (1 to 3).foreach { i =>
      st.upsert(Seq(c("BTC", s"2022-01-01 10:0$i:00", i.toDouble)).toDF())
    }
    val before = spark.sql("SELECT ts, open FROM cc.maint.m1 ORDER BY ts")
      .collect().map(_.mkString("|")).toSeq
    // threshold 0 forces the rewrite regardless of file census (batch
    // upserts already leave one merged file; the multi-file census is
    // CandleStoreSpec's subject — here the SQL plumbing is)
    assert(spark.sql(
      "CALL cc.system.compact('maint.m1', max_files_per_partition => 0)")
      .head().getInt(0) == 1, "one crowded partition rewritten")
    assert(spark.sql("SELECT ts, open FROM cc.maint.m1 ORDER BY ts")
      .collect().map(_.mkString("|")).toSeq == before,
      "compaction must not change query results")

    // vacuum sweeps an unpublished staging dir (age fence waived: 0)
    val f = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(base), spark.sparkContext.hadoopConfiguration)
    f.mkdirs(new org.apache.hadoop.fs.Path(s"$base/maint/m1/_staging/dead"))
    Thread.sleep(5)
    assert(spark.sql("CALL cc.system.vacuum('maint.m1', min_age_ms => 0)")
      .head().getInt(0) >= 1)

    // recover: idempotent roll-forward through SQL (clean store: counts
    // the already-installed intents it re-verified, never fails)
    assert(spark.sql("CALL cc.system.recover('maint.m1')")
      .head().getInt(0) >= 0)
    assert(spark.sql("SELECT count(*) FROM cc.maint.m1").head().getLong(0) == 3L)

    // describe_detail: partition/file census, no data read
    val det = spark.sql("CALL cc.system.describe_detail('maint.m1')").head()
    assert(det.getAs[String]("format") == "graft-candles")
    assert(det.getAs[Long]("n_partitions") == 1L,
      "one (market, candle_length, code, year) leaf partition")
    assert(det.getAs[Long]("n_data_files") >= 1L &&
      det.getAs[Long]("size_bytes") > 0L)

    // the candle catalog's procedure set is its own (no vstore-only ops)
    val e = intercept[Exception](
      spark.sql("CALL cc.system.checkpoint_journal('maint.m1')"))
    assert(e.getMessage.contains("no procedure"), e.getMessage)
    // foreign dir refuses through the same guard as reads
    f.mkdirs(new org.apache.hadoop.fs.Path(s"$base/maint/notastore"))
    intercept[Exception](spark.sql("CALL cc.system.compact('maint.notastore')"))
  }
}
