package graft

import org.apache.spark.sql.{AnalysisException, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.Candle
import graft.store.{IncrementalView, VersionedCandleStore}

/** Incrementally-maintained aggregate views over the versioned store
  * (graft.store.IncrementalView): after EVERY refresh the view must
  * equal a full recompute of `GROUP BY` over the latest fold — across
  * updates, inserts, tombstone deletes, group disappearance, compaction
  * floors, and torn generations.
  */
class IncrementalViewSpec extends SparkSpec {
  import spark.implicits._

  private def c(code: String, t: String, o: Double, vol: Double = 10.0): Candle =
    Candle("UPBIT", code, 60, ts(t), o, o + 1, o - 1, o + 0.5, vol, 0L)

  private def view(st: VersionedCandleStore, path: String): IncrementalView =
    new IncrementalView(spark, path, st,
      Seq("code" -> col("code"), "day" -> to_date(col("ts"))),
      Seq(count(lit(1)).as("n"), round(sum(col("volume")), 4).as("vol"),
        round(max(col("close")), 4).as("max_close")))

  private def full(st: VersionedCandleStore): DataFrame =
    st.scan().select(col("code"), to_date(col("ts")).as("day"),
        col("volume"), col("close"))
      .groupBy("code", "day")
      .agg(count(lit(1)).as("n"), round(sum(col("volume")), 4).as("vol"),
        round(max(col("close")), 4).as("max_close"))

  private def rows(df: DataFrame): Set[String] =
    df.select("code", "day", "n", "vol", "max_close").collect()
      .map(_.mkString("|")).toSet

  test("refresh equals a full recompute across commits; no-op refresh " +
      "keeps the watermark; read() refuses before the first refresh") {
    val st = VersionedCandleStore(spark, tmpDir("iv") + "/v")
    val v = view(st, tmpDir("iv-view"))
    val e = intercept[AnalysisException](v.read())
    assert(e.getMessage.contains("refresh() first"))
    st.commit(Seq(c("BTC", "2022-01-01 10:00:00", 1),
      c("BTC", "2022-01-01 11:00:00", 2, vol = 5),
      c("ETH", "2022-01-02 09:00:00", 3)).toDF())
    assert(v.refresh() == 1L)
    assert(rows(v.read()) == rows(full(st)))
    // incremental: an update (same key), an insert (new day), a new code
    st.commit(Seq(c("BTC", "2022-01-01 10:00:00", 9, vol = 100), // update
      c("BTC", "2022-01-03 10:00:00", 4),                        // new group
      c("SOL", "2022-01-01 10:00:00", 5)).toDF())                // new code
    assert(v.refresh() == 2L)
    assert(rows(v.read()) == rows(full(st)))
    // untouched group (ETH) must still be present and exact
    assert(v.read().where($"code" === "ETH").count() == 1)
    // no-op refresh: nothing new committed
    assert(v.refresh() == 2L && v.watermark() == 2L)
  }

  test("tombstone deletes maintain the view: shrunk aggregates (incl. " +
      "non-additive max) and VANISHED groups both exact") {
    val st = VersionedCandleStore(spark, tmpDir("ivd") + "/v")
    val v = view(st, tmpDir("ivd-view"))
    st.commit(Seq(c("BTC", "2022-01-01 10:00:00", 1, vol = 7),
      c("BTC", "2022-01-01 11:00:00", 50, vol = 3), // max_close donor
      c("ETH", "2022-01-02 09:00:00", 3)).toDF())
    v.refresh()
    assert(rows(v.read()) == rows(full(st)))
    // delete the max-donor row: BTC group must shrink AND its max must
    // DROP (a purely additive maintainer would get this wrong); delete
    // ETH's only row: the group must vanish
    st.delete(Seq(("UPBIT", "BTC", 60, ts("2022-01-01 11:00:00")),
      ("UPBIT", "ETH", 60, ts("2022-01-02 09:00:00")))
      .toDF("market", "code", "candle_length", "ts"))
    v.refresh()
    assert(rows(v.read()) == rows(full(st)))
    val btc = v.read().where($"code" === "BTC").head()
    assert(btc.getAs[Long]("n") == 1L &&
      btc.getAs[Double]("max_close") == 1.5)
    assert(v.read().where($"code" === "ETH").count() == 0,
      "a fully-deleted group must vanish from the view")
  }

  test("a compact() floor past the watermark falls back to a full " +
      "recompute (the per-tx window no longer exists) and stays exact") {
    val st = VersionedCandleStore(spark, tmpDir("ivc") + "/v")
    val v = view(st, tmpDir("ivc-view"))
    st.commit(Seq(c("BTC", "2022-01-01 10:00:00", 1)).toDF())
    v.refresh()
    st.commit(Seq(c("BTC", "2022-01-01 10:00:00", 2),
      c("ETH", "2022-01-02 09:00:00", 3)).toDF())
    st.commit(Seq(c("SOL", "2022-01-03 09:00:00", 4)).toDF())
    st.compact() // floor = 3 > watermark 1
    assert(v.refresh() == 3L)
    assert(rows(v.read()) == rows(full(st)))
  }

  test("generations are _SUCCESS-gated: a torn higher generation is " +
      "invisible and a refresh supersedes it; older gens are GC'd") {
    val st = VersionedCandleStore(spark, tmpDir("ivg") + "/v")
    val viewDir = tmpDir("ivg-view")
    val v = view(st, viewDir)
    st.commit(Seq(c("BTC", "2022-01-01 10:00:00", 1)).toDF())
    v.refresh()
    // plant a TORN (no _SUCCESS) generation above the adopted one
    val torn = java.nio.file.Paths.get(viewDir, "gen_99")
    java.nio.file.Files.createDirectories(torn)
    java.nio.file.Files.write(torn.resolve("part-torn.parquet"),
      Array[Byte](1, 2, 3))
    assert(v.watermark() == 1L, "a torn generation must not be adopted")
    assert(rows(v.read()) == rows(full(st)))
    // a reader resolved BEFORE the next refresh must survive it (one-hop
    // generation retention, the store's compaction convention)
    val resolvedEarly = v.read()
    st.commit(Seq(c("ETH", "2022-01-02 09:00:00", 2)).toDF())
    assert(v.refresh() == 2L)
    assert(rows(v.read()) == rows(full(st)))
    assert(resolvedEarly.count() == 1L,
      "a pre-refresh reader must still execute after ONE refresh")
    // the adopted gen + its immediate predecessor survive; the torn
    // gen_99 is GC'd
    val gens = java.nio.file.Files.list(java.nio.file.Paths.get(viewDir))
      .toArray.map(_.toString).filter(_.contains("gen_"))
    assert(gens.map(p => p.substring(p.lastIndexOf('/') + 1)).toSet ==
      Set("gen_1", "gen_2"), gens.mkString(", "))
    // a third refresh GCs gen_1 (two hops back)
    st.commit(Seq(c("SOL", "2022-01-03 09:00:00", 3)).toDF())
    assert(v.refresh() == 3L)
    val gens2 = java.nio.file.Files.list(java.nio.file.Paths.get(viewDir))
      .toArray.map(_.toString).filter(_.contains("gen_"))
    assert(gens2.map(p => p.substring(p.lastIndexOf('/') + 1)).toSet ==
      Set("gen_2", "gen_3"), gens2.mkString(", "))
  }

  test("concurrent refreshes are excluded by _refresh.lock; a stale lock " +
      "is broken explicitly") {
    val st = VersionedCandleStore(spark, tmpDir("ivl") + "/v")
    val viewDir = tmpDir("ivl-view")
    val v = view(st, viewDir)
    st.commit(Seq(c("BTC", "2022-01-01 10:00:00", 1)).toDF())
    // plant the lock a hard-killed refresher would leave behind
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(viewDir))
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(viewDir, "_refresh.lock"))
    val e = intercept[IllegalStateException](v.refresh())
    assert(e.getMessage.contains("_refresh.lock"), e.getMessage)
    assert(v.breakStaleLock())
    assert(!v.breakStaleLock(), "second break finds no lock")
    assert(v.refresh() == 1L)
    assert(rows(v.read()) == rows(full(st)))
  }

  test("changesSinceGeneration: the view's OWN feed — upserts + deletes " +
      "diff consecutive generations; apply-protocol equals read(); " +
      "current-gen feed empty; a GC'd generation fails loudly") {
    val st = VersionedCandleStore(spark, tmpDir("ivcg") + "/v")
    val v = view(st, tmpDir("ivcg-view"))
    st.commit(Seq(c("BTC", "2022-01-01 10:00:00", 1),
      c("ETH", "2021-06-01 00:00:00", 5)).toDF())   // tx 1
    assert(v.refresh() == 1L)
    assert(v.generation() == Some((1L, 0L)))
    assert(v.changesSinceGeneration(1L).count() == 0,
      "asking from the current generation is an empty feed")
    val held = rows(v.read()) // the state a tail consumer holds
    st.commit(Seq(c("BTC", "2022-01-01 10:00:00", 2)).toDF()) // tx 2 update
    st.delete(Seq(("UPBIT", "ETH", 60, ts("2021-06-01 00:00:00")))
      .toDF("market", "code", "candle_length", "ts"))          // tx 3
    assert(v.refresh() == 3L)
    val feed = v.changesSinceGeneration(1L)
    val kinds = feed.select("_view_change_kind", "code")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(kinds == Set(("upsert", "BTC"), ("delete", "ETH")), kinds)
    // apply protocol: drop the feed's groups from the held copy, union
    // the upserts — equals read()
    val touchedGroups = feed.select("code").distinct()
      .collect().map(_.getString(0)).toSet
    val applied = held.filterNot(r => touchedGroups.contains(r.split('|')(0))) ++
      rows(feed.where($"_view_change_kind" === "upsert")
        .drop("_view_change_kind"))
    assert(applied.toSet == rows(v.read()).toSet,
      "held-copy + feed must equal the refreshed view")
    // one-hop retention: after ANOTHER refresh, generation 1 is GC'd —
    // the tail must fail loudly, not silently serve a wrong diff
    st.commit(Seq(c("SOL", "2023-03-01 00:00:00", 7)).toDF()) // tx 4
    assert(v.refresh() == 4L)
    val e = intercept[org.apache.spark.sql.AnalysisException](
      v.changesSinceGeneration(1L))
    assert(e.getMessage.contains("not retained"), e.getMessage)
    assert(v.changesSinceGeneration(3L)
      .select("_view_change_kind", "code").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet ==
      Set(("upsert", "SOL")), "the retained hop still diffs")
  }

  test("NULL is a legitimate group key: a no-ELSE CASE group refreshes " +
      "exactly (null-safe semi/anti joins) and the view's own feed " +
      "never mis-classifies the live NULL group as deleted") {
    val st = VersionedCandleStore(spark, tmpDir("ivnull") + "/v")
    // tier: 1 for open >= 50, NULL otherwise (no ELSE) — the NULL group
    // is real and must maintain like any other
    val v = new IncrementalView(spark, tmpDir("ivnull-view"), st,
      Seq("tier" -> when($"open" >= 50, lit(1))),
      Seq(count(lit(1)).as("n"), round(sum($"volume"), 4).as("vol")))
    def fullNull() = st.scan()
      .groupBy(when($"open" >= 50, lit(1)).as("tier"))
      .agg(count(lit(1)).as("n"), round(sum($"volume"), 4).as("vol"))
      .collect().map(_.mkString("|")).toSet
    def viewRows() = v.read().select("tier", "n", "vol")
      .collect().map(_.mkString("|")).toSet
    st.commit(Seq(c("BTC", "2022-01-01 10:00:00", 10),  // NULL tier
      c("ETH", "2021-06-01 00:00:00", 90)).toDF())      // tier 1
    assert(v.refresh() == 1L)
    assert(viewRows() == fullNull())
    // an update INSIDE the NULL group (content view: the pre-image
    // names the group it leaves — here it stays NULL) plus a new
    // tier-1 row; the NULL group must recompute, not carry stale
    st.commit(Seq(c("BTC", "2022-01-01 10:00:00", 20, vol = 50),
      c("SOL", "2023-03-01 00:00:00", 70)).toDF())
    assert(v.refresh() == 2L)
    assert(viewRows() == fullNull(),
      "the NULL group must re-aggregate under null-safe joins")
    // the view's own feed: NULL group was touched and is ALIVE — it
    // must arrive as an upsert, never as a spurious delete
    val feed = v.changesSinceGeneration(1L)
    val byKind = feed.select("_view_change_kind", "tier")
      .collect().map(r => (r.getString(0), Option(r.get(1)))).toSet
    assert(byKind.contains(("upsert", None)),
      s"the live NULL group must ride as an upsert: $byKind")
    assert(!byKind.contains(("delete", None)),
      s"the live NULL group must never read as deleted: $byKind")
    // deleting every NULL-group row drops the group through the feed
    st.delete(Seq(("UPBIT", "BTC", 60, ts("2022-01-01 10:00:00")))
      .toDF("market", "code", "candle_length", "ts"))
    assert(v.refresh() == 3L)
    assert(viewRows() == fullNull())
    val feed2 = v.changesSinceGeneration(2L)
    assert(feed2.where($"_view_change_kind" === "delete")
      .select("tier").collect().map(r => Option(r.get(0))).toSet ==
      Set(None), "the vanished NULL group must arrive as a delete")
  }

  test("changesSinceGeneration across a late-commit REPAIR: the repair " +
      "generation (same watermark, bumped rev) diffs from its " +
      "pre-repair twin — watermark alone cannot name a state") {
    val st = VersionedCandleStore(spark, tmpDir("ivcgr") + "/v")
    val v = view(st, tmpDir("ivcgr-view"))
    st.commit(Seq(c("BTC", "2022-01-01 10:00:00", 1)).toDF()) // tx 1
    val (tx2, written) = st.prepareDataCommit(
      Seq(c("ETH", "2022-01-02 09:00:00", 5)).toDF(), None)   // reserved
    st.commit(Seq(c("SOL", "2022-01-03 08:00:00", 7)).toDF()) // tx 3
    assert(v.refresh() == 3L)                                  // gen_3
    assert(v.generation() == Some((3L, 0L)))
    st.finalizeDataCommit(tx2, written, None, None)            // tx 2 LATE
    assert(v.refresh() == 3L)                                  // gen_3_r1
    assert(v.generation() == Some((3L, 1L)),
      "the repair bumps the rev at the same watermark")
    val feed = v.changesSinceGeneration(3L, 0L)
    assert(feed.select("_view_change_kind", "code").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet ==
      Set(("upsert", "ETH")),
      "the late commit's group is the repair diff")
    assert(v.changesSinceGeneration(3L, 1L).count() == 0)
  }

  test("breakLockIfOwner breaks ONLY a lock stamped by the same owner — " +
      "foreign and unstamped (manual-refresh) locks are left alone") {
    val st = VersionedCandleStore(spark, tmpDir("ivlo") + "/v")
    val viewDir = tmpDir("ivlo-view")
    val v = view(st, viewDir)
    st.commit(Seq(c("BTC", "2022-01-01 10:00:00", 1)).toDF())
    val lockPath = java.nio.file.Paths.get(viewDir, "_refresh.lock")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(viewDir))
    // 1) UNSTAMPED lock (what a live manual refresh() holds): the
    // automated breaker must refuse — only the human breakStaleLock()
    // may clear it
    java.nio.file.Files.createFile(lockPath)
    assert(!v.breakLockIfOwner("graft-stream:ckpt-a"),
      "an unstamped lock is possibly a live manual refresh — never broken")
    assert(java.nio.file.Files.exists(lockPath), "lock must survive")
    assert(v.breakStaleLock())
    // 2) FOREIGN stamp (a second stream's checkpoint): refused too
    java.nio.file.Files.write(lockPath,
      "graft-stream:ckpt-b".getBytes("UTF-8"))
    assert(!v.breakLockIfOwner("graft-stream:ckpt-a"),
      "a foreign stamp is possibly a live second stream — never broken")
    assert(java.nio.file.Files.exists(lockPath), "lock must survive")
    // 3) OWN stamp (this stream's dead prior incarnation): broken
    java.nio.file.Files.write(lockPath,
      "graft-stream:ckpt-a".getBytes("UTF-8"))
    assert(v.breakLockIfOwner("graft-stream:ckpt-a"))
    assert(!java.nio.file.Files.exists(lockPath))
    // refresh(owner) stamps the lock while held, and removes it after
    assert(v.refresh("graft-stream:ckpt-a") == 1L)
    assert(!java.nio.file.Files.exists(lockPath),
      "refresh must clear its own stamped lock")
    assert(rows(v.read()) == rows(full(st)))
  }

  test("an out-of-order committer (lower tx journals AFTER a higher one) " +
      "is detected via the recorded gap runs and repaired on the next " +
      "refresh — never silently stale") {
    val st = VersionedCandleStore(spark, tmpDir("ivo") + "/v")
    val v = view(st, tmpDir("ivo-view"))
    st.commit(Seq(c("BTC", "2022-01-01 10:00:00", 1)).toDF()) // tx 1
    // reserve + stage tx 2 but do NOT journal it yet — the cross-store
    // tx / slow-committer shape the store explicitly supports
    val (tx2, written) = st.prepareDataCommit(
      Seq(c("ETH", "2022-01-02 09:00:00", 5)).toDF(), None)
    st.commit(Seq(c("SOL", "2022-01-03 08:00:00", 7)).toDF()) // tx 3
    assert(v.refresh() == 3L) // watermark 3, gap run [2,2] recorded
    assert(v.read().where($"code" === "ETH").count() == 0,
      "the unjournaled tx must be invisible")
    st.finalizeDataCommit(tx2, written, None, None) // tx 2 journals LATE
    // head is still 3 — a naive changes-above-watermark refresh would
    // no-op here forever; the gap check must widen the window instead
    assert(v.refresh() == 3L)
    assert(rows(v.read()) == rows(full(st)))
    assert(v.read().where($"code" === "ETH").count() == 1,
      "the late tx's group must appear after the repair refresh")
    // the repair landed in a FRESH revision dir and RETAINED the prior
    // adopted generation — a torn repair write can never destroy it
    val vDir = v.path
    val repGens = java.nio.file.Files.list(java.nio.file.Paths.get(vDir))
      .toArray.map(_.toString).filter(_.contains("gen_"))
      .map(p => p.substring(p.lastIndexOf('/') + 1)).toSet
    assert(repGens == Set("gen_3", "gen_3_r1"), repGens.toString)
    // the repair is once: the re-written gen has no gaps left
    assert(v.refresh() == 3L)
    assert(rows(v.read()) == rows(full(st)))
  }

  test("a live versioned-ingest stream with a per-batch refresh keeps the " +
      "view exact at EVERY micro-batch (the streaming MV loop)") {
    implicit val sqlCtx = spark.sqlContext
    val st = VersionedCandleStore(spark, tmpDir("ivs") + "/v")
    val v = view(st, tmpDir("ivs-view"))
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, String, Double)]
    val perBatchExact = new java.util.concurrent.ConcurrentLinkedQueue[Boolean]()
    val q = stream.toDF().toDF("code", "t", "o").writeStream
      .outputMode("update")
      .option("checkpointLocation", tmpDir("ivs-ckpt"))
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        if (!b.isEmpty) {
          st.commit(b.select(lit("UPBIT").as("market"), col("code"),
            lit(60).as("candle_length"),
            col("t").cast("timestamp").as("ts"),
            col("o").as("open"), (col("o") + 1).as("high"),
            (col("o") - 1).as("low"), (col("o") + 0.5).as("close"),
            lit(10.0).as("volume"), lit(0L).as("bit_fields")),
            batchId = Some(id))
          v.refresh()
          perBatchExact.add(rows(v.read()) == rows(full(st)))
          ()
        }
      }.start()
    stream.addData(("BTC", "2022-01-01 10:00:00", 1.0),
      ("ETH", "2022-01-02 09:00:00", 2.0))
    q.processAllAvailable()
    stream.addData(("BTC", "2022-01-01 10:00:00", 9.0), // update
      ("SOL", "2022-01-03 08:00:00", 3.0))              // new group
    q.processAllAvailable()
    stream.addData(("BTC", "2022-01-04 11:00:00", 4.0)) // new day
    q.processAllAvailable()
    q.stop()
    import scala.jdk.CollectionConverters._
    assert(perBatchExact.asScala.toSeq == Seq(true, true, true),
      s"view diverged mid-stream: ${perBatchExact.asScala.toSeq}")
    assert(v.watermark() == 3L)
  }

  test("the view stays exact across SQL DML on the base store: DELETE " +
      "FROM drops groups and a key-moving UPDATE relocates rows between " +
      "groups (tombstone + insert in ONE tx through the feed)") {
    val b = tmpDir("ivq")
    spark.conf.set("spark.sql.catalog.ivq",
      classOf[graft.sources.VStoreCatalog].getName)
    spark.conf.set("spark.sql.catalog.ivq.base", b)
    val st = VersionedCandleStore(spark, s"$b/v")
    val v = view(st, tmpDir("ivq-view"))
    st.commit(Seq(c("BTC", "2022-01-01 10:00:00", 1),
      c("BTC", "2022-01-01 11:00:00", 2),
      c("ETH", "2022-01-02 09:00:00", 3)).toDF())
    v.refresh()
    assert(rows(v.read()) == rows(full(st)))
    spark.sql("DELETE FROM ivq.v WHERE code = 'ETH'")
    v.refresh()
    assert(rows(v.read()) == rows(full(st)))
    assert(v.read().where($"code" === "ETH").count() == 0)
    // the move's one tx touches BOTH the vacated day-1 group (via the
    // tombstones) and the new day-2 group (via the inserted rows)
    spark.sql("UPDATE ivq.v SET ts = ts + INTERVAL '25' HOUR " +
      "WHERE code = 'BTC'")
    v.refresh()
    assert(rows(v.read()) == rows(full(st)))
    val days = v.read().where($"code" === "BTC")
      .select(org.apache.spark.sql.functions.date_format($"day", "yyyy-MM-dd"))
      .collect().map(_.getString(0)).toSet
    assert(days == Set("2022-01-02"), days.toString)
  }

  test("CONTENT-derived groups maintain incrementally via the pre-image " +
      "feed: an update moves a row between volume tiers (old tier " +
      "shrinks, new grows), a delete drops its old tier's contribution, " +
      "a vanished tier disappears — all equal to a full recompute") {
    val st = VersionedCandleStore(spark, tmpDir("ivct") + "/v")
    def tierView = new IncrementalView(spark, tmpDir("ivct-view"), st,
      Seq("tier" -> (col("volume") >= 50).cast("int")),
      Seq(count(lit(1)).as("n"), round(sum(col("close")), 4).as("sum_close")))
    def fullTier = st.scan()
      .select((col("volume") >= 50).cast("int").as("tier"), col("close"))
      .groupBy("tier")
      .agg(count(lit(1)).as("n"), round(sum(col("close")), 4).as("sum_close"))
    def tiers(df: DataFrame) = df.select("tier", "n", "sum_close")
      .collect().map(_.mkString("|")).toSet
    val v = tierView
    st.commit(Seq(c("BTC", "2022-01-01 10:00:00", 1, vol = 10),
      c("BTC", "2022-01-01 11:00:00", 2, vol = 80),
      c("ETH", "2022-01-02 09:00:00", 3, vol = 70)).toDF())
    v.refresh()
    assert(tiers(v.read()) == tiers(fullTier))
    // UPDATE moves 11:00 from the high tier to the low tier: without
    // the pre-image, the vacated high tier would keep its stale sum
    st.commit(Seq(c("BTC", "2022-01-01 11:00:00", 9, vol = 5)).toDF())
    v.refresh()
    assert(tiers(v.read()) == tiers(fullTier))
    assert(v.read().where($"tier" === 1).head().getAs[Long]("n") == 1L,
      "the high tier must have shrunk to ETH only")
    // DELETE the last high-tier row: the tier must VANISH — only the
    // tombstone's pre-image can name the group it leaves
    st.delete(Seq(("UPBIT", "ETH", 60, ts("2022-01-02 09:00:00")))
      .toDF("market", "code", "candle_length", "ts"))
    v.refresh()
    assert(tiers(v.read()) == tiers(fullTier))
    assert(v.read().where($"tier" === 1).count() == 0,
      "a tier whose every row died must vanish")
    // inserted-then-deleted inside ONE window: covered by the insert row
    st.commit(Seq(c("SOL", "2022-01-03 08:00:00", 4, vol = 90)).toDF())
    st.delete(Seq(("UPBIT", "SOL", 60, ts("2022-01-03 08:00:00")))
      .toDF("market", "code", "candle_length", "ts"))
    v.refresh()
    assert(tiers(v.read()) == tiers(fullTier))
    // compact floor past the watermark: full-recompute fallback stays exact
    st.commit(Seq(c("DOGE", "2022-01-04 08:00:00", 5, vol = 60)).toDF())
    st.compact()
    v.refresh()
    assert(tiers(v.read()) == tiers(fullTier))
  }

  test("changesSincePre emits the window's change rows plus ONE " +
      "window-start pre-image per touched key; never-pre consumers see " +
      "the unwidened schema") {
    val st = VersionedCandleStore(spark, tmpDir("ivpre") + "/v")
    st.commit(Seq(c("BTC", "2022-01-01 10:00:00", 1, vol = 10),
      c("ETH", "2022-01-02 09:00:00", 2, vol = 20)).toDF())  // tx 1
    st.commit(Seq(c("BTC", "2022-01-01 10:00:00", 5, vol = 50)).toDF()) // tx 2
    st.commit(Seq(c("BTC", "2022-01-01 10:00:00", 7, vol = 70), // tx 3
      c("SOL", "2022-01-03 08:00:00", 3, vol = 30)).toDF())
    // window (1, 3]: BTC updated twice, SOL inserted; ETH untouched
    val feed = st.changesSincePre(1L)
    assert(feed.columns.contains("_change_kind"))
    val pre = feed.where($"_change_kind" === "preimage")
      .select("code", "volume", "tx_id").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(pre == Seq(("BTC", 10.0, 1L)),
      s"one pre-image: BTC's tx-1 winner (SOL has no pre-window state); got $pre")
    val changes = feed.where($"_change_kind" === "change")
      .select("code", "tx_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(changes == Set(("BTC", 2L), ("BTC", 3L), ("SOL", 3L)), changes.toString)
    // a tombstoned-then-window key: its pre-image is the live old winner
    st.delete(Seq(("UPBIT", "ETH", 60, ts("2022-01-02 09:00:00")))
      .toDF("market", "code", "candle_length", "ts")) // tx 4
    val feed2 = st.changesSincePre(3L)
    val pre2 = feed2.where($"_change_kind" === "preimage")
      .select("code", "volume").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(pre2 == Seq(("ETH", 20.0)), pre2.toString)
    assert(feed2.where($"_change_kind" === "change" && $"_deleted")
      .select("code").collect().map(_.getString(0)).toSeq == Seq("ETH"))
    // a key whose pre-window winner was ALREADY a tombstone gets none
    st.commit(Seq(c("ETH", "2022-01-02 09:00:00", 8, vol = 80)).toDF()) // tx 5
    val feed3 = st.changesSincePre(4L)
    assert(feed3.where($"_change_kind" === "preimage").count() == 0,
      "a key dead at window start has no pre-image")
    // the DEFAULT feed schema is untouched by all of the above
    assert(!st.changesSince(1L).columns.contains("_change_kind"),
      "pre-images must never widen the default feed")
  }
}
