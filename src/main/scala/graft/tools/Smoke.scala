package graft.tools

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.model.Candle
import graft.store.CandleStore
import graft.ops.TimeSeries
import graft.llm.{Dedup, Similarity, TextStats}

/** End-to-end smoke drive of the public library surface against the
  * driver testdata. Run: `sbt "runMain graft.tools.Smoke [sfDir]"`.
  * Prints observable results; exits nonzero on any semantic violation.
  */
object Smoke {
  def ts(s: String): Timestamp = Timestamp.valueOf(s)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-smoke")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    var failures = 0
    def check(name: String, ok: Boolean, detail: => String = ""): Unit = {
      println(f"[smoke] $name%-40s ${if (ok) "OK" else "FAIL"} $detail")
      if (!ok) failures += 1
    }

    // --- CandleStore: upsert semantics (reference page/page.go:61-142) ---
    val dir = java.nio.file.Files.createTempDirectory("graft-smoke-store").toString
    val store = CandleStore(spark, s"$dir/candles")
    val b1 = Seq(
      Candle("UPBIT", "BTC", 60, ts("2021-12-31 23:59:00"), 1, 2, 0.5, 1.5, 10, 0),
      Candle("UPBIT", "BTC", 60, ts("2022-01-01 00:00:00"), 2, 3, 1.5, 2.5, 20, 0), // year split
      Candle("UPBIT", "ETH", 60, ts("2021-06-01 00:00:00"), 5, 6, 4.0, 5.5, 50, 0)
    ).toDF()
    store.upsert(b1)
    check("upsert initial rows", store.scan().count() == 3)
    check("year partition split",
      store.scan().select("year").distinct().as[Int].collect().sorted.sameElements(Array(2021, 2022)))

    // new-batch-wins on duplicate ts + late (past-date) insert accepted
    val b2 = Seq(
      Candle("UPBIT", "BTC", 60, ts("2021-12-31 23:59:00"), 100, 200, 50, 150, 99, 1), // overwrite
      Candle("UPBIT", "BTC", 60, ts("2021-01-05 00:00:00"), 7, 8, 6, 7.5, 70, 0)       // late row
    ).toDF()
    store.upsert(b2)
    val after = store.readPage("UPBIT", "BTC", 60, 2021).orderBy("ts")
    check("upsert count after merge", store.scan().count() == 4)
    check("new-batch-wins dedup",
      after.where($"ts" === ts("2021-12-31 23:59:00")).select("open").as[Double].head() == 100.0)
    check("late insert accepted",
      after.where($"ts" === ts("2021-01-05 00:00:00")).count() == 1)
    // idempotence
    store.upsert(b2)
    check("upsert idempotent", store.scan().count() == 4)
    // within-batch last-wins via ordinal
    val b3 = Seq(
      (0L, Candle("UPBIT", "BTC", 60, ts("2022-01-01 00:00:00"), 11, 11, 11, 11, 1, 0)),
      (1L, Candle("UPBIT", "BTC", 60, ts("2022-01-01 00:00:00"), 22, 22, 22, 22, 2, 0))
    ).toDF("ord", "c").select($"ord", $"c.*")
    store.upsert(b3, ordinalCol = Some("ord"))
    check("within-batch last-wins",
      store.readPage("UPBIT", "BTC", 60, 2022).select("open").as[Double].head() == 22.0)
    check("minMaxTs",
      store.minMaxTs("UPBIT", "BTC", 60, 2021).select("first_ts").as[Timestamp].head() == ts("2021-01-05 00:00:00"))
    val plan = store.readPage("UPBIT", "BTC", 60, 2021).queryExecution.executedPlan.toString
    // Assert the filter expressions actually landed INSIDE the scan's
    // PartitionFilters list (plan strings always contain the label, so a
    // bare contains() would be vacuous).
    val partFilters = "PartitionFilters: \\[[^\\]]*".r
      .findFirstIn(plan).getOrElse("")
    check("point lookup partition-prunes",
      partFilters.contains("year") && partFilters.contains("code"),
      s"filters=$partFilters")

    // --- TimeSeries ops on events ---
    val events = Tables.events(spark, sfDir)
    val candles = TimeSeries.candlesFromTicks(events, "ts", "value", None, Seq("event_type"), 3600)
    check("candlesFromTicks rows>0", candles.count() > 0)
    val oneH = candles.where($"event_type" === "click").orderBy("bucket").limit(1).select("high", "low")
      .as[(Double, Double)].head()
    check("candle high>=low", oneH._1 >= oneH._2)
    val re = TimeSeries.resampleCandles(
      candles.withColumn("ts", to_timestamp(from_unixtime($"bucket"))), "ts", 86400, Seq("event_type"))
    check("resample 1h->1d fewer rows", re.count() < candles.count() && re.count() > 0)
    val purchases = events.where($"event_type" === "purchase")
    val views = events.where($"event_type" === "view")
    val asof = TimeSeries.asofJoin(purchases, views, Seq("user_id"), "ts", "ts", Seq("value"))
    check("asofJoin row preservation", asof.count() == purchases.count())
    val sess = TimeSeries.sessionize(events, "ts", Seq("user_id"), 1800, Seq("event_id"))
    check("sessionize rows>0", sess.count() > 0)
    val cum = TimeSeries.dailyCumulativeCounts(events, "ts", Seq("event_type"))
    val cumCheck = cum.where($"event_type" === "click").orderBy("day")
      .select("day_count", "cum_before").as[(Long, Long)].collect()
    check("dailyCumulative prefix-sum",
      cumCheck.scanLeft(0L)(_ + _._1).init.sameElements(cumCheck.map(_._2)))

    // --- LLM ops on documents/embeddings ---
    val docs = Tables.documents(spark, sfDir)
    val stats = TextStats.documentStats(docs, "doc_id", "text")
    check("documentStats rows", stats.count() == docs.count())
    check("fingerprint in range",
      stats.agg(max(abs($"fingerprint"))).as[Long].head() < 1000000007L)
    val near = Dedup.minhashNearDupPairs(docs, "doc_id", "text", shingleN = 3, k = 32, bands = 8, threshold = 0.3)
    println(s"[smoke] minhash near-dup pairs: ${near.count()}")
    val sim = Dedup.simhashNearDupPairs(docs.limit(200), "doc_id", "text", maxHamming = 6)
    println(s"[smoke] simhash candidates: ${sim.count()}")
    val emb = Tables.embeddings(spark, sfDir)
    val queriesDf = emb.where($"vec_id" % 50 === 0)
    val topk = Similarity.bruteForceTopK(emb, queriesDf, "vec_id", "embedding", 5)
    check("bruteForceTopK k rows per query",
      topk.groupBy("query_id").count().agg(max("count")).as[Long].head() == 5)
    val lshTopk = Similarity.lshTopK(emb, queriesDf, "vec_id", "embedding", 5)
    // Statistical recall vs exact (informational — the testdata embeddings
    // are near-uniform random, so ANN recall is inherently data-limited).
    val exact = topk.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = lshTopk.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = if (exact.isEmpty) 0.0 else exact.intersect(approx).size.toDouble / exact.size
    println(f"[smoke] LSH ANN recall@5 vs exact (random data): $recall%.3f")
    // Planted-neighbor check: queries that are exact copies of corpus
    // vectors (new ids) land in the same LSH bucket, so the source vector
    // MUST come back as the top-1 neighbor with cosine 1.0.
    val planted = emb.where($"vec_id" < 20)
      .select(($"vec_id" + 100000).as("vec_id"), $"embedding")
    val plantedTop = Similarity.lshTopK(emb, planted, "vec_id", "embedding", 1)
    val found = plantedTop.where($"rank" === 1 &&
      $"neighbor_id" === $"query_id" - 100000 && $"score" >= 0.9999).count()
    check("LSH planted-neighbor top-1", found == 20, s"found=$found/20")

    // --- Round-2 additions: curation, indicators, interop, media ---
    val chunks = TextStats.chunkDocuments(docs, "doc_id", "text", 40, 10)
    check("chunkDocuments covers every doc",
      chunks.select("doc_id").distinct().count() == docs.count())
    check("chunk sizes bounded",
      chunks.agg(max("n_chunk_tokens")).as[Int].head() <= 40)
    val split = graft.llm.Sampling.hashSplit(docs, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    check("hashSplit partitions all docs",
      split.groupBy("split").count().agg(sum("count")).as[Long].head() == docs.count())
    val packed = graft.llm.Sampling.packGreedy(
      TextStats.documentStats(docs, "doc_id", "text"), "doc_id", "n_tokens", 256, 8)
    check("packGreedy preserves ids", packed.count() == docs.count())
    val dsir = graft.llm.Sampling.dsirWeights(
      docs, docs.where($"source".isin("src0", "src1", "src2")),
      "doc_id", "text", nBuckets = 1024)
    check("dsirWeights scores every raw doc", dsir.count() == docs.count())
    check("dsirSelect returns n most target-like",
      graft.llm.Sampling.dsirSelect(docs,
        docs.where($"source".isin("src0", "src1", "src2")),
        "doc_id", "text", n = 25, nBuckets = 1024).count() == 25)
    val keepBest = graft.llm.Dedup.dedupNearDupKeepBest(
      docs, "doc_id", "text", "n_chars", threshold = 0.3)
    val nKeepBest = keepBest.count() // one action: the CC loop is multi-job
    check("dedupNearDupKeepBest bounded by corpus",
      nKeepBest <= docs.count() && nKeepBest > 0)
    val novelty = Dedup.ngramNovelty(docs, "doc_id", "text", n = 5)
    check("ngramNovelty fractions in [0,1], novel <= total",
      novelty.where($"novelty_frac" < 0 || $"novelty_frac" > 1 ||
        $"n_novel" > $"n_grams").count() == 0 && novelty.count() > 0)
    val qc = graft.llm.Classifier.qualityClassifier(
      docs, docs.where($"doc_id" % 3 === 0), "doc_id", "text",
      nBuckets = 256, trainFrac = 0.5)
    check("qualityClassifier scores every doc with a probability",
      qc.count() == docs.count() &&
        qc.where($"quality_prob" < 0 || $"quality_prob" > 1).count() == 0)
    val ord = graft.llm.Sampling.trainOrder(docs, "doc_id", epochs = 2)
    check("trainOrder: epochs x corpus rows, positive positions",
      ord.count() == 2 * docs.count() && ord.where($"pos" < 1).count() == 0)
    val ws = graft.llm.Sampling.weightedSample(docs, "doc_id", "n_chars", k = 50)
    // priority = (hash % 1e9)/weight is legitimately 0 when the hash
    // divides 1e9 — zero is a valid race priority, only negative is a bug
    check("weightedSample draws exactly k with non-negative priorities",
      ws.count() == 50 && ws.where($"priority" < 0).count() == 0)
    val drift = graft.llm.Corpus.sourceDrift(docs, "text", "source")
    check("sourceDrift: one row per source, js in [0, ln 2]",
      drift.count() == docs.select($"source").distinct().count() &&
        drift.where($"js_div" < 0 || $"js_div" > math.log(2.0) + 1e-3)
          .count() == 0)
    val lfs = graft.llm.Sampling.leakageFreeSplit(docs, "doc_id", "text",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), threshold = 0.3)
    check("leakageFreeSplit assigns every doc exactly once",
      lfs.count() == docs.count() &&
        lfs.groupBy($"split_key").agg(countDistinct($"split").as("k"))
          .where($"k" > 1).count() == 0)
    val hnEmb = Tables.embeddings(spark, sfDir)
    val hn = Similarity.hardNegatives(hnEmb,
      hnEmb.where($"vec_id" % 50 === 0),
      "vec_id", "embedding", "label", k = 3)
    check("hardNegatives: k rows per query, no self matches",
      hn.groupBy($"query_id").count().agg(max("count")).head().getLong(0) <= 3 &&
        hn.where($"query_id" === $"neighbor_id").count() == 0 && hn.count() > 0)
    val cd = graft.llm.Corpus.labelCentroidDrift(hnEmb, "embedding", "label")
    check("labelCentroidDrift: one row per label, cosine in [-1, 1]",
      cd.count() > 0 &&
        cd.where($"centroid_cos" < -1 || $"centroid_cos" > 1).count() == 0)
    val wf = Dedup.winnowFingerprints(docs, "doc_id", "text", k = 5, window = 4)
    val nWinnow = wf.count()
    val nGrams = docs.select(sum(greatest(
      size(graft.llm.TextStats.tokens($"text")) - lit(4), lit(0))))
      .head().getLong(0)
    check("winnowFingerprints sparser than the gram stream, nonempty",
      nWinnow > 0 && nWinnow < nGrams)
    val qg = graft.llm.Sampling.quantileFilter(docs, "lang", "n_chars", p = 0.9)
    check("quantileFilter keeps a minority at/above threshold",
      qg.count() > 0 && qg.count() < docs.count() / 2 &&
        qg.where($"n_chars" < $"q_threshold").count() == 0)
    val sj = graft.llm.Corpus.sourceJaccard(docs, "text", "source")
    val nSrc = docs.select($"source").distinct().count()
    check("sourceJaccard: all unordered pairs, jaccard in [0,1]",
      sj.count() == nSrc * (nSrc - 1) / 2 &&
        sj.where($"jaccard" < 0 || $"jaccard" > 1 ||
          $"n_common" > least($"n_a", $"n_b")).count() == 0)
    val ind = TimeSeries.indicators(
      candles.withColumn("ts", to_timestamp(from_unixtime($"bucket")))
        .withColumnRenamed("event_type", "code"),
      "close", "ts", Seq("code"), n = 14)
    check("indicators donchian bounds close",
      ind.where($"close" > $"donchian_hi" || $"close" < $"donchian_lo").count() == 0)
    val emaOut = TimeSeries.ema(
      candles.withColumn("ts", to_timestamp(from_unixtime($"bucket")))
        .withColumnRenamed("event_type", "code"),
      "close", "ts", Seq("code"), alpha = 0.2)
    check("ema emits every row", emaOut.count() == candles.count())
    val ysfDir = java.nio.file.Files.createTempDirectory("graft-smoke-ysf").toString
    graft.sources.Ysf.write(store.scan().drop("year"), ysfDir)
    check("ysf round trip", graft.sources.Ysf.read(spark, ysfDir).count() == store.scan().count())
    check("ysf pruned read",
      graft.sources.Ysf.readSeries(spark, ysfDir, "UPBIT", 60, "ETH").count() == 1)
    // mora WAL interop: committed tx replays over pages, tail reported
    locally {
      import graft.sources.MoraWal
      val firstTs = store.scan()
        .where($"market" === "UPBIT" && $"code" === "ETH" && $"candle_length" === 60)
        .select(min($"ts")).head().getTimestamp(0)
      val sec = firstTs.getTime / 1000L
      val yr = java.time.Instant.ofEpochSecond(sec)
        .atZone(java.time.ZoneOffset.UTC).getYear
      MoraWal.writeLog(spark, s"$ysfDir/wal/wal.1.log", Seq(
        MoraWal.WalInsert(500L, "UPBIT", "ETH", 60, yr,
          Seq(MoraWal.WalCandle(sec, 77.0, 78.0, 76.0, 77.5, 770.0, 0L))),
        MoraWal.WalCommit(500L),
        MoraWal.WalInsert(501L, "UPBIT", "ETH", 60, yr,
          Seq(MoraWal.WalCandle(sec, -1.0, -1.0, -1.0, -1.0, -1.0, 0L)))))
      val migrated = MoraWal.migrateFromMora(spark, ysfDir,
        java.nio.file.Files.createTempDirectory("graft-smoke-walstore").toString + "/s")
      check("mora WAL migrate: committed correction wins, row count kept",
        migrated.scan().count() == store.scan().count() &&
          migrated.scan().where($"ts" === firstTs && $"code" === "ETH")
            .select($"open").head().getDouble(0) == 77.0)
      check("mora WAL migrate: uncommitted tail reported, not applied",
        MoraWal.uncommittedTail(spark, s"$ysfDir/wal").count() == 1)
    }
    implicit val sp: SparkSession = spark
    val media = docs.limit(20).select($"doc_id",
      graft.llm.Multimodal.syntheticPngUdf($"doc_id").as("payload"))
    val feats = graft.llm.Multimodal.decodeImageFeatures(media, "doc_id", "payload")
    check("real PNG decode features", feats.where(
      $"width" =!= lit(16) + pmod($"doc_id", lit(16)).cast("int")).count() == 0)

    // --- Round-4 additions: retrieval scoring, span dedup, PQ, spectra ---
    val bm = graft.llm.Ranking.bm25(docs, "doc_id", "text", Seq("join", "vector", "slow"))
    check("bm25 scores matching docs only", bm.count() > 0 && bm.count() <= docs.count())
    val spans = Dedup.duplicatedSpans(docs, "doc_id", "text", widthWords = 8)
    check("duplicatedSpans n_docs>=2", spans.where($"n_docs" < 2).count() == 0)
    // Falsifiable decontamination gate: run over the FULL corpus so the
    // benchmark slice's own docs are planted 100%-overlap contamination —
    // every one must be flagged (a no-op decontaminate fails this).
    val benchSlice = docs.where($"doc_id" % 50 === 0)
    val decon = Dedup.decontaminate(docs, benchSlice, "doc_id", "text", shingleN = 5)
    check("decontaminate flags every planted benchmark overlap",
      decon.where($"doc_id" % 50 === 0 && $"n_contaminated" >= 1).count() ==
        benchSlice.count())
    val capped = graft.llm.Sampling.capPerKey(docs, "doc_id", "source", 20)
    check("capPerKey bound holds",
      capped.groupBy("source").count().agg(max("count")).as[Long].head() <= 20)
    val semPairs = Similarity.semanticNearDupPairs(
      emb.select("vec_id", "embedding").unionByName(emb.where($"vec_id" < 10)
        .select(($"vec_id" + 100000).as("vec_id"), $"embedding")),
      "vec_id", "embedding", minCosine = 0.999, nClusters = 8, iters = 2)
    check("semDeDup finds planted copies", semPairs.count() >= 10)
    val pq = Similarity.pqTopK(emb, queriesDf, "vec_id", "embedding", k = 5,
      m = 4, ks = 16, iters = 2, rerank = 20)
    check("pqTopK k rows per query",
      pq.groupBy("query_id").count().agg(max("count")).as[Long].head() == 5)
    val blm = graft.llm.TextStats.bigramLmScore(docs, "doc_id", "text")
    check("bigramLm scores multi-token docs", blm.count() > 0 && blm.count() <= docs.count())
    val phashMedia = docs.limit(60).select($"doc_id",
      graft.llm.Multimodal.syntheticTexturedPngUdf($"doc_id").as("payload"))
    val ph = graft.llm.Multimodal.imagePerceptualHash(phashMedia, "doc_id", "payload")
    check("phash groups by pattern", ph.select("phash").distinct().count() ==
      ph.select(pmod($"doc_id", lit(30))).distinct().count())
    val wavMedia = docs.limit(16).select($"doc_id",
      graft.llm.Multimodal.syntheticWavUdf($"doc_id").as("payload"))
    val spectra = graft.llm.Multimodal.wavDominantFrequency(wavMedia, "doc_id", "payload")
    check("wav spectral fundamental", spectra.where(
      $"dominant_bin" =!= lit(400) / element_at(
        typedLit(graft.llm.Multimodal.WavHalfPeriods.toSeq),
        pmod($"doc_id", lit(8)).cast("int") + 1)).count() == 0)

    val vst = graft.store.VersionedCandleStore(spark,
      java.nio.file.Files.createTempDirectory("graft-smoke-vstore").toString + "/v")
    vst.commit(b1, committedAt = Some(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
    vst.commit(b2, committedAt = Some(java.sql.Timestamp.valueOf("2024-01-02 00:00:00")))
    check("versioned store as-of tx1 != latest",
      vst.scanAsOf(1L).count() == 3 && vst.scan().count() == 4 && vst.latestTxId == 2L)

    // --- Round-5 additions: time travel, IVFADC, lang model, curation ---
    check("versioned store wall-clock time travel",
      vst.scanAsOfTime(java.sql.Timestamp.valueOf("2024-01-01 12:00:00")).count() == 3 &&
        vst.vacuum() == 0) // nothing torn; young-file guard holds
    val ivfpq = Similarity.ivfPqTopK(emb, queriesDf, "vec_id", "embedding", k = 5,
      nCells = 8, nProbe = 2, m = 4, ks = 8, iters = 2, rerank = 20)
    check("ivfPqTopK k rows per query",
      ivfpq.groupBy($"query_id").count().where($"count" =!= 5).count() == 0)
    val langPred = Seq("she walked to the market and bought some bread",
      "er ging mit dem hund durch den park und über die brücke")
      .toDF("text").select(graft.llm.TextStats.langIdNgramUdf($"text")).as[String].collect()
    check("char-trigram language id", langPred.toSeq == Seq("en", "de"))
    check("nfc normalization composes", Seq("e\u0301cole").toDF("t")
      .select(graft.llm.TextStats.nfcNormalizeUdf($"t")).as[String].head() == "\u00e9cole")
    val curated = graft.llm.Curation.standardPipeline(
      docs.where($"doc_id" % 50 =!= 0), docs.where($"doc_id" % 50 === 0),
      budgets = Map("src0" -> 2000L), defaultBudget = 4000L)
    check("curation pipeline survivors within budget",
      curated.count() > 0 && curated.where($"cum_tokens" >
        when($"source" === "src0", 2000L).otherwise(4000L)).count() == 0)
    val z3 = graft.ops.ZOrder.clusterN(
      docs.limit(64).select(($"doc_id" % 16).as("x"), ($"doc_id" % 7).as("y"),
        ($"doc_id" % 3).as("w")), Seq("x", "y", "w"), nFiles = 4)
    check("3-D z-order clusters", z3.count() == 64)

    // --- Round-6 additions: SQL reader surface, journal rollup ---
    val dsRead = spark.read.format("graft-vstore")
      .option("asOfTime", "2024-01-01 12:00:00").load(vst.path)
    check("graft-vstore reader TIMESTAMP AS OF",
      dsRead.count() == 3 &&
        spark.read.format("graft-vstore").load(vst.path).count() == 4)
    val ck = vst.checkpointJournal()
    check("journal checkpoint rolls up and stays exact",
      ck == vst.latestTxId && vst.txLog().count() == 2 && vst.scan().count() == 4)

    // --- Round-8 additions: cross-corpus dedup, grouped pushdown ---
    val xPairs = Dedup.crossCorpusNearDupPairs(
      docs.where($"doc_id" % 2 === 1), docs.where($"doc_id" % 2 === 0),
      "doc_id", "text", threshold = 0.3)
    check("crossCorpusNearDupPairs emits only opposite-parity pairs",
      xPairs.where($"hist_id" % 2 =!= 0 || $"new_id" % 2 =!= 1).count() == 0)
    val catalog = spark.read.format("graft-vstore").load(vst.path)
      .groupBy($"code").agg(max($"ts").as("mx"), count(lit(1)).as("n"))
    check("vstore grouped pushdown serves the catalog listing",
      catalog.queryExecution.optimizedPlan.toString.contains("max_ts") &&
        catalog.count() >= 1)
    // catalog plugin: stores as SQL names, catalog-resolved time travel
    spark.conf.set("spark.sql.catalog.gvsmoke",
      classOf[graft.sources.VStoreCatalog].getName)
    spark.conf.set("spark.sql.catalog.gvsmoke.base",
      new java.io.File(vst.path).getParent)
    val vname = new java.io.File(vst.path).getName
    check("vstore catalog resolves SQL names + VERSION AS OF",
      spark.sql(s"SELECT * FROM gvsmoke.`$vname`").count() == 4 &&
        spark.sql(s"SELECT * FROM gvsmoke.`$vname` VERSION AS OF 1").count() ==
          vst.scanAsOf(1L).count())

    // --- Round-11 addition: cross-store atomic transaction ---
    {
      import graft.store.{CandleStore => CS, CrossStoreTx, VersionedCandleStore => VS}
      val base = java.nio.file.Files.createTempDirectory("smoke-xtx").toString
      val cs = CS(spark, s"$base/c"); val vs = VS(spark, s"$base/v")
      val b1 = Seq(("UPBIT", "BTC", 60, java.sql.Timestamp.valueOf("2022-01-01 10:00:00"),
        1.0, 2.0, 0.5, 1.5, 10.0, 0L)).toDF(
        "market", "code", "candle_length", "ts", "open", "high", "low",
        "close", "volume", "bit_fields")
      val toks = CrossStoreTx.execute(spark, s"$base/txs", "smoke-1",
        Seq(CrossStoreTx.CandleUpsert(cs, b1), CrossStoreTx.VersionedCommit(vs, b1)))
      val replay = CrossStoreTx.execute(spark, s"$base/txs", "smoke-1",
        Seq(CrossStoreTx.CandleUpsert(cs, b1), CrossStoreTx.VersionedCommit(vs, b1)))
      check("cross-store tx atomic on both stores, name replay exactly-once",
        cs.scan().count() == 1 && vs.scan().count() == 1 &&
          toks == replay && vs.txLog().where($"kind" === "commit").count() == 1)
    }

    println(if (failures == 0) "[smoke] ALL OK" else s"[smoke] $failures FAILURES")
    spark.stop()
    if (failures > 0) sys.exit(1)
  }
}
