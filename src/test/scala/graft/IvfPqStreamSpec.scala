package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._

import graft.llm.Similarity
import graft.streaming.Ingest

/** The 100 TB posture of the STREAM-BUILT ANN state (SURVEY.md §2.5,
  * round-10): cell-partitioned state dirs so probes prune at the file
  * level, and the byte-coded PQ variant whose state stores m-byte
  * residual codes instead of raw vectors (reference precedent: the
  * page store's partition-pruned point reads, `candle/store.go` year
  * split — the same "address state by its probe key" discipline).
  */
class IvfPqStreamSpec extends SparkSpec {
  import spark.implicits._

  /** 4 tight direction clusters in 8 dims; ids interleave clusters so
    * every micro-batch slice sees all of them.
    */
  private def vec(id: Long): Seq[Float] = {
    val c = (id % 4).toInt
    (0 until 8).map { j =>
      val base = if (j % 4 == c) 1f else 0f
      base + 0.01f * (((id * 13 + j * 7) % 9) - 4)
    }
  }

  private def batchDf(ids: Seq[Long]): DataFrame =
    ids.map(i => (i, vec(i))).toDF("vec_id", "embedding")

  /** Every FileSourceScan in an executed plan, descending through AQE
    * wrappers and materialized query stages (plain `collect` stops at
    * their leaf boundary).
    */
  private def fileScans(p: SparkPlan): Seq[FileSourceScanExec] = {
    val here = p match {
      case s: FileSourceScanExec => Seq(s)
      case a: AdaptiveSparkPlanExec => fileScans(a.executedPlan)
      case q: QueryStageExec => fileScans(q.plan)
      case _ => Seq.empty
    }
    here ++ p.children.flatMap(fileScans) ++ p.subqueries.flatMap(fileScans)
  }

  private def parquetFilesUnder(dir: java.io.File): Seq[java.io.File] =
    if (!dir.exists()) Seq.empty
    else {
      val (dirs, files) = dir.listFiles().toSeq.partition(_.isDirectory)
      files.filter(f => f.getName.endsWith(".parquet") && f.length() > 0) ++
        dirs.flatMap(parquetFilesUnder)
    }

  test("probed-cell pruning: ivfIndexTopK's state scans carry a cell_id " +
      "partition filter and read ONLY the probed cell's files") {
    val stateDir = tmpDir("ivf-prune")
    val batches = (0L until 240L).grouped(80).toSeq
    for ((b, i) <- batches.zipWithIndex)
      Ingest.ivfIndexBatch(batchDf(b), i.toLong, stateDir,
        "vec_id", "embedding", nCells = 4, iters = 4)
    val cents = spark.read.parquet(s"$stateDir/centroids/batch_0")
      .select(col("cell_id"), col("centroid"))
      .as[(Long, Array[Double])].collect().sortBy(_._1)
    val queries = batchDf(Seq(1000L)) // cluster 0-aligned probe
    val res = Ingest.ivfIndexTopK(spark, stateDir, queries,
      "vec_id", "embedding", k = 5, nProbe = 1)
    assert(res.collect().length == 5)
    // expected: exactly the files under the probed cell's partition
    // dirs, across all three batch dirs
    val probed = queries
      .select(explode(Similarity.ivfProbeUdf(cents, 1)(col("embedding"))).as("c"))
      .as[Long].collect().toSet
    assert(probed.size == 1, s"nProbe=1 must probe one cell: $probed")
    val allFiles = parquetFilesUnder(new java.io.File(s"$stateDir/cells"))
    val probedFiles = allFiles.filter(f =>
      probed.exists(p => f.getPath.contains(s"cell_id=$p/")))
    assert(probedFiles.nonEmpty && probedFiles.size < allFiles.size,
      s"fixture degenerate: ${probedFiles.size}/${allFiles.size} files probed")
    val scans = fileScans(res.queryExecution.executedPlan)
      .filter(_.metadata.getOrElse("Location", "").contains("/cells/"))
    assert(scans.nonEmpty, "no cells-state FileSourceScan found in the plan")
    scans.foreach { s =>
      val pf = s.metadata.getOrElse("PartitionFilters", "")
      assert(pf.contains("cell_id"),
        s"cell_id partition filter not pushed to the state scan: $pf")
    }
    val scanned = scans.map(_.metrics("numFiles").value).sum
    assert(scanned == probedFiles.size.toLong,
      s"probe scanned $scanned files, expected ONLY the ${probedFiles.size} " +
        s"probed-cell files (state total ${allFiles.size})")
  }

  test("streamed PQ index: codes byte-identical to the batch encoding " +
      "under the frozen quantizers at every boundary; compaction + retry " +
      "exact; state rows are (cell_id, id, m-byte code) only") {
    val m = 4; val ks = 16
    val stateDir = tmpDir("pqidx")
    val batches = (0L until 240L).grouped(80).toSeq
    def readQuantizers(): (Array[(Long, Array[Double])], Array[Array[Array[Double]]]) = {
      val cents = spark.read.parquet(s"$stateDir/centroids/batch_0")
        .select(col("cell_id"), col("centroid"))
        .as[(Long, Array[Double])].collect().sortBy(_._1)
      val rows = spark.read.parquet(s"$stateDir/books/batch_0")
        .select(col("s"), col("c"), col("vals"))
        .as[(Int, Int, Array[Double])].collect()
      val books = Array.ofDim[Array[Double]](m, ks)
      rows.foreach { case (s, c, v) => books(s)(c) = v }
      (cents, books)
    }
    def assertCensus(upTo: Int): Unit = {
      val (cents, books) = readQuantizers()
      val streamed = Ingest.ivfPqCodeState(spark, stateDir)
        .select(col("cell_id"), col("id"), col("code"))
      val expect = Similarity.encodeIvfPq(
        batchDf(batches.take(upTo + 1).flatten), "vec_id", "embedding",
        cents, books, m, ks)
      val diff = streamed.exceptAll(expect)
        .unionAll(expect.exceptAll(streamed)).count()
      assert(diff == 0L, s"boundary $upTo: $diff code rows diverge")
    }
    for ((b, i) <- batches.zipWithIndex) {
      Ingest.ivfPqIndexBatch(batchDf(b), i.toLong, stateDir,
        "vec_id", "embedding", nCells = 4, iters = 4, m = m, ks = ks)
      assertCensus(i)
    }
    // slim state: only (id, code) in the files + the cell_id dir key,
    // code exactly m bytes
    val state = Ingest.ivfPqCodeState(spark, stateDir)
    assert(state.columns.toSet == Set("cell_id", "id", "code"),
      state.columns.mkString(","))
    val lens = state.agg(min(length(col("code"))), max(length(col("code")))).head()
    assert(lens.getInt(0) == m && lens.getInt(1) == m,
      s"codes must be exactly $m bytes: $lens")
    // compaction keeps the layout + stays exact; boundary-batch retry
    // converges
    Ingest.compactIvfPqIndexState(spark, stateDir, 2L)
    assert(new java.io.File(s"$stateDir/codes/compact_upto_2").listFiles()
      .exists(_.getName.startsWith("cell_id=")),
      "compacted codes generation lost the cell_id=N/ layout")
    Ingest.ivfPqIndexBatch(batchDf(batches(2)), 2L, stateDir,
      "vec_id", "embedding", nCells = 4, iters = 4, m = m, ks = ks)
    assertCensus(2)
    // serving: probes prune (partition filter) and exact rerank from
    // the SOURCE recovers the clustered neighbors
    val corpus = batchDf(batches.flatten)
    val queries = batchDf(Seq(1000L, 1001L))
    // rerank widened past the cell population: this fixture's residuals
    // are near-ties the 4×16 codebook cannot order, so a narrower ADC
    // heap would drop true neighbors arbitrarily — recall QUALITY under
    // the derived width is q9Z's gate on the real corpus; this spec
    // gates the serving plumbing (prune → ADC → exact rerank)
    val got = Ingest.ivfPqIndexTopK(spark, stateDir, queries, corpus,
      "vec_id", "embedding", k = 10, nProbe = 1, rerank = 100)
    got.localCheckpoint()
    // tie-tolerant recall: this fixture's clusters are near-ties at
    // round-4 cosine, so id-sets are ambiguous — assert every returned
    // neighbor scores at least the query's exact 10th-best cosine
    // (got.score IS the exact cosine: the rerank is exact by design)
    val exact = Similarity.bruteForceTopK(corpus, queries,
      "vec_id", "embedding", k = 10)
    val floor10 = exact.groupBy("query_id").agg(min(col("score")).as("s10"))
    val genuine = got.join(floor10, Seq("query_id"))
      .where(col("score") >= col("s10")).count()
    assert(genuine == 20,
      s"PQ stream top-10 below the exact 10th-best cosine: $genuine/20")
    val scans = fileScans(got.queryExecution.executedPlan)
      .filter(_.metadata.getOrElse("Location", "").contains("/codes/"))
    assert(scans.nonEmpty && scans.forall(
      _.metadata.getOrElse("PartitionFilters", "").contains("cell_id")),
      "cell_id partition filter not pushed to the codes-state scan")
  }

  test("mixed-layout compaction: a LEGACY flat per-batch dir (cell_id a " +
      "long data column) and partitioned cell_id=N/ dirs compact into one " +
      "identical partitioned generation") {
    val stateDir = tmpDir("ivf-mixed")
    // batch 0 via the normal path (trains + freezes the centroids) …
    Ingest.ivfIndexBatch(batchDf(0L until 80L), 0L, stateDir,
      "vec_id", "embedding", nCells = 4, iters = 4)
    // … then rewritten to the PRE-round-10 FLAT layout: one unpartitioned
    // parquet dir whose cell_id is a LONG data column
    val legacy = Ingest.readCellState(spark, Seq(s"$stateDir/cells/batch_0"))
      .select(col("cell_id"), col("id"), col("vec")).collect()
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(stateDir), spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$stateDir/cells/batch_0"), true)
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(legacy.toSeq.asJava,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("cell_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("vec",
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.FloatType)))))
      .coalesce(1).write.parquet(s"$stateDir/cells/batch_0")
    assert(!new java.io.File(s"$stateDir/cells/batch_0").listFiles()
      .exists(_.getName.startsWith("cell_id=")), "fixture must be FLAT")
    // batch 1 lands partitioned — the state is now mixed-layout
    Ingest.ivfIndexBatch(batchDf(80L until 160L), 1L, stateDir,
      "vec_id", "embedding", nCells = 4, iters = 4)
    def census(): Set[(Long, Long)] =
      Ingest.ivfCellState(spark, stateDir)
        .select(col("cell_id"), col("id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val before = census()
    assert(before.size == 160, s"${before.size}")
    Ingest.compactIvfIndexState(spark, stateDir, 2L)
    assert(new java.io.File(s"$stateDir/cells/compact_upto_2").listFiles()
      .exists(_.getName.startsWith("cell_id=")),
      "compacted generation lost the cell_id=N/ layout")
    assert(census() == before,
      "mixed-layout compaction changed the (cell_id, id) census")
    // probes over the compacted state still answer and still prune
    val res = Ingest.ivfIndexTopK(spark, stateDir, batchDf(Seq(1000L)),
      "vec_id", "embedding", k = 5, nProbe = 1)
    assert(res.collect().length == 5)
    val scans = fileScans(res.queryExecution.executedPlan)
      .filter(_.metadata.getOrElse("Location", "").contains("/cells/"))
    assert(scans.nonEmpty && scans.forall(
      _.metadata.getOrElse("PartitionFilters", "").contains("cell_id")))
  }

  test("PQ state is an order-of-magnitude slimmer on disk than the raw-" +
      "vector state over the same 64-dim stream") {
    // 64-dim vectors (the testdata width): raw state carries 64 floats
    // + parquet framing per row; PQ state m=8 bytes + id. Assert the
    // honest on-disk ratio, not just the schema.
    def wideVec(id: Long): Seq[Float] = {
      val c = (id % 4).toInt
      (0 until 64).map { j =>
        val base = if (j % 4 == c) 1f else 0f
        // 64k-valued hash jitter: keeps the float leaves incompressible
        // (a coarse 9-value jitter dictionary-encodes to ~7 B/vector
        // and would understate the raw state honestly measured here)
        val h = (id * 2654435761L + j * 40503L) & 0xFFFFL
        base + (h.toFloat / 65536f - 0.5f) * 0.02f
      }
    }
    val df = (0L until 3000L).map(i => (i, wideVec(i))).toDF("vec_id", "embedding")
    val rawDir = tmpDir("state-raw"); val pqDir = tmpDir("state-pq")
    Ingest.ivfIndexBatch(df, 0L, rawDir, "vec_id", "embedding",
      nCells = 4, iters = 2)
    Ingest.ivfPqIndexBatch(df, 0L, pqDir, "vec_id", "embedding",
      nCells = 4, iters = 2, m = 8, ks = 64)
    def bytes(dir: String): Long =
      parquetFilesUnder(new java.io.File(dir)).map(_.length()).sum
    val raw = bytes(s"$rawDir/cells"); val pq = bytes(s"$pqDir/codes")
    assert(pq * 5 < raw,
      s"PQ state ($pq B) not slimmer than 1/5 of raw state ($raw B) " +
        "for 3000 64-dim vectors")
  }
}
