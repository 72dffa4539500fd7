package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.llm.Similarity

/** ANN recall soak ACROSS CORPUS SIZES (`AnnScaleCheck [n1 n2 …]`,
  * default 20k and 200k — 10× and 100× the oracle fixture): the q79/q83
  * recall gates measure at ≤ sf0.1, which leaves open whether the
  * documented parameter derivation actually holds the recall floor as
  * the corpus grows. This drives it: synthetic clustered corpora
  * (64 true centers + OVERLAPPING Gaussian noise — sigma sized so
  * routing genuinely binds instead of gifting recall 1.0; fully
  * deterministic, seeded JVM RNG per id, no Spark RNG partition
  * dependence), ground truth by
  * brute force on a 100-query sample, and IVFADC with the derivation's
  * scaling applied — `nCells ∝ corpus` (constant per-cell occupancy, so
  * each probe scans a constant share), `nProbe = nCells/4` (constant
  * probe ratio ⇒ routing recall holds), `rerank` derived (the
  * `RerankFraction × nProbe × |corpus| / nCells` rule — constant per
  * query once nCells tracks the corpus). Pass = recall@10 ≥ 0.7 at
  * every size (the q83 floor). Results land in BASELINE.md.
  */
object AnnScaleCheck {
  private val Dim = 32
  private val Clusters = 64

  def main(args: Array[String]): Unit = {
    val sizes = {
      val ns = args.flatMap(_.toLongOption)
      if (ns.nonEmpty) ns.toSeq else Seq(20000L, 200000L)
    }
    val spark = GraftSession.builder(appName = "graft-annscale").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val centers: Array[Array[Float]] = Array.tabulate(Clusters) { c =>
      val r = new java.util.Random(9000L + c)
      Array.fill(Dim)(r.nextGaussian().toFloat)
    }
    val gen = udf { (id: Long) =>
      val r = new java.util.Random(id * 2654435761L + 17)
      val base = centers((id % Clusters).toInt)
      Array.tabulate(Dim)(j => base(j) + 0.9f * r.nextGaussian().toFloat).toSeq
    }

    for (n <- sizes) {
      val corpus = spark.range(n)
        .select(col("id").as("vec_id"), gen(col("id")).as("embedding"))
        .repartition(32).localCheckpoint()
      val step = math.max(n / 100, 1L)
      val queries = corpus.where(col("vec_id") % step === 0)
      val exact = Similarity.bruteForceTopK(corpus, queries,
          "vec_id", "embedding", k = 10)
        .select("query_id", "neighbor_id").localCheckpoint()
      val total = exact.count()
      // derivation scaling: cells track the corpus, probe ratio constant
      val nCells = math.max(32, (32L * n / 20000L).toInt)
      val nProbe = math.max(8, nCells / 4)
      val t0 = System.nanoTime()
      val approx = Similarity.ivfPqTopK(corpus, queries, "vec_id", "embedding",
        k = 10, nCells = nCells, nProbe = nProbe, m = 8, ks = 256, iters = 4,
        sampleMod = 4)
      val hit = exact.join(approx.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id"), "left_semi").count()
      val sec = (System.nanoTime() - t0) / 1e9
      val recall = hit.toDouble / total
      println(f"[annscale] n=$n nCells=$nCells nProbe=$nProbe " +
        f"recall@10=$recall%.3f ($hit/$total) sec=$sec%.1f")
      require(recall >= 0.7,
        f"IVFADC recall@10=$recall%.3f fell below the 0.7 floor at corpus size $n " +
          "— the nCells/nProbe/rerank derivation does not hold at this scale")
      // SUBLINEAR-PROBE derivation — the 100×-decade answer to q9Z's
      // measured linearity: a fixed nlist (or a constant nProbe/nlist
      // ratio) scans Θ(N) per probe, but nlist ∝ √N with nProbe ∝
      // √nlist scans ~N^(3/4) ROWS PER PROBE. The gate is recall ≥ the
      // same 0.7 floor at every size under that shrinking probe SHARE —
      // evidence that the linear exponent is a parameter point, not a
      // structural property of the cell-partitioned index. The point
      // tested is EXACTLY the shipped operator derivation
      // (Similarity.sqrtIvfParams — the targetCorpusSize hint on
      // ivfTopK/ivfPqTopK and the reshardIvfPqIndex cell count).
      val (sCells, sProbe) = Similarity.sqrtIvfParams(n)
      val scanned = sProbe.toLong * n / sCells
      val t0s = System.nanoTime()
      val approxS = Similarity.ivfPqTopK(corpus, queries, "vec_id", "embedding",
        k = 10, m = 8, ks = 256, iters = 4, sampleMod = 4,
        targetCorpusSize = n)
      val hitS = exact.join(approxS.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id"), "left_semi").count()
      val secS = (System.nanoTime() - t0s) / 1e9
      val recallS = hitS.toDouble / total
      println(f"[annscale] n=$n SQRT-derivation nCells=$sCells nProbe=$sProbe " +
        f"scanned-rows/probe~$scanned (share ${sProbe.toDouble / sCells}%.3f) " +
        f"recall@10=$recallS%.3f ($hitS/$total) sec=$secS%.1f")
      require(recallS >= 0.7,
        f"SQRT-derivation recall@10=$recallS%.3f fell below the 0.7 floor at " +
          s"corpus size $n — sublinear probing does not hold here")
      // derived-beats-fixture gate: against the FIXTURE LITERAL point
      // (nCells=16 / nProbe=4 — the frozen first-batch parameterization
      // q9Z measured linear), the √N derivation must scan strictly
      // fewer rows per query at 10×+ the oracle fixture while holding
      // the same recall floor — the reason the hint exists.
      val fixtureScanned = 4L * n / 16
      val t0f = System.nanoTime()
      val approxF = Similarity.ivfPqTopK(corpus, queries, "vec_id", "embedding",
        k = 10, nCells = 16, nProbe = 4, m = 8, ks = 256, iters = 4,
        sampleMod = 4)
      val hitF = exact.join(approxF.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id"), "left_semi").count()
      val secF = (System.nanoTime() - t0f) / 1e9
      println(f"[annscale] n=$n FIXTURE-point nCells=16 nProbe=4 " +
        f"scanned-rows/probe~$fixtureScanned recall@10=${hitF.toDouble / total}%.3f " +
        f"($hitF/$total) sec=$secF%.1f")
      // at ~10× the two points cross over (≈ equal scan width); the
      // strict win is gated from 50× up, where the N^(3/4) law has a
      // decade to pull away
      if (n >= 100000L)
        require(scanned < fixtureScanned,
          s"derived point scans $scanned rows/query vs the fixture point's " +
            s"$fixtureScanned at corpus size $n — the √N derivation should " +
            "strictly shrink the probe share past the crossover")
      // hard-negative mining at the same derivation point: label =
      // (id/Clusters) % 8 is uniform within each cluster, ground truth
      // by the exact broadcast path on the same 100-query sample.
      // hardNegativesIvf reranks probed cells with exact cosine, so its
      // recall is routing recall — gate at the same 0.7 floor.
      val lc = corpus.withColumn("label",
        ((col("vec_id") / Clusters).cast("long") % 8).cast("int"))
        .localCheckpoint()
      val lq = lc.where(col("vec_id") % step === 0)
      val exactHn = Similarity.hardNegatives(lc, lq,
          "vec_id", "embedding", "label", k = 10)
        .select("query_id", "neighbor_id").localCheckpoint()
      val hnTotal = exactHn.count()
      val t1 = System.nanoTime()
      val approxHn = Similarity.hardNegativesIvf(lc, lq,
        "vec_id", "embedding", "label", k = 10,
        nCells = nCells, nProbe = nProbe, iters = 4)
      val hnHit = exactHn.join(approxHn.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id"), "left_semi").count()
      val hnSec = (System.nanoTime() - t1) / 1e9
      val hnRecall = hnHit.toDouble / hnTotal
      println(f"[annscale] n=$n hardNegativesIvf recall@10=$hnRecall%.3f " +
        f"($hnHit/$hnTotal) sec=$hnSec%.1f")
      require(hnRecall >= 0.7,
        f"hardNegativesIvf recall@10=$hnRecall%.3f fell below the 0.7 floor " +
          s"at corpus size $n")
      // streamed IVF index at the same derivation point: centroids
      // train on the FIRST of 5 arrival slices then freeze; the
      // stream-built cell state must EQUAL the batch assignment under
      // the stored centroids (deterministic), and probing the
      // accumulated state must hold the recall floor even though the
      // quantizer never saw 4/5 of the corpus.
      import spark.implicits._
      val idxDir = java.nio.file.Files
        .createTempDirectory("annscale-ivfidx").toString
      val t2 = System.nanoTime()
      (0 until 5).foreach { i =>
        graft.streaming.Ingest.ivfIndexBatch(
          corpus.where(col("vec_id") % 5 === i), i.toLong, idxDir,
          "vec_id", "embedding", nCells = nCells, iters = 4)
      }
      val buildSec = (System.nanoTime() - t2) / 1e9
      val cents = spark.read.parquet(s"$idxDir/centroids/batch_0")
        .select(col("cell_id"), col("centroid"))
        .as[(Long, Array[Double])].collect().sortBy(_._1)
      val streamedAsg = graft.streaming.Ingest.ivfCellState(spark, idxDir)
        .select(col("cell_id"), col("id"))
      val batchAsg = corpus.select(
        Similarity.ivfAssignUdf(cents)(col("embedding")).as("cell_id"),
        col("vec_id").as("id"))
      val asgDiff = streamedAsg.exceptAll(batchAsg)
        .unionAll(batchAsg.exceptAll(streamedAsg)).count()
      require(asgDiff == 0L,
        s"stream-built IVF state diverged from the batch assignment " +
          s"($asgDiff rows) at corpus size $n")
      val t3 = System.nanoTime()
      val idxTopK = graft.streaming.Ingest.ivfIndexTopK(spark, idxDir,
        queries, "vec_id", "embedding", k = 10, nProbe = nProbe)
      val idxHit = exact.join(idxTopK.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id"), "left_semi").count()
      val idxSec = (System.nanoTime() - t3) / 1e9
      val idxRecall = idxHit.toDouble / total
      println(f"[annscale] n=$n streamedIvfIndex build=$buildSec%.1f s " +
        f"recall@10=$idxRecall%.3f ($idxHit/$total) query=$idxSec%.1f s")
      require(idxRecall >= 0.7,
        f"streamed-IVF-index recall@10=$idxRecall%.3f fell below the 0.7 " +
          s"floor at corpus size $n — first-batch centroid training does " +
          "not hold the derivation at this scale")
      graft.GraftSession.deleteRecursively(java.nio.file.Paths.get(idxDir))
      org.apache.spark.sql.graft.ColumnBridge.unpersistCheckpoint(lc)
      org.apache.spark.sql.graft.ColumnBridge.unpersistCheckpoint(exactHn)
      org.apache.spark.sql.graft.ColumnBridge.unpersistCheckpoint(corpus)
      org.apache.spark.sql.graft.ColumnBridge.unpersistCheckpoint(exact)
    }
    spark.stop()
  }
}
