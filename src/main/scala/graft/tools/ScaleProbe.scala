package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession

/** 10× corpus scale probe (`ScaleProbe [sfDir] [factor] [q,names]`):
  * synthesizes a `factor`× (default 10×) corpus from the real sf0.1
  * tables — sf≈1, far past oracle scale — runs the most expensive
  * corpus queries at BOTH scales through the exact `SparkEntry.queries`
  * entries the driver times, and reports each query's scaling exponent
  * `log(t_big / t_small) / log(factor)` (1.0 = linear; ≳1.3 flagged
  * SUPERLINEAR). Results land in BASELINE.md.
  *
  * Scaling model (deterministic, no RNG):
  *  - `documents`: `factor` copies, `doc_id += k · (maxId+1)`; copy
  *    k > 0 rewrites ~half the words (hash-gated per (word, k)), so
  *    cross-copy MinHash similarity drops below the dedup thresholds —
  *    each copy contributes its OWN near-dup families instead of
  *    collapsing into degenerate factor-sized cliques, which is the
  *    realistic "bigger corpus" regime for LSH/CC/curation pipelines;
  *  - `embeddings`: `factor` copies, `vec_id += k · (maxId+1)`, copy
  *    k > 0 perturbed per-dimension by a small hash-derived delta —
  *    cluster structure preserved (IVF cells stay balanced), vectors
  *    distinct.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).flatMap(_.toIntOption).getOrElse(10)
    val names = args.lift(2).map(_.split(",").toSeq).getOrElse(Seq(
      "q52_minhash_pairs", "q69_dup_clusters", "q87_curation_pipeline",
      "q8D_dedup_keep_best", "q8M_leakfree_split", "q8O_curation_v2",
      "q9M_stream_ivf_index", "q9X_drift_refresh", "q9Y_embed_dedup",
      "q9Z_pq_stream_index", "qA4_pq_reshard_index",
      "qA6_ivf_reshard_index"))
    val spark = GraftSession.builder(appName = "graft-scaleprobe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val bigDir = java.nio.file.Files.createTempDirectory("graft-sf1").toString
    val t0 = System.nanoTime()
    synthesize(spark, sfDir, bigDir, factor)
    println(f"[scaleprobe] synthesized ${factor}x corpus under $bigDir " +
      f"in ${(System.nanoTime() - t0) / 1e9}%.0f s")
    for (t <- Seq("documents", "embeddings")) {
      val n = spark.read.parquet(s"$bigDir/$t.parquet").count()
      println(s"[scaleprobe] $t rows=$n")
    }

    def time(name: String, dir: String): Double = {
      val a = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, dir)
      df.write.mode("overwrite").format("noop").save()
      (System.nanoTime() - a) / 1e9
    }
    // JIT/codegen warm-up with a query OUTSIDE the probe set: warming
    // with names.head would leave that query's small-scale "cold" run
    // warm (fixture cached + JIT'd) while its big-scale cold still pays
    // the fixture build — a systematically inflated cold exponent
    val warmQ = graft.SparkEntry.queries.keys
      .find(q => !names.contains(q)).getOrElse(names.head)
    time(warmQ, sfDir)
    var worst = List.empty[(String, Double)]
    names.foreach { q =>
      // cold = fixture build + query (per dir, the operator end to end);
      // warm = repeat on the built state (the steady-state query path —
      // the number that must scale sublinearly for the 100 TB posture)
      val smallCold = time(q, sfDir); val smallWarm = time(q, sfDir)
      val bigCold = time(q, bigDir); val bigWarm = time(q, bigDir)
      def exp(b: Double, s: Double) = math.log(b / s) / math.log(factor.toDouble)
      val (ec, ew) = (exp(bigCold, smallCold), exp(bigWarm, smallWarm))
      val flag = if (ew > 1.3) "SUPERLINEAR" else if (ew > 1.1) "watch" else "ok"
      println(f"[scaleprobe] $q%-24s cold ${smallCold}%6.2f->${bigCold}%7.2f s " +
        f"(exp ${ec}%5.2f)  warm ${smallWarm}%6.2f->${bigWarm}%7.2f s " +
        f"(exp ${ew}%5.2f)  $flag")
      if (ew > 1.3) worst ::= (q, ew)
    }
    if (worst.nonEmpty)
      println(s"[scaleprobe] SUPERLINEAR: ${worst.map(_._1).mkString(", ")}")

    // ---- ANN SERVE-PATH probes (frozen vs re-sharded index) -------- //
    // The q9Z/qA4 (PQ) and q9M/qA6 (raw IVF) HEADLINE timings above
    // conflate the property oracles' own scaling — brute-force ground
    // truth is Θ(queries·N) with the query COUNT itself growing across
    // the decade (vec_id < 10000 admits 5× more ids at 100×), and the
    // state-identical differentials re-encode/re-assign the whole
    // corpus (Θ(N^1.5) against √N centroids). These sections time ONLY
    // the operator's serving call, with a FIXED 100-query set at both
    // scales, on the already-built fixture states: the number that must
    // scale sublinearly for the 100 TB posture.
    if (names.exists(n => n.startsWith("q9Z") || n.startsWith("qA4")))
      servePathSection(spark, sfDir, bigDir, factor, "q9Z", "qA4",
        graft.Queries.pqProbeFixtures,
        (state, queries, emb, nProbe) => graft.streaming.Ingest
          .ivfPqIndexTopK(spark, state, queries, emb, "vec_id", "embedding",
            k = 10, nProbe = nProbe))
    if (names.exists(n => n.startsWith("q9M") || n.startsWith("qA6")))
      servePathSection(spark, sfDir, bigDir, factor, "q9M", "qA6",
        graft.Queries.ivfProbeFixtures,
        (state, queries, _, nProbe) => graft.streaming.Ingest
          .ivfIndexTopK(spark, state, queries, "vec_id", "embedding",
            k = 10, nProbe = nProbe))
    spark.stop()
  }

  /** One serve-path section: frozen state probed at nProbe=4 (its
    * fixture width), re-sharded state at nProbe=0 (the √-family
    * serving derivation), both timed small→big with the SAME
    * `probe(state, queries, emb, nProbe)` call and a fixed query set.
    */
  private def servePathSection(spark: SparkSession, sfDir: String,
      bigDir: String, factor: Int, labelFrozen: String, labelReshard: String,
      fixtures: (SparkSession, String) => (String, String),
      probe: (String, DataFrame, DataFrame, Int) => DataFrame): Unit = {
    def serve(dir: String): (Double, Double, Long, Long) = {
      val (frozen, reshard) = fixtures(spark, dir)
      val emb = graft.Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding")).localCheckpoint()
      // FIXED query set: same 100 ids at every scale
      val queries = emb.where(col("vec_id") % 20 === 0 && col("vec_id") < 2000)
        .localCheckpoint()
      def time(state: String, nProbe: Int): Double = {
        val a = System.nanoTime()
        probe(state, queries, emb, nProbe)
          .write.mode("overwrite").format("noop").save()
        (System.nanoTime() - a) / 1e9
      }
      def cells(state: String): Long =
        spark.read.parquet(s"$state/centroids/*").count()
      (time(frozen, 4), time(reshard, 0), cells(frozen), cells(reshard))
    }
    serve(sfDir) // warm the code paths once
    val (fS, rS, _, _) = serve(sfDir)
    val (fB, rB, cF, cR) = serve(bigDir)
    def exp(b: Double, s: Double) = math.log(b / s) / math.log(factor.toDouble)
    println(f"[scaleprobe] serve-path frozen($labelFrozen)   nCells=$cF%-5d " +
      f"${fS}%6.2f->${fB}%7.2f s (exp ${exp(fB, fS)}%5.2f)")
    println(f"[scaleprobe] serve-path reshard($labelReshard)  nCells=$cR%-5d " +
      f"${rS}%6.2f->${rB}%7.2f s (exp ${exp(rB, rS)}%5.2f)")
  }

  private[tools] def synthesize(spark: SparkSession, sfDir: String,
                                outDir: String, factor: Int): Unit = {
    val docs = graft.Tables.documents(spark, sfDir)
    val maxDoc = docs.agg(max(col("doc_id"))).head().getLong(0) + 1
    val copies = (0 until factor).map { k =>
      if (k == 0) docs
      else {
        // rewrite ~half the words per copy: word w survives iff
        // hash(w, k) is even, else becomes a copy-local token — keeps
        // doc length/shape, breaks most cross-copy shingle overlap
        val rewritten = array_join(
          transform(split(col("text"), "\\s+"), w =>
            when(pmod(hash(w, lit(k)), lit(2)) === 0, w)
              .otherwise(concat(w, lit(s"x$k")))), " ")
        docs.withColumn("doc_id", col("doc_id") + lit(k * maxDoc))
          .withColumn("text", rewritten)
      }
    }
    copies.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")

    val embs = graft.Tables.embeddings(spark, sfDir)
    val maxVec = embs.agg(max(col("vec_id"))).head().getLong(0) + 1
    val vcopies = (0 until factor).map { k =>
      if (k == 0) embs
      else embs.withColumn("vec_id", col("vec_id") + lit(k * maxVec))
        .withColumn("embedding",
          transform(col("embedding"), (v, i) =>
            (v + (pmod(hash(col("vec_id"), i, lit(k)), lit(1000)).cast("float")
              - lit(500f)) / lit(50000f)).cast("float")))
    }
    vcopies.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
  }
}
