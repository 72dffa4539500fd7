package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Portable

/** Similarity search over embedding columns (`ARRAY<FLOAT>`) — SURVEY.md
  * §2.4. Brute-force cosine top-k as the exact baseline; random-
  * hyperplane LSH bucketing as the scale path (candidates shrink from
  * N×Q to bucket-local, and the only join is an equi-join on bucket key).
  *
  * All dot products are higher-order-function expressions in DOUBLE —
  * codegen'd, no UDFs. Queries are broadcast (they are the small side by
  * construction).
  */
object Similarity {

  /** Dot product of two numeric arrays, computed in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity (0 when either side has zero norm). */
  def cosine(a: Column, b: Column): Column = {
    val d = l2norm(a) * l2norm(b)
    when(d === 0.0, lit(0.0)).otherwise(dot(a, b) / d)
  }

  /** Compiled cosine over float vectors — bit-identical to [[cosine]]
    * (same sequential double accumulation per term, same zero-norm
    * guard), but one fused JVM loop instead of three interpreted
    * higher-order aggregates (~50µs → <1µs per pair). Used on all hot
    * scoring paths; the expression form remains for composition.
    */
  val cosineUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (a: Seq[Float], b: Seq[Float]) =>
      val n = math.min(a.length, b.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      // All corpus vectors share one dimension; mismatched lengths are a
      // caller error (the expression form nulls out via zip_with there).
      val d = math.sqrt(na) * math.sqrt(nb)
      if (d == 0.0) 0.0 else dot / d
    }

  /** Native Catalyst cosine (whole-stage codegen, no UDF serialization) —
    * see [[graft.expressions.CosineSimilarity]]. Bit-identical to
    * [[cosine]] and [[cosineUdf]]; this is the default hot-path kernel.
    */
  def cosineNative(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.CosineSimilarity(
        org.apache.spark.sql.graft.ColumnBridge.expression(a),
        org.apache.spark.sql.graft.ColumnBridge.expression(b)))

  /** Exact top-k nearest neighbors by cosine for each query vector.
    *
    * `queries` is broadcast; the corpus is scanned once; per-query top-k
    * is a window over (query, score). Ties on the (rounded) score break
    * by corpus id so results are deterministic and engine-portable.
    * Self-matches (same id) are excluded.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int,
                     roundScore: Int = 4): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("score", Portable.round(cosineNative(col("qv"), col("cv")), roundScore))
    // Bounded-heap aggregation instead of a row_number window: the
    // shuffle carries at most k rows per (map partition, query) thanks
    // to partial aggregation — a window would sort-shuffle every scored
    // pair. Ordering (score desc, id asc) matches the window/oracle.
    val topk = udaf(new TopK.TopKAggregator(k))
    scored
      .groupBy(col("query_id"))
      .agg(topk(col("neighbor_id"), col("score")).as("tk"))
      .select(col("query_id"), posexplode(col("tk")))
      .select(col("query_id"), col("col.id").as("neighbor_id"),
        col("col.score").as("score"), (col("pos") + 1).cast("int").as("rank"))
  }

  /** Deterministic random hyperplanes: `nPlanes` unit-free direction
    * vectors of dimension `dim` (seeded; constants baked into the plan).
    */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-bit LSH bucket key of a vector under the given hyperplanes:
    * a string of 0/1 sign bits. Vectors in the same bucket are likely
    * cosine-close (random hyperplane LSH, Charikar 2002).
    */
  def lshBucket(vec: Column, planes: Array[Array[Double]]): Column =
    concat_ws("", planes.toIndexedSeq.map { p =>
      val planeLit = array(p.toIndexedSeq.map(lit(_)): _*)
      when(dot(vec, planeLit) >= 0.0, lit("1")).otherwise(lit("0"))
    }: _*)

  /** Approximate top-k: bucket corpus and queries with `nPlanes` sign
    * bits, join on bucket (plus Hamming-1 neighbor buckets for recall),
    * then exact-cosine rerank within candidates.
    *
    * Scale: the corpus is scanned once to compute buckets (pure
    * expressions), the join is an equi-join on bucket key, and rerank
    * touches only candidates — no N×Q blow-up.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, nPlanes: Int = 8,
              dim: Int = -1): DataFrame = {
    // dim must match the data: planes longer than the vectors make every
    // sign-bit null→"0" (zip_with pads with null), collapsing ALL
    // vectors into one bucket — the exact N×Q blow-up LSH exists to
    // avoid. Auto-detect from the corpus unless given explicitly.
    val planeDim =
      if (dim > 0) dim
      else corpus.select(size(col(vecCol))).head().getInt(0)
    val planes = hyperplanes(nPlanes, planeDim)
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("bucket", lshBucket(col("cv"), planes))
    // Probe the query's own bucket plus all Hamming-1 buckets (flip each
    // bit once) — multi-probe LSH, recovers most near-misses cheaply.
    val probes = (0 until nPlanes).foldLeft(Seq[Column](col("bucket"))) {
      (acc, i) =>
        acc :+ concat(
          substring(col("bucket"), 1, i),
          when(substring(col("bucket"), i + 1, 1) === "1", lit("0")).otherwise(lit("1")),
          substring(col("bucket"), i + 2, nPlanes - i - 1))
    }
    val q = broadcast(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
        .withColumn("bucket", lshBucket(col("qv"), planes))
        .withColumn("probe", explode(array(probes: _*)))
        .drop("bucket"))
    val cand = q.join(c, col("probe") === col("bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "qv", "neighbor_id", "cv").distinct()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    cand
      .withColumn("score", Portable.round(cosineNative(col("qv"), col("cv")), 4))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "score", "rank")
  }

  /** Compiled sign-bit signature under `planes` — same arithmetic as
    * [[lshBucket]] (sequential double dot per plane, `>= 0` → '1') in
    * one fused JVM pass instead of nPlanes interpreted aggregates.
    */
  def signBitsUdf(planes: Array[Array[Double]]): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (v: Seq[Float]) =>
      val sb = new java.lang.StringBuilder(planes.length)
      planes.foreach { p =>
        val n = math.min(v.length, p.length)
        var s = 0.0
        var i = 0
        while (i < n) { s += v(i).toDouble * p(i); i += 1 }
        sb.append(if (s >= 0.0) '1' else '0')
      }
      sb.toString
    }

  /** Embedding near-duplicate PAIRS at scale — the LSH path that
    * replaces [[q58]]'s bounded brute-force all-pairs at 100 TB.
    *
    * Pipeline (mirrors `Dedup.minhashNearDupPairs`): one compiled
    * sign-signature pass → band keys (nPlanes/nBands bits each) →
    * groupBy(band) + within-bucket pair expansion (id_a < id_b) →
    * distinct candidates → exact-cosine verify ≥ `minCosine` on
    * candidate vectors only (semi-join fetch). The only shuffles are the
    * (id, band) groupBy and the candidate joins — vectors never move
    * through the band exchange, and nothing is quadratic in corpus size.
    *
    * Approximate by construction: a true pair is missed iff its
    * signatures differ in EVERY band (probability → 0 as cosine → 1;
    * the planted-pair spec pins recall on a fixture). All emitted pairs
    * are exact-verified — precision is 1 by construction.
    */
  def lshNearDupPairs(corpus: DataFrame, idCol: String, vecCol: String,
                      minCosine: Double, nPlanes: Int = 64, nBands: Int = 8,
                      dim: Int = -1, maxBucketSize: Int = Int.MaxValue): DataFrame = {
    require(nPlanes % nBands == 0, "nBands must divide nPlanes")
    val bits = nPlanes / nBands
    // 64/8 defaults → 8 sign bits per band: a random (cosine≈0) pair
    // collides in a band w.p. 2^-8, so candidates stay ~linear in corpus
    // size; high-cosine pairs still agree on ≥1 whole band w.h.p.
    // (fewer bits per band would make nearly every pair a candidate and
    // the verify join quadratic).
    val planeDim =
      if (dim > 0) dim
      else corpus.select(size(col(vecCol))).head(1).headOption match {
        case Some(r) => r.getInt(0)
        case None => // empty corpus → empty pairs, not a head() crash
          val spark = corpus.sparkSession
          import spark.implicits._
          return spark.emptyDataset[(Long, Long, Double)]
            .toDF("id_a", "id_b", "cosine")
      }
    val planes = hyperplanes(nPlanes, planeDim)
    val sigUdf = signBitsUdf(planes)
    val ids = corpus.select(col(idCol).cast("long").as("id"), col(vecCol).as("cv"))
    val banded = ids
      .withColumn("sig", sigUdf(col("cv")))
      .select(col("id"), explode(array((0 until nBands).map(b =>
        concat(lit(s"$b|"), substring(col("sig"), b * bits + 1, bits))): _*)).as("band"))
    val cand = banded.groupBy(col("band"))
      .agg(collect_list(col("id")).as("ids"))
      // maxBucketSize: same degenerate-bucket guard as
      // Dedup.minhashNearDupPairs (e.g. the all-zero-vector bucket)
      .where(size(col("ids")) > 1 && size(col("ids")) <= maxBucketSize)
      .select(explode(flatten(transform(col("ids"), x =>
        transform(filter(col("ids"), y => y > x),
          y => struct(x.as("id_a"), y.as("id_b")))))).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
      .distinct()
      .localCheckpoint()
    val candIds = cand
      .select(explode(array(col("id_a"), col("id_b"))).as("id")).distinct()
    val candVecs = ids.join(candIds, Seq("id"), "left_semi")
    cand
      .join(candVecs.select(col("id").as("id_a"), col("cv").as("cv_a")), Seq("id_a"))
      .join(candVecs.select(col("id").as("id_b"), col("cv").as("cv_b")), Seq("id_b"))
      .withColumn("cosine", Portable.round(cosineNative(col("cv_a"), col("cv_b")), 4))
      .where(col("cosine") >= minCosine)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /** JVM cosine of a float row vector against a double centroid —
    * bit-identical to [[cosineNative]] when the centroid is an exactly
    * float-to-double-cast vector (same sequential accumulation order,
    * same zero-norm guard).
    */
  private def cosFD(a: Seq[Float], b: Array[Double]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a(i).toDouble; val y = b(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val d = math.sqrt(na) * math.sqrt(nb)
    if (d == 0.0) 0.0 else dot / d
  }

  /** [[graft.Portable.round]] at n=6 as the identical JVM op sequence. */
  private def round6(x: Double): Double =
    if (x >= 0) math.floor(x * 1e6 + 0.5) / 1e6 else -(math.floor(-x * 1e6 + 0.5) / 1e6)

  /** IVF-style ANN top-k: the scale path for billion-row corpora.
    *
    * Cells come from a deterministic sample of corpus vectors (first
    * `nCells` by id — training-free; [[ivfTopKKMeans]] swaps in Lloyd's
    * centroids without changing the plan shape). Every corpus vector is
    * assigned to its best cell as a pure PROJECTION over the broadcast
    * centroid array — zero shuffle (a window-over-crossJoin argmax would
    * shuffle N×nCells scored rows); a query probes its `nProbe` nearest
    * cells and reranks only those cells' members with exact cosine
    * through the bounded-heap [[TopK.TopKAggregator]] (shuffle carries
    * ≤ k rows per map-partition per query, never every scored pair). At
    * scale the assignment is a write-once materialization and the probe
    * join is an equi-join on `cell_id` — corpus scan cost per query
    * drops to nProbe/nCells.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, nCells: Int = 16,
              nProbe: Int = 2): DataFrame =
    ivfWithCentroids(corpus, queries, idCol, vecCol, k, nProbe,
      sampleCentroids(corpus, idCol, vecCol, nCells))

  /** Deterministic training-free centroids: the first `nCells` corpus
    * vectors by id (metadata-scale collect, like [[lshTopK]]'s dim probe).
    */
  def sampleCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                      nCells: Int): Array[(Long, Array[Double])] =
    corpus.orderBy(col(idCol).asc).limit(nCells)
      .select(col(idCol).cast("long"), col(vecCol))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))

  /** Lloyd's k-means centroid training, Spark-shaped: per iteration the
    * assignment is a broadcast-centroid projection (no shuffle) and the
    * centroid update is ONE partial-agg shuffle of (cell, dim) sums —
    * nCells×dim rows to the driver, never vectors. Deterministic init
    * (first `nCells` by id). `sampleMod` trains on an id-sampled subset
    * (at 100 TB you train on a sample and assign the full corpus).
    * Convergence to bit-identical centroids across runs is NOT
    * guaranteed (double sums are order-dependent); consumers must treat
    * centroids as approximate, which IVF recall properties do.
    */
  def kmeansCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                      nCells: Int, iters: Int = 5,
                      sampleMod: Int = 1): Array[(Long, Array[Double])] = {
    import corpus.sparkSession.implicits._
    val base = (if (sampleMod <= 1) corpus
                else corpus.where(col(idCol) % sampleMod === 0))
      .select(col(vecCol)).as[Seq[Float]]
    var cents: Array[Array[Double]] =
      sampleCentroids(corpus, idCol, vecCol, nCells).map(_._2)
    val k = cents.length
    val dim = cents.headOption.map(_.length).getOrElse(0)
    var it = 0
    while (it < iters) {
      val cur = cents
      // One pass per iteration: each partition accumulates (sum, count)
      // per cell in flat arrays and emits ONE row — no explode (a
      // posexplode+groupBy update re-evaluates the assignment per
      // exploded element once Catalyst hoists the projection above the
      // Generate), no shuffle; the driver reduces nPartitions × k × dim
      // doubles (the classic scalable k-means update shape).
      val stats = base.mapPartitions { rows =>
        val sums = Array.ofDim[Double](k, dim)
        val counts = new Array[Long](k)
        rows.foreach { v =>
          var bi = 0; var bs = Double.NegativeInfinity
          var i = 0
          while (i < k) {
            val s = cosFD(v, cur(i))
            if (s > bs) { bs = s; bi = i }
            i += 1
          }
          counts(bi) += 1
          val lim = math.min(v.length, dim)
          var j = 0
          while (j < lim) { sums(bi)(j) += v(j).toDouble; j += 1 }
        }
        Iterator.single((sums.flatten, counts))
      }.collect()
      val totSums = Array.ofDim[Double](k, dim)
      val totCounts = new Array[Long](k)
      stats.foreach { case (flat, cnts) =>
        var c = 0
        while (c < k) {
          totCounts(c) += cnts(c)
          var j = 0
          while (j < dim) { totSums(c)(j) += flat(c * dim + j); j += 1 }
          c += 1
        }
      }
      val next = cur.map(_.clone()) // empty cells keep their old centroid
      var c = 0
      while (c < k) {
        if (totCounts(c) > 0) {
          var j = 0
          while (j < dim) { next(c)(j) = totSums(c)(j) / totCounts(c); j += 1 }
        }
        c += 1
      }
      cents = next
      it += 1
    }
    cents.zipWithIndex.map { case (c, i) => (i.toLong, c) }
  }

  /** IVF top-k over k-means-trained cells — same plan shape as
    * [[ivfTopK]], better-balanced cells on clustered data.
    */
  def ivfTopKKMeans(corpus: DataFrame, queries: DataFrame, idCol: String,
                    vecCol: String, k: Int, nCells: Int = 16,
                    nProbe: Int = 2, iters: Int = 5): DataFrame =
    ivfWithCentroids(corpus, queries, idCol, vecCol, k, nProbe,
      kmeansCentroids(corpus, idCol, vecCol, nCells, iters))

  private[graft] def ivfWithCentroids(corpus: DataFrame, queries: DataFrame,
                                    idCol: String, vecCol: String, k: Int,
                                    nProbe: Int,
                                    centroids: Array[(Long, Array[Double])]): DataFrame = {
    // cell_id-ascending order + strictly-greater replacement = lowest
    // cell_id wins csim ties (the row_number (csim DESC, cell_id ASC)
    // contract the DuckDB oracle mirrors).
    val cents = centroids.sortBy(_._1)
    val assignUdf = udf { (v: Seq[Float]) =>
      var bestCell = Long.MinValue; var bestSim = Double.NegativeInfinity
      var i = 0
      while (i < cents.length) {
        val s = round6(cosFD(v, cents(i)._2))
        if (s > bestSim) { bestSim = s; bestCell = cents(i)._1 }
        i += 1
      }
      bestCell
    }
    val probeUdf = udf { (v: Seq[Float]) =>
      cents.map { case (cid, cv) => (round6(cosFD(v, cv)), cid) }
        .sortBy { case (s, cid) => (-s, cid) }
        .take(nProbe).map(_._2).toSeq
    }
    val assigned = corpus
      .select(col(idCol).cast("long").as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("cell_id", assignUdf(col("cv")))
    val probes = queries
      .select(col(idCol).cast("long").as("query_id"), col(vecCol).as("qv"))
      .withColumn("cell_id", explode(probeUdf(col("qv"))))
    val topk = udaf(new TopK.TopKAggregator(k))
    broadcast(probes).join(assigned, Seq("cell_id"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("score", Portable.round(cosineNative(col("qv"), col("cv")), 4))
      .groupBy(col("query_id"))
      .agg(topk(col("neighbor_id"), col("score")).as("tk"))
      .select(col("query_id"), posexplode(col("tk")))
      .select(col("query_id"), col("col.id").as("neighbor_id"),
        col("col.score").as("score"), (col("pos") + 1).cast("int").as("rank"))
  }

  /** Symmetric int8 quantization of an embedding column — the standard
    * 4× memory/IO cut for ANN serving (scale = max|x|/127 per vector;
    * q_i = round-half-away(x_i/scale) ∈ [−127,127]).
    *
    * Emitted as per-vector scale + reconstruction-error stats so the
    * lossy step is *measured*, not assumed. Every expression is a
    * sequential in-array-order fold (`transform`/`aggregate`), so the
    * doubles accumulate in one deterministic order — the whole frame is
    * engine-portable and oracle-checkable bit-for-bit. Zero vectors
    * quantize to all-zero with scale 0. One narrow pass, no shuffle.
    */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = transform(col(vecCol), x => x.cast("double"))
    df.select(col(idCol), v.as("_v"))
      .withColumn("_scale",
        array_max(transform(col("_v"), x => abs(x))) / 127.0)
      .withColumn("_q", transform(col("_v"), x =>
        when(col("_scale") === 0.0, lit(0.0)).otherwise(
          signum(x) * floor(abs(x) / col("_scale") + 0.5))))
      .withColumn("_err",
        zip_with(col("_q"), col("_v"), (q, x) => abs(q * col("_scale") - x)))
      .select(
        col(idCol),
        size(col("_v")).as("dim"),
        Portable.round(col("_scale"), 6).as("scale"),
        Portable.round(array_max(col("_err")), 6).as("max_abs_err"),
        Portable.round(
          aggregate(col("_err"), lit(0.0), (a, e) => a + e) /
            size(col("_v")).cast("double"), 6).as("mean_abs_err"))
  }

  /** Per-vector norm/statistics frame (sanity + quality gates). */
  def embeddingStats(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(
      col(idCol),
      size(col(vecCol)).as("dim"),
      Portable.round(l2norm(col(vecCol)), 4).as("l2_norm"),
      Portable.round(aggregate(col(vecCol), lit(0.0), (a, x) => a + x.cast("double")) /
        size(col(vecCol)).cast("double"), 6).as("mean_component"))
}
