package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Portable

/** Discriminative quality classification for LLM training-data
  * pipelines (SURVEY.md §2.4): the fasttext-style "curated tranche vs
  * raw corpus" logistic-regression scorer of the GPT-3 / LLaMA data
  * recipes (Brown et al. 2020 Appendix A; Touvron et al. 2023 §2) —
  * the discriminative complement to [[Sampling.dsirWeights]]'s
  * generative importance weights.
  *
  * Shape: features are the SAME hashed unigram+bigram buckets DSIR
  * uses ([[Sampling.gramBuckets]]); the model is logistic regression
  * trained by full-batch gradient descent on a BOUNDED deterministic
  * hash-sample of labeled documents (the fasttext protocol — model
  * FITTING never needs the full corpus; a few-thousand-doc sample
  * saturates a B-dimensional linear model), then every raw document is
  * scored DISTRIBUTED: the learned weight vector broadcasts (B
  * doubles), and scoring is one (id, bucket, count) shuffle + a
  * per-doc dot product — no training state ever joins the data plane.
  */
object Classifier {

  /** Hard cap on the collected training sample: `trainFrac` draws
    * above this fail loudly instead of melting the driver (each doc
    * collects its gram-bucket list, ~2 longs per token).
    */
  val MaxTrainDocs: Long = 50000L

  /** Train on `target` (label 1) vs `raw` minus target (label 0),
    * score every `raw` document. Returns (idCol, n_grams,
    * quality_prob) for each raw document with at least one token;
    * `quality_prob` is P(target-like) rounded to 4 decimals.
    *
    * Deterministic end to end: the train sample is hash-membership
    * (`unitHash(id, salt) < trainFrac*10000` — reproducible across
    * runs, partitionings, and engines), gradient accumulation runs in
    * ascending-id order over sorted sparse features, and the
    * initial weights are zero — no RNG anywhere.
    */
  def qualityClassifier(raw: DataFrame, target: DataFrame, idCol: String,
                        textCol: String, nBuckets: Int = 1024,
                        trainFrac: Double = 0.5, salt: String = "qc",
                        iters: Int = 300, lr: Double = 1.0,
                        l2: Double = 1e-4,
                        maxTrainDocs: Long = MaxTrainDocs): DataFrame = {
    require(nBuckets > 0, "nBuckets must be positive")
    require(trainFrac > 0 && trainFrac <= 1, "trainFrac must be in (0, 1]")
    require(iters > 0 && lr > 0 && l2 >= 0, "iters/lr/l2 must be positive")
    val B = nBuckets
    val spark = raw.sparkSession
    val inTrain =
      Sampling.unitHash(col(idCol), salt) < math.round(trainFrac * 10000).toDouble

    // ---- fit: bounded driver-side GD over the hash-sampled tranche --
    val tIds = target.select(col(idCol).cast("long").as("_id")).distinct()
    val negTrain = raw.where(inTrain)
      .join(tIds, raw(idCol).cast("long") === tIds("_id"), "left_anti")
    val posTrain = target.where(inTrain)
    def trainRows(df: DataFrame, label: Double) =
      Sampling.gramBuckets(df, idCol, textCol, B.toLong)
        .groupBy(col("_id"))
        .agg(collect_list(col("_b")).as("_bs"))
        .select(col("_id"), lit(label).as("_y"), col("_bs"))
    val sampled = trainRows(posTrain, 1.0)
      .unionByName(trainRows(negTrain, 0.0))
      .persist()
    val (w, bias) =
      try {
        val nTrain = sampled.count()
        require(nTrain > 0, "empty training sample: lower trainFrac's salt " +
          "collision or supply a non-empty target")
        require(nTrain <= maxTrainDocs,
          s"training sample of $nTrain docs exceeds $maxTrainDocs — " +
            "classifier fitting is designed for a bounded sample; lower " +
            "trainFrac (scoring still covers the full corpus)")
        val data = sampled.collect().map { r =>
          val bs = r.getSeq[Long](2)
          // sparse tf vector scaled ×100, sorted for deterministic FP order
          val x = bs.groupBy(identity).toArray
            .map { case (b, occ) => (b.toInt, 100.0 * occ.size / bs.size) }
            .sortBy(_._1)
          (r.getLong(0), r.getDouble(1), x)
        }.sortBy(_._1)
        fit(data.map(d => (d._2, d._3)), B, iters, lr, l2)
      } finally { sampled.unpersist(blocking = false); () }

    // ---- score: broadcast weights, one (id, bucket, count) shuffle --
    val bcW = spark.sparkContext.broadcast(w)
    val bag = Sampling.gramBuckets(raw, idCol, textCol, B.toLong)
      .groupBy(col("_id"), col("_b")).agg(count(lit(1)).as("_c"))
    val withN = bag.withColumn("_n",
      sum(col("_c")).over(Window.partitionBy(col("_id"))))
    val contrib = udf { (b: Long, c: Long, n: Long) =>
      bcW.value(b.toInt) * (100.0 * c / n)
    }
    withN
      .groupBy(col("_id"))
      .agg(first(col("_n")).as("n_grams"),
        sum(contrib(col("_b"), col("_c"), col("_n"))).as("_z"))
      .select(col("_id").as(idCol), col("n_grams"),
        Portable.round(
          lit(1.0) / (lit(1.0) + exp(-(col("_z") + bias))), 4)
          .as("quality_prob"))
  }

  /** Full-batch logistic GD; deterministic given the input order. */
  private def fit(data: Array[(Double, Array[(Int, Double)])], nBuckets: Int,
                  iters: Int, lr: Double, l2: Double): (Array[Double], Double) = {
    val w = new Array[Double](nBuckets)
    var bias = 0.0
    val n = data.length.toDouble
    var it = 0
    while (it < iters) {
      val gw = new Array[Double](nBuckets)
      var gb = 0.0
      data.foreach { case (y, x) =>
        var z = bias
        x.foreach { case (j, v) => z += w(j) * v }
        val p = 1.0 / (1.0 + math.exp(-z))
        val d = p - y
        x.foreach { case (j, v) => gw(j) += d * v }
        gb += d
      }
      var j = 0
      while (j < nBuckets) {
        w(j) -= lr * (gw(j) / n + l2 * w(j))
        j += 1
      }
      bias -= lr * (gb / n)
      it += 1
    }
    (w, bias)
  }
}
