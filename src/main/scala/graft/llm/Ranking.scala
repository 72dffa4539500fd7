package graft.llm

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Portable

/** Corpus ranking / retrieval scoring (SURVEY.md §2.4 extension):
  * document-frequency statistics and Okapi BM25 scoring of a corpus
  * against a fixed term set — the "score every document against the
  * quality/topic probe terms" pass of a training-data pipeline.
  *
  * Scale posture (100 TB): the corpus tokenizes once; the term filter
  * applies BEFORE any shuffle, so only tokens matching the probe terms
  * (a vanishing fraction of the corpus) ever enter the tf aggregation —
  * which carries the document length along, so no corpus-keyed length
  * join exists; corpus-level stats (N, avgdl) and per-term document
  * frequencies are scalar/tiny frames joined by broadcast.
  *
  * Engine parity: idf uses the always-positive Lucene form
  * `ln(1 + (N - df + 0.5)/(df + 0.5))`; document length and avgdl are
  * integer-valued doubles (exact under any summation order), so the
  * DuckDB oracle reproduces the arithmetic bit-for-bit up to the final
  * rounded sum.
  */
object Ranking {

  /** Per-(doc, term) term frequencies for `terms` only. The `isin`
    * filter runs scan-side — matching tokens are the only rows shuffled.
    */
  def termFrequencies(df: DataFrame, idCol: String, textCol: String,
                      terms: Seq[String]): DataFrame =
    df.select(col(idCol), explode(TextStats.tokens(col(textCol))).as("term"))
      .where(col("term").isin(terms: _*))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** Okapi BM25 score of every matching document against `terms`
    * (k1/b are the standard defaults). Returns (idCol, bm25) for
    * documents containing at least one term.
    *
    * The document length rides the tf aggregation (tokenize once,
    * `first(dl)` inside the group), so there is no corpus-keyed
    * length join — the only corpus-keyed shuffle is the (doc, term)
    * aggregation of term-matching tokens.
    */
  def bm25(df: DataFrame, idCol: String, textCol: String, terms: Seq[String],
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    val toks = df.select(col(idCol), TextStats.tokens(col(textCol)).as("_ws"))
    val stats = toks.agg(count(lit(1)).cast("double").as("n_docs"),
      avg(size(col("_ws")).cast("double")).as("avgdl"))
    val tf = toks
      .select(col(idCol), size(col("_ws")).cast("double").as("dl"),
        explode(col("_ws")).as("term"))
      .where(col("term").isin(terms: _*))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("contrib",
        col("idf") * (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col(idCol))
      .agg(Portable.round(sum(col("contrib")), 4).as("bm25"))
  }

  /** Per-document top-`k` keywords by TF-IDF (smoothed idf
    * `ln((N+1)/(df+1))`) — keyword extraction / topic tagging for
    * dataset cards. Ties break on term (ascending), so ranks are
    * deterministic and engine-portable: every score is a single
    * tf·ln(ratio) of exact integers — no sums, bit-identical across
    * engines.
    *
    * Scale: the (doc, term) tf aggregation is the inherent corpus-scale
    * shuffle of keyword extraction, and it runs ONCE (`tf` is
    * materialized before fanning out to the df aggregation and the
    * scoring join — otherwise the tokenize+aggregate pipeline would
    * re-evaluate per consumer; the materialized blocks live until the
    * returned frame is garbage-collected, the standard lifetime of
    * every eager intermediate in this package). Document frequencies
    * are a vocabulary-sized frame joined by BROADCAST by default, so
    * the Zipf-skewed term key never shuffles the corpus-scale tf rows;
    * the corpus size folds to a literal via one count action (a
    * metadata-only scan for parquet sources) instead of a 1-row
    * nested-loop join. Net plan: tf aggregation + df aggregation +
    * per-doc top-k window = 3 exchanges, no NestedLoopJoin.
    *
    * @param broadcastDf broadcast the (term, df) vocabulary (default).
    *        The vocabulary must fit the driver and the broadcast limit
    *        — fine up to ~tens of millions of distinct terms. For a
    *        web-scale corpus whose raw vocabulary (URLs, typos, hashes)
    *        exceeds that, pass `false`: the join shuffles both sides on
    *        term and AQE's skew handling takes over — more exchanges,
    *        no driver-side vocabulary.
    */
  def topTerms(df: DataFrame, idCol: String, textCol: String,
               k: Int = 5, broadcastDf: Boolean = true): DataFrame = {
    require(k > 0, "k must be positive")
    // One count action; (n_docs + 1.0) is an exact-integer double, so
    // folding it driver-side is bit-identical to computing it in-plan.
    val nDocs = df.count().toDouble
    val toks = df
      .select(col(idCol), explode(TextStats.tokens(col(textCol))).as("term"))
      .where(length(col("term")) > 0)
    val tf = toks.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val dfreq = tf.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("_s").desc, col("term").asc)
    tf.join(if (broadcastDf) broadcast(dfreq) else dfreq, "term")
      .withColumn("_s", col("tf") * log(lit(nDocs + 1.0) / (col("df") + 1.0)))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(idCol), col("term"), col("rank"),
        Portable.round(col("_s"), 4).as("tfidf"))
  }
}
