package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end pretraining corpus curation: the library's individually
  * oracle-checked stages composed in the canonical order a production
  * data pipeline runs them — the capstone proving the operators
  * COMPOSE deterministically, not just pass in isolation.
  *
  *   1. exact dedup       ([[Dedup.dedupedCorpus]] — lowest id per
  *      normalized text wins)
  *   2. near-dup dedup    ([[Dedup.dedupNearDup]] — MinHash-LSH pair
  *      graph → connected components → keep each cluster's lowest id)
  *   3. quality gate      ([[TextStats.qualityFilter]] — token band,
  *      quality floor, language allowlist)
  *   4. decontamination   ([[Dedup.decontaminate]] — drop anything
  *      sharing a word 5-gram with the benchmark set)
  *   5. token budget      ([[Sampling.tokenBudget]] — hash-ordered
  *      per-source cumulative token caps)
  *
  * Every stage is shuffle-bounded the same way it is standalone (text
  * never rides a dedup shuffle; the benchmark side broadcasts; budget
  * ordering is md5-derived and append-stable), so the composition
  * inherits the 100 TB posture of its parts. Gated end-to-end by q87's
  * DuckDB mirror of the full chain.
  */
object Curation {

  /** Run the standard pipeline; returns the surviving
    * (id, source, n_tokens, cum_tokens) rows.
    *
    * @param bench held-out benchmark documents (same schema) driving
    *   the decontamination stage
    * @param budgets per-source token budgets for the final stage;
    *   sources absent from the map get `defaultBudget`
    */
  def standardPipeline(docs: DataFrame, bench: DataFrame,
                       idCol: String = "doc_id", textCol: String = "text",
                       sourceCol: String = "source",
                       nearDupThreshold: Double = 0.3,
                       minTokens: Int = 20, maxTokens: Int = 10000,
                       minQuality: Double = 0.6,
                       langs: Seq[String] = Seq("en"),
                       budgets: Map[String, Long] = Map.empty,
                       defaultBudget: Long = Long.MaxValue): DataFrame = {
    val exact = Dedup.dedupedCorpus(docs, idCol, textCol)
    val noDup = Dedup.dedupNearDup(exact, idCol, textCol,
      shingleN = 3, k = 32, bands = 8, threshold = nearDupThreshold)
    // materialize before branching: both the decontamination pass and
    // the anti-join below read `clean`, which would otherwise re-run
    // the dedup + quality lineage twice per action
    val clean = TextStats.qualityFilter(noDup, textCol,
      minTokens, maxTokens, minQuality, langs).localCheckpoint()
    val contaminated = Dedup.decontaminate(clean, bench, idCol, textCol, shingleN = 5)
      .where(col("n_contaminated") >= 1)
      .select(col(idCol))
    val decontaminated = clean.join(contaminated, Seq(idCol), "left_anti")
    val withTokens = decontaminated.select(col(idCol), col(sourceCol),
      TextStats.tokenCount(col(textCol)).cast("int").as("n_tokens"))
    Sampling.tokenBudget(withTokens, idCol, sourceCol, "n_tokens",
      budgets, defaultBudget)
  }
}
