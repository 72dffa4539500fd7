package graft.tools
import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.llm.Similarity

/** Measured recall@10 for every ANN path and parameterization the gates
  * use — the numbers the q59/q63/q79/q83 floors are set against.
  */
object RecallCheck {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(appName = "recall-check").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (d <- args) {
      val emb = Tables.embeddings(spark, d)
      val queries = emb.where(col("vec_id") % 20 === 0 && col("vec_id") < 10000)
      val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 10)
        .select("query_id", "neighbor_id").localCheckpoint()
      val total = exact.count()
      def recall(label: String)(approx: org.apache.spark.sql.DataFrame): Unit = {
        val hit = exact
          .join(approx.select("query_id", "neighbor_id"), Seq("query_id", "neighbor_id"), "left_semi")
          .count()
        println(f"[recall] $d $label ${hit.toDouble / total}%.3f ($hit/$total)")
      }
      // IVF routing ceiling (exact cosine in probed cells): recall here
      // bounds every IVF+PQ composition at the same nProbe.
      for (probe <- Seq(2, 4, 8, 10)) {
        recall(s"kmeans_p$probe")(Similarity.ivfTopKKMeans(emb, queries,
          "vec_id", "embedding", k = 10, nCells = 16, nProbe = probe, iters = 5))
      }
      recall("sample_p4")(Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
        k = 10, nCells = 16, nProbe = 4))
      // IVFADC: residual coding (the gate's config) vs raw coding, and
      // the old round-5 parameterization for the before/after record.
      for (probe <- Seq(4, 8, 10)) {
        recall(s"ivfpq_res_m8ks256_p$probe")(Similarity.ivfPqTopK(emb, queries,
          "vec_id", "embedding", k = 10, nCells = 16, nProbe = probe,
          m = 8, ks = 256, iters = 4, sampleMod = 4))
        recall(s"ivfpq_raw_m8ks256_p$probe")(Similarity.ivfPqTopK(emb, queries,
          "vec_id", "embedding", k = 10, nCells = 16, nProbe = probe,
          m = 8, ks = 256, iters = 4, sampleMod = 4, residual = false))
      }
      recall("ivfpq_r5_m4ks16_p4_rr40")(Similarity.ivfPqTopK(emb, queries,
        "vec_id", "embedding", k = 10, nCells = 16, nProbe = 4,
        m = 4, ks = 16, iters = 4, rerank = 40, sampleMod = 4))
      // Plain PQ (exhaustive ADC): gate config and the round-5 one.
      recall("pq_m8ks256_auto")(Similarity.pqTopK(emb, queries,
        "vec_id", "embedding", k = 10, m = 8, ks = 256, iters = 4))
      recall("pq_r5_m4ks16_rr40")(Similarity.pqTopK(emb, queries,
        "vec_id", "embedding", k = 10, m = 4, ks = 16, iters = 4, rerank = 40))
      // IVF hard negatives vs the exact different-label path (the q9A
      // gate's config) — its own ground truth, k=5.
      val exactHn = Similarity.hardNegatives(emb, queries,
          "vec_id", "embedding", "label", k = 5)
        .select("query_id", "neighbor_id").localCheckpoint()
      val hnTotal = exactHn.count()
      val hnHit = exactHn.join(
        Similarity.hardNegativesIvf(emb, queries, "vec_id", "embedding",
          "label", k = 5, nCells = 16, nProbe = 4, iters = 5)
          .select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id"), "left_semi").count()
      println(f"[recall] $d hard_neg_ivf_p4 ${hnHit.toDouble / hnTotal}%.3f ($hnHit/$hnTotal)")
    }
    spark.stop()
  }
}
