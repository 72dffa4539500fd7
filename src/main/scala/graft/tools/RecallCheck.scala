package graft.tools
import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.llm.Similarity

object RecallCheck {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(appName = "recall-check").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (d <- args) {
      val emb = Tables.embeddings(spark, d)
      val queries = emb.where(col("vec_id") % 20 === 0 && col("vec_id") < 10000)
      val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 10)
        .select("query_id", "neighbor_id")
      for ((label, probe) <- Seq(("kmeans_p4", 4), ("kmeans_p2", 2))) {
        val approx = Similarity.ivfTopKKMeans(emb, queries, "vec_id", "embedding",
          k = 10, nCells = 16, nProbe = probe, iters = 5).select("query_id", "neighbor_id")
        val hit = exact.join(approx, Seq("query_id", "neighbor_id"), "left_semi").count()
        val total = exact.count()
        println(f"[recall] $d $label ${hit.toDouble / total}%.3f ($hit/$total)")
      }
      val sApprox = Similarity.ivfTopK(emb, queries, "vec_id", "embedding", k = 10,
        nCells = 16, nProbe = 4).select("query_id", "neighbor_id")
      val sHit = exact.join(sApprox, Seq("query_id", "neighbor_id"), "left_semi").count()
      println(f"[recall] $d sample_p4 ${sHit.toDouble / exact.count()}%.3f")
      val pqApprox = Similarity.ivfPqTopK(emb, queries, "vec_id", "embedding",
        k = 10, nCells = 16, nProbe = 4, m = 4, ks = 16, iters = 4, rerank = 40,
        sampleMod = 4)
        .select("query_id", "neighbor_id")
      val pqHit = exact.join(pqApprox, Seq("query_id", "neighbor_id"), "left_semi").count()
      println(f"[recall] $d ivfpq_p4 ${pqHit.toDouble / exact.count()}%.3f")
      val pqPlain = Similarity.pqTopK(emb, queries, "vec_id", "embedding",
        k = 10, m = 4, ks = 16, iters = 4, rerank = 40)
        .select("query_id", "neighbor_id")
      val ppHit = exact.join(pqPlain, Seq("query_id", "neighbor_id"), "left_semi").count()
      println(f"[recall] $d pq_plain ${ppHit.toDouble / exact.count()}%.3f")
    }
    spark.stop()
  }
}
