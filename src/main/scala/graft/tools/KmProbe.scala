package graft.tools
import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.llm.Similarity

object KmProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(appName = "km-probe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("KM_SF_DIR", "/root/testdata/sf0.1")
    val emb = Tables.embeddings(spark, d)
    def t[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[kmprobe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    t("warmup count")(emb.count())
    val cents = t("train 5 iters")(
      Similarity.kmeansCentroids(emb, "vec_id", "embedding", 16, iters = 5))
    val queries = emb.where(col("vec_id") % 20 === 0 && col("vec_id") < 10000)
    t("ivf eval")(
      Similarity.ivfWithCentroids(emb, queries, "vec_id", "embedding", 10, 4, cents).count())
    spark.stop()
  }
}
