package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Plan inspection + timing for a single corpus query.
  * `sbt "runMain graft.tools.Explain <query> [sfDir] [plan]"`.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val showPlan = args.contains("plan")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries(name)
    val t0 = System.nanoTime()
    val df = fn(spark, sfDir)
    val n = df.count()
    val t1 = System.nanoTime()
    println(f"[explain] $name rows=$n first=${(t1 - t0) / 1e9}%.2fs")
    val t2 = System.nanoTime()
    val n2 = fn(spark, sfDir).count()
    println(f"[explain] $name rows=$n2 warm=${(System.nanoTime() - t2) / 1e9}%.2fs")
    if (showPlan) {
      // Execute THIS df's own plan so AQE finalizes it — count(),
      // write(), even foreach() all wrap the logical plan in a NEW
      // QueryExecution, leaving the printed one initial
      // (isFinalPlan=false) with runtime exchange/stage reuse
      // invisible. toRdd is the one RDD bound to this QueryExecution.
      df.queryExecution.toRdd.foreachPartition(_ => ())
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
