package graft.tools

import java.nio.file.{Files, Paths}

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

import graft.{GraftSession, SparkEntry}

/** Per-query execution profile for the optimization round: run each
  * named query end-to-end (the bench action: `.count()`), with a
  * listener recording every Spark job it spawns — wall, task time, task
  * count, shuffle read/write bytes. Prints a per-query summary plus the
  * job list, so "where does the time go" is measured, not guessed
  * (optimization guide §1). Optionally dumps the final
  * `.explain("formatted")` to a directory (second arg), for the
  * plans/r19 before/after evidence.
  *
  *   sbt "runMain graft.tools.QProfile q9W_neardup_reconcile[,q...] [plansDir]"
  *
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
  */
object QProfile {
  private final case class JobRow(id: Int, desc: String, wallMs: Long,
                                  taskMs: Long, nTasks: Int,
                                  shufReadMB: Double, shufWriteMB: Double)

  def main(args: Array[String]): Unit = {
    val names = args.headOption
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(sys.error("usage: QProfile q1,q2,... [plansDir]"))
    val plansDir = if (args.length > 1) Some(args(1)) else None
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder(appName = "graft-qprofile").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = mutable.ArrayBuffer[JobRow]()
    val jobStart = mutable.Map[Int, (Long, String)]()
    val stageTask = mutable.Map[Int, (Long, Int, Long, Long)]() // taskMs, nTasks, shufR, shufW
    val stageToJob = mutable.Map[Int, Int]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobStart(js.jobId) = (System.nanoTime(),
          Option(js.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .getOrElse(""))
        js.stageIds.foreach(sid => stageToJob(sid) = js.jobId)
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        stageTask(si.stageId) = (
          m.executorRunTime, si.numTasks,
          m.shuffleReadMetrics.totalBytesRead,
          m.shuffleWriteMetrics.bytesWritten)
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val (t0, desc) = jobStart.getOrElse(je.jobId, (System.nanoTime(), ""))
        val sids = stageToJob.collect { case (sid, j) if j == je.jobId => sid }
        val (tms, nt, sr, sw) = sids.foldLeft((0L, 0, 0L, 0L)) { case ((a, b, c, d), sid) =>
          val (x, y, z, w) = stageTask.getOrElse(sid, (0L, 0, 0L, 0L))
          (a + x, b + y, c + z, d + w)
        }
        jobs.synchronized {
          jobs += JobRow(je.jobId, desc, (System.nanoTime() - t0) / 1000000,
            tms, nt, sr / 1048576.0, sw / 1048576.0)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    // warmup (match Bench)
    try SparkEntry.queries.get("q02_filter_case").foreach(f => { f(spark, sfDir).count(); () })
    catch { case _: Throwable => () }

    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query $name"))
      jobs.synchronized(jobs.clear()); jobStart.clear(); stageTask.clear(); stageToJob.clear()
      spark.sparkContext.setJobDescription(s"$name (profiled)")
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val tPlan = System.nanoTime()
      val n = df.count()
      val wall = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.setJobDescription(null)
      Thread.sleep(300) // let listener events drain
      val rows = jobs.synchronized(jobs.toSeq)
      val totTask = rows.map(_.taskMs).sum / 1000.0
      println(f"[qprofile] ===== $name wall=$wall%.2fs declare=${(tPlan - t0) / 1e9}%.2fs rows=$n " +
        f"jobs=${rows.size} taskTime=$totTask%.1fs " +
        f"shufR=${rows.map(_.shufReadMB).sum}%.1fMB shufW=${rows.map(_.shufWriteMB).sum}%.1fMB")
      rows.sortBy(-_.wallMs).take(30).foreach { r =>
        println(f"[qprofile]   job=${r.id}%4d wall=${r.wallMs}%6dms task=${r.taskMs}%7dms " +
          f"n=${r.nTasks}%4d sr=${r.shufReadMB}%8.2fMB sw=${r.shufWriteMB}%8.2fMB  ${r.desc.take(90)}")
      }
      plansDir.foreach { dir =>
        Files.createDirectories(Paths.get(dir))
        try {
          df.queryExecution.toRdd.foreachPartition(_ => ())
          Files.writeString(Paths.get(dir, s"$name.txt"),
            df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode))
        } catch { case e: Throwable =>
          System.err.println(s"[qprofile] plan dump failed for $name: ${e.getMessage}")
        }
      }
    }
    spark.stop()
  }
}
