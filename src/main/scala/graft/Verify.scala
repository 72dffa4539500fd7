package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // --all-sf <testdataRoot> <outRoot>: dump the whole corpus at EVERY
    // sf* under the root (one subdir each), so the 3-SF parity run is a
    // repeatable gate, not a one-off session claim. Compare each with
    // `tools/oracle_check.py <root>/<sf> <outRoot>/<sf>` (or run
    // `tools/verify_all_sf.sh` which does both steps).
    if (args.headOption.contains("--all-sf")) {
      val Array(_, root, outRoot) = args
      val sfs = Option(new java.io.File(root).listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.startsWith("sf"))
        .map(_.getName).sorted
      require(sfs.nonEmpty, s"no sf* dirs under $root")
      sfs.foreach(sf => run(s"$root/$sf", s"$outRoot/$sf"))
      return
    }
    val Array(sfDir, outDir) = args
    run(sfDir, outDir)
  }

  private def run(sfDir: String, outDir: String): Unit = {
    val spark = GraftSession.builder(appName = "graft-verify").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Optional name filter for local iteration (same contract as Bench);
    // oracle_sql.json is always dumped in full.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter(kv => names(kv._1))
      case None => SparkEntry.queries
    }
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        e.printStackTrace()
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
