package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch structures for corpus statistics at scale (SURVEY.md §2.4
  * extension). Spark already ships HLL++ (`approx_count_distinct`, q29)
  * and KLL-style quantiles (`approx_percentile`, q4G); this adds the
  * third classic: a Count-Min sketch for frequency estimation / heavy
  * hitters over unbounded token streams.
  *
  * The sketch is DETERMINISTIC (seeded pairwise hashes over the
  * engine-portable 60-bit md5), so unlike most sketch implementations it
  * is differentially testable — the DuckDB oracle rebuilds the identical
  * depth×width table and the estimates hash-match exactly (q7C), on top
  * of the analytic guarantee est ≥ true ∧ est ≤ true + εN.
  *
  * Scale posture: the build is one explode(depth) + partial-agg shuffle
  * whose distinct-key space is depth×width (constant, e.g. 4×1024) —
  * map-side combine collapses each partition to ≤ depth×width rows no
  * matter the corpus size; estimates probe the (tiny) table by
  * broadcast-joinable literal buckets.
  */
object Sketches {

  /** Pairwise-independent hash constants (seed distinct from MinHash's). */
  def cmsCoeffs(depth: Int): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(4242)
    Seq.fill(depth)((rnd.nextInt(Int.MaxValue - 1).toLong + 1L,
      rnd.nextInt(Int.MaxValue).toLong))
  }

  /** Row `j`'s bucket for a token column: ((a_j·(h mod P) + b_j) mod P)
    * mod width, h = portableHash (60-bit md5) — every step in BIGINT
    * range, reproducible verbatim in the oracle.
    */
  def bucketOf(token: Column, j: Int, width: Int, coeffs: Seq[(Long, Long)]): Column = {
    val (a, b) = coeffs(j)
    ((lit(a) * (TextStats.portableHash(token) % TextStats.HashMod) + lit(b))
      % TextStats.HashMod) % width
  }

  /** Build the depth×width Count-Min table over whitespace tokens:
    * (row, bucket, cnt). The groupBy key space is depth×width, so the
    * shuffle moves ≤ depth×width rows per map partition.
    */
  def countMinTable(df: DataFrame, textCol: String,
                    width: Int = 1024, depth: Int = 4): DataFrame = {
    val coeffs = cmsCoeffs(depth)
    df.select(explode(TextStats.tokens(col(textCol))).as("_w"))
      .select(explode(array((0 until depth).map(j =>
        struct(lit(j).as("row"), bucketOf(col("_w"), j, width, coeffs).as("bucket"))): _*))
        .as("_rb"))
      .groupBy(col("_rb.row").as("row"), col("_rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Count-Min frequency estimates for `probes`, alongside exact counts:
    * (word, exact_cnt, cms_est, lower_bound_ok). The estimate is the
    * min over rows of the probed bucket; `lower_bound_ok` asserts the
    * sketch's one-sided guarantee est ≥ exact.
    */
  def countMinEstimates(df: DataFrame, textCol: String, probes: Seq[String],
                        width: Int = 1024, depth: Int = 4): DataFrame = {
    require(probes.nonEmpty, "probes must be non-empty")
    val coeffs = cmsCoeffs(depth)
    val table = countMinTable(df, textCol, width, depth)
    val spark = df.sparkSession
    import spark.implicits._
    val probeBuckets = probes.toDF("word")
      .select(col("word"), explode(array((0 until depth).map(j =>
        struct(lit(j).as("row"), bucketOf(col("word"), j, width, coeffs).as("bucket"))): _*))
        .as("_rb"))
      .select(col("word"), col("_rb.row").as("row"), col("_rb.bucket").as("bucket"))
    // the CMS table is the build side: it is bounded by depth×width rows
    // (constant), and a LEFT outer join can only broadcast its right side
    val est = probeBuckets.join(broadcast(table), Seq("row", "bucket"), "left")
      .groupBy(col("word"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
    val exact = df.select(explode(TextStats.tokens(col(textCol))).as("word"))
      .where(col("word").isin(probes: _*))
      .groupBy(col("word")).agg(count(lit(1)).as("exact_cnt"))
    est.join(exact, Seq("word"), "left")
      .select(col("word"),
        coalesce(col("exact_cnt"), lit(0L)).as("exact_cnt"),
        col("cms_est"),
        (col("cms_est") >= coalesce(col("exact_cnt"), lit(0L))).as("lower_bound_ok"))
  }
}
