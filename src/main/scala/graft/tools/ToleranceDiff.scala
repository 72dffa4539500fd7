package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared divergence gate for the view tools (ViewBench, IngestSoak):
  * compare an incrementally-maintained aggregate against a one-shot
  * recompute with EXACT counts and a relative tolerance on the double
  * sums — a group aggregating thousands of doubles sums in a different
  * order under the pruned incremental plan than under the full fold,
  * drifting ~1e-12 relative (the corpus oracle rounds for the same
  * reason).
  */
private[tools] object ToleranceDiff {

  /** Number of divergent groups between `incr` and `full` — both must
    * carry `keys`, an exact `n` count and a double `vol` sum. Zero
    * means equal (counts exact, sums within 1e-9 relative + 1e-9
    * absolute).
    */
  def divergentGroups(incr: DataFrame, full: DataFrame,
                      keys: Seq[String]): Long = {
    val i = incr.select(keys.map(col) ++
      Seq(col("n").as("n_i"), col("vol").as("vol_i")): _*)
    val f = full.select(keys.map(col) ++
      Seq(col("n").as("n_f"), col("vol").as("vol_f")): _*)
    i.join(f, keys, "full_outer")
      .where(col("n_i").isNull || col("n_f").isNull ||
        col("n_i") =!= col("n_f") ||
        abs(col("vol_i") - col("vol_f")) >
          abs(col("vol_f")) * lit(1e-9) + lit(1e-9))
      .count()
  }
}
