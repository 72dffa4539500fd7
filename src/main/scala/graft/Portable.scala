package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable helpers: expressions whose results are bit-identical
  * across Spark and any IEEE-754-double SQL engine (the DuckDB oracle).
  */
object Portable {

  /** Round-half-away-from-zero via explicit double arithmetic:
    * `floor(x * 10^n + 0.5) / 10^n` (mirrored for negatives).
    *
    * Native `round` differs between engines on knife-edge doubles
    * (Spark rounds the exact binary expansion via BigDecimal HALF_UP;
    * DuckDB scales-then-rounds, so the scaling multiply can push
    * x.4999…9 up to x.5). This formula is the same IEEE double op
    * sequence everywhere, so both engines agree by construction.
    * Magnitudes must stay below 2^53 / 10^n.
    */
  def round(c: Column, n: Int): Column = {
    val s = math.pow(10, n)
    when(c >= 0, floor(c * s + 0.5) / s).otherwise(-(floor(-c * s + 0.5) / s))
  }

  /** The same expression, rendered as DuckDB SQL. */
  def roundSql(e: String, n: Int): String = {
    val s = s"1e$n"
    s"(CASE WHEN ($e) >= 0 THEN floor(($e) * $s + 0.5) / $s ELSE -(floor(-($e) * $s + 0.5) / $s) END)"
  }
}
