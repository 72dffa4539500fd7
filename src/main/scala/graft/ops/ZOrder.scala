package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for multi-dimensional data
  * skipping. Parquet prunes row groups by per-file min/max statistics;
  * a single-column sort gives tight bounds in ONE dimension and useless
  * bounds in every other. Interleaving the bits of two key columns and
  * range-partitioning on the result gives every output file a compact
  * bounding box in BOTH dimensions, so range predicates on either (or
  * both) skip most files — the standard layout optimization for
  * "filter by time AND key" scans at 100 TB (Delta/Iceberg OPTIMIZE
  * ZORDER; here as a plain DataFrame transform ahead of any parquet
  * write).
  *
  * The z-value kernel is a compiled UDF (the repo's convention for hot
  * per-row kernels); clustering is one range-repartition shuffle —
  * exactly the cost of the single-column sort it replaces.
  */
object ZOrder {

  /** Bit-interleave `d` non-negative coordinates: coordinate k's bit i
    * lands at output bit `i*d + k` (for d=2 this is the classic
    * even/odd-bit Morton interleave). `bitsPerDim * d` ≤ 63 keeps the
    * result positive in a LONG.
    */
  private[graft] def interleaveN(coords: Array[Long], bitsPerDim: Int): Long = {
    val d = coords.length
    var z = 0L
    var i = 0
    while (i < bitsPerDim) {
      var k = 0
      while (k < d) {
        z |= ((coords(k) >> i) & 1L) << (i * d + k)
        k += 1
      }
      i += 1
    }
    z
  }

  /** Bit-interleave two non-negative coordinates: x takes even bits,
    * y odd. `bitsPerDim` ≤ 31 keeps the result positive in a LONG.
    */
  private[graft] def interleave(x: Long, y: Long, bitsPerDim: Int): Long =
    interleaveN(Array(x, y), bitsPerDim)

  /** Morton z-value of two non-negative integer columns. */
  def zValueUdf(bitsPerDim: Int = 21): UserDefinedFunction = {
    require(bitsPerDim >= 1 && bitsPerDim <= 31, "bitsPerDim in [1,31]")
    udf { (x: Long, y: Long) =>
      require(x >= 0 && y >= 0, "z-order coordinates must be non-negative")
      // out-of-range coordinates would silently drop their high bits,
      // collapsing far-apart values onto one z-value — fail loudly
      require(x < (1L << bitsPerDim) && y < (1L << bitsPerDim),
        s"z-order coordinate out of range: ($x, $y) >= 2^$bitsPerDim — " +
          "rescale (e.g. bucket timestamps) or raise bitsPerDim")
      interleave(x, y, bitsPerDim)
    }
  }

  /** Morton z-value of any number of non-negative integer columns
    * (pass them as one array column). `bitsPerDim × nDims ≤ 63`.
    * A null coordinate yields a NULL z-value — same contract as the
    * primitive-arg 2-D [[zValueUdf]] (a `Seq[Long]` parameter would
    * silently unbox a null element to 0, teleporting null-keyed rows to
    * coordinate 0 instead of keeping them out of the curve).
    */
  def zValueNUdf(nDims: Int, bitsPerDim: Int): UserDefinedFunction = {
    require(nDims >= 1, "nDims must be positive")
    require(bitsPerDim >= 1 && bitsPerDim * nDims <= 63,
      s"bitsPerDim * nDims must be in [1,63], got $bitsPerDim * $nDims")
    udf { (coords: Seq[java.lang.Long]) =>
      if (coords == null || coords.contains(null)) null
      else {
        require(coords.length == nDims, s"expected $nDims coordinates, got ${coords.length}")
        coords.foreach { boxed =>
          val c = boxed.longValue()
          require(c >= 0, "z-order coordinates must be non-negative")
          // shift-based check: `c < (1L << bitsPerDim)` would overflow to
          // Long.MinValue at bitsPerDim = 63 and reject every coordinate
          require((c >>> bitsPerDim) == 0L,
            s"z-order coordinate out of range: $c >= 2^$bitsPerDim — " +
              "rescale (e.g. bucket timestamps) or raise bitsPerDim")
        }
        java.lang.Long.valueOf(
          interleaveN(coords.map(_.longValue()).toArray, bitsPerDim))
      }
    }
  }

  /** Cluster a frame along the z-curve of (xCol, yCol) into `nFiles`
    * range partitions, each sorted by z-value — written as-is, every
    * parquet file covers a contiguous z-range, i.e. a small bounding
    * box in both dimensions. One shuffle (range repartition).
    */
  def cluster(df: DataFrame, xCol: String, yCol: String, nFiles: Int,
              bitsPerDim: Int = 21): DataFrame =
    clusterN(df, Seq(xCol, yCol), nFiles, bitsPerDim)

  /** N-dimensional [[cluster]]: z-curve over any number of key columns
    * (3-D "filter by time AND key AND region" layouts and beyond). Same
    * single range-repartition shuffle. `bitsPerDim` ≤ 0 (the default)
    * auto-sizes to `min(21, 63 / nDims)` so the z-value always fits a
    * LONG regardless of dimension count.
    */
  def clusterN(df: DataFrame, cols: Seq[String], nFiles: Int,
               bitsPerDim: Int = 0): DataFrame = {
    require(nFiles > 0, "nFiles must be positive")
    require(cols.nonEmpty, "at least one key column required")
    val bits = if (bitsPerDim > 0) bitsPerDim else math.min(21, 63 / cols.length)
    val z = zValueNUdf(cols.length, bits)(
      array(cols.map(c => col(c).cast("long")): _*))
    df.withColumn("_z", z)
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
  }
}
