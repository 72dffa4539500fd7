package graft.store

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** The filesystem capability contract every graft commit protocol
  * stands on, checked LOUDLY up front instead of corrupting silently
  * at the first crash.
  *
  * Three primitives carry all crash-atomicity in this library — the
  * candle intent publish (`CandleStore.publishIntent`), the versioned
  * store's reserve files and journal segment publish, and the
  * cross-store 2PC marker (`CrossStoreTx`):
  *
  *  - '''atomic rename''' where the rename FAILS if the destination
  *    exists (the winner-decides point of every race);
  *  - '''create-exclusive''' (`FileSystem.create(p, overwrite=false)`
  *    failing when `p` exists — id reservation, locks);
  *  - '''list-after-write consistency''' (recovery trusts a listing).
  *
  * HDFS and local filesystems provide all three. S3-class object
  * stores provide NONE of them natively (rename is copy+delete,
  * creates are last-writer-wins, PUT-if-absent is not exposed through
  * the Hadoop `FileSystem` API) — running the commit protocols there
  * can publish half-renamed markers and let two "exclusive" creators
  * both succeed. Until a conditional-put seam exists for those stores,
  * graft REFUSES their URI schemes at construction time. Deliberate
  * unsafe override (e.g. a consistent S3-compatible store fronted by a
  * locking layer): set `graft.store.unsafeObjectStoreCommits=true` in
  * the Spark conf and accept the documented risk.
  */
object AtomicFs {

  /** URI schemes of object stores whose Hadoop connectors do not give
    * atomic rename / create-exclusive semantics. Deliberately
    * CONSERVATIVE: `abfs`/`abfss` (ADLS Gen2) IS rename-atomic when the
    * account has hierarchical namespaces enabled — but that is an
    * account property this scheme-only check cannot see, so those
    * deployments opt in explicitly via the override conf (a documented,
    * legitimate use of it) rather than the check silently assuming HNS.
    */
  private val objectStoreSchemes: Set[String] =
    Set("s3", "s3a", "s3n", "gs", "wasb", "wasbs", "abfs", "abfss",
      "oss", "cos", "cosn", "swift", "o3fs", "ofs")

  private[graft] val overrideConf = "graft.store.unsafeObjectStoreCommits"

  /** Refuse `path` if its scheme is a known object store (unless the
    * unsafe override conf is set). Scheme-only — never touches the
    * filesystem, so it is safe to call before any connector loads.
    */
  def requireAtomicCommits(spark: SparkSession, path: String,
                           what: String): Unit = {
    val scheme = Option(new Path(path).toUri.getScheme)
      .map(_.toLowerCase(java.util.Locale.ROOT))
    if (scheme.exists(objectStoreSchemes.contains) &&
        !spark.conf.getOption(overrideConf).exists(_.equalsIgnoreCase("true")))
      throw new IllegalArgumentException(
        s"$what at '$path': ${scheme.get}:// is an object store without " +
          "atomic rename / create-exclusive, which graft's crash-atomic " +
          "commit protocols (intent publish, journal reserve, cross-store " +
          "2PC marker) require — a crash there can surface half-committed " +
          "state. Use HDFS or a posix-consistent filesystem, or set " +
          s"$overrideConf=true to accept the risk on a store-provided " +
          "consistency layer.")
  }
}
