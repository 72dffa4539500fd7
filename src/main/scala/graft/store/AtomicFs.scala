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
  * stores provide none of them through legacy connector semantics
  * (rename is copy+delete, plain creates are last-writer-wins) —
  * running the rename-based commit protocols there can publish
  * half-renamed markers and let two "exclusive" creators both
  * succeed. Two SUPPORTED ways in:
  *
  *  1. '''Conditional-put primitives''' (the real seam): list the
  *     scheme in `graft.store.conditionalPutSchemes` to declare its
  *     connector provides atomic whole-object conditional creates
  *     (`create(p, overwrite = false)` failing-at-close when `p`
  *     exists — S3 `If-None-Match: *` conditional writes, GCS
  *     `if-generation-match: 0`, Azure `If-None-Match: *`) and
  *     consistent listings. Every commit protocol then runs
  *     RENAME-FREE through [[ConditionalPutPrimitives]] — the
  *     protocols' crash prefixes are spec-proven on a
  *     no-atomic-rename filesystem shim (ObjectStoreSimSpec).
  *  2. `graft.store.unsafeObjectStoreCommits=true` — the legacy
  *     unsafe override for stores fronted by an external consistency
  *     layer; the rename protocol runs as-is, risk accepted.
  *
  * Object-store schemes declared under NEITHER conf stay refused at
  * construction time.
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
        !scheme.exists(CommitPrimitives.conditionalPutSchemes(spark).contains) &&
        !spark.conf.getOption(overrideConf).exists(_.equalsIgnoreCase("true")))
      throw new IllegalArgumentException(
        s"$what at '$path': ${scheme.get}:// is an object store without " +
          "atomic rename / create-exclusive, which graft's crash-atomic " +
          "commit protocols (intent publish, journal reserve, cross-store " +
          "2PC marker) require — a crash there can surface half-committed " +
          "state. If the connector supports atomic conditional creates " +
          "(S3 If-None-Match conditional writes and equivalents), add the " +
          s"scheme to ${CommitPrimitives.schemesConf} to run the " +
          "rename-free conditional-put commit protocol; otherwise use " +
          s"HDFS or a posix-consistent filesystem, or set $overrideConf=" +
          "true to accept the risk on a store-provided consistency layer.")
  }
}
