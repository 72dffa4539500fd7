package graft

/** Regression gates over PHYSICAL PLAN SHAPE: PLANS.md's audit rows as
  * assertions, so a plan regression (lost pushdown, a join falling back
  * to nested-loop, a shuffle creeping into a shuffle-free operator)
  * fails the suite instead of waiting for a bench round to notice.
  * Static plans on sf0.001; q8C additionally executes so AQE finalizes
  * and the measured exchange reuse stays load-bearing.
  */
class PlanGateSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)

  private def exchanges(p: String): Int =
    "\\(\\d+\\) Exchange".r.findAllIn(p).size

  test("q02: filter reaches the parquet scan, no shuffle") {
    val p = plan("q02_filter_case")
    assert(p.contains("PushedFilters: ["), s"pushdown lost:\n$p")
    assert(exchanges(p) == 0, s"filter+project must not shuffle:\n$p")
  }

  test("q03: dimension joins broadcast, never sort-merge") {
    val p = plan("q03_join_nation_revenue")
    assert(p.contains("BroadcastHashJoin"), s"dims must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"dim join regressed to SMJ:\n$p")
  }

  test("q28: 1-column projection prunes the document scan to text only") {
    val p = plan("q28_word_counts")
    assert(p.contains("ReadSchema: struct<text:string>"),
      s"column pruning lost — scan reads more than `text`:\n$p")
  }

  test("q7F: tf-idf top-terms keeps the r6 fix — hash join, no nested loop") {
    val p = plan("q7F_top_terms")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"r6 NLJ regression returned:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"vocab join must broadcast:\n$p")
    assert(exchanges(p) <= 2, s"q7F grew shuffles (audited at 2):\n$p")
  }

  test("q8H: weighted sampling plans as per-partition heaps, zero shuffles") {
    val p = plan("q8H_weighted_sample")
    assert(p.contains("TakeOrderedAndProject"),
      s"weighted sample must plan as TakeOrderedAndProject:\n$p")
    assert(exchanges(p) == 0, s"race sampling must not shuffle:\n$p")
  }

  test("q9N: content-defined chunking stays a pure per-doc pass — zero " +
      "shuffles, scan pruned to (doc_id, text)") {
    val p = plan("q9N_cdc_chunks")
    assert(exchanges(p) == 0, s"CDC chunking must not shuffle:\n$p")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"scan must read only (doc_id, text):\n$p")
  }

  test("q9L: temperature rates ride a broadcast join, never sort-merge") {
    val p = plan("q9L_temperature_sample")
    assert(p.contains("BroadcastHashJoin"),
      s"the sources-sized rate table must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"rate join regressed to SMJ:\n$p")
  }

  test("qAC: the content-grouped view read is a pruned parquet scan of " +
      "the adopted generation — zero exchanges (the refresh paid the " +
      "work; the read must not)") {
    val p = plan("qAC_content_view")
    assert(exchanges(p) == 0, s"the view read must not shuffle:\n$p")
  }

  test("qAB: the post-maintenance catalog read stays a bridged store " +
      "scan with zero exchanges (pushdown INSIDE the bridge is " +
      "VStoreCatalogSpec's plan assertion)") {
    val p = plan("qAB_sql_maintenance")
    assert(exchanges(p) == 0, s"the maintained-store read must not shuffle:\n$p")
    assert(p.contains("VStoreV1Bridge"),
      s"the read must plan through the store's bridged scan:\n$p")
  }

  test("qAG: the SQL-created view's catalog read is the adopted " +
      "generation's bridged parquet scan — zero exchanges (create/" +
      "refresh paid the work; SELECT must not)") {
    val p = plan("qAG_sql_view")
    assert(exchanges(p) == 0, s"the SQL view read must not shuffle:\n$p")
    assert(p.contains("GraftViewV1Bridge"),
      s"the read must plan through the view table's bridged scan:\n$p")
  }

  test("qAH: the pre-image feed reads through the store's bridged scan " +
      "with zero outer exchanges; the INNER computed plan broadcasts " +
      "the LOCALLY-collected touched keys (one gated-window scan per " +
      "execution) and shuffles at most once (the window-start fold)") {
    val p = plan("qAH_preimage_feed")
    assert(p.contains("VStoreV1Bridge"),
      s"the feed must plan through the bridged scan:\n$p")
    assert(exchanges(p) == 0, s"the outer read must not shuffle:\n$p")
    // the bridge hides the computed plan — assert the inner frame the
    // bridge executes (same construction as the reader's, shared impl)
    val st = graft.store.VersionedCandleStore(spark, tmpDir("plangate-pre") + "/v")
    import spark.implicits._
    def c(code: String, o: Double) = graft.model.Candle(
      "UPBIT", code, 60, ts("2022-01-01 10:00:00"), o, o, o, o, 1.0, 0L)
    st.commit(Seq(c("BTC", 1)).toDF())
    st.commit(Seq(c("BTC", 2)).toDF())
    val inner = st.changesSincePre(1L).queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(inner.contains("BroadcastHashJoin LeftSemi"),
      s"the pre-image fold must semi-join the BROADCAST touched keys:\n$inner")
    // the public path's touched keys are a construction-time
    // LocalRelation (the round-19 single-scan shape): the plan must
    // probe it, not re-derive the keys from a second window scan
    assert(inner.contains("LocalTableScan"),
      s"the touched keys must be a driver-local relation:\n$inner")
    // at most ONE exchange, delta-bound: the window-start max_by fold
    // (touched-history-sized). The touched-key distinct no longer rides
    // the executed plan — it ran once at construction. Anything more
    // means the store itself started riding a shuffle.
    assert(exchanges(inner) <= 1,
      s"the feed must not re-shuffle the store:\n$inner")
  }

  test("q8C: AQE reuses the gram/fit exchanges in the FINAL plan") {
    val df = SparkEntry.queries("q8C_dsir_weights")(spark, sf)
    // execute THIS QueryExecution so the adaptive plan finalizes —
    // count() would re-plan from the logical plan and hide reuse
    df.queryExecution.toRdd.foreachPartition(_ => ())
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("ReusedExchange"),
      s"the measured one-gram-pass reuse is gone from the final plan:\n$p")
  }
}
