#!/bin/bash
# Round-20 (optimization round 2) close-out chain: every gate re-run on
# the closing tree. One sbt at a time (shared target/). The two bench
# steps write full-precision artifacts via SPARK_GRAFT_BENCH_OUT.
set -u -o pipefail
cd /root/repo

echo "=== [1/7] full test suite ===" | tee /tmp/r20_chain.log
sbt -batch test 2>&1 | tail -8 > /tmp/r20_test.log
grep -E "Total number|succeeded|FAILED" /tmp/r20_test.log | tee -a /tmp/r20_chain.log

echo "=== [2/7] cross-SF gate ===" | tee -a /tmp/r20_chain.log
tools/verify_all_sf.sh /root/testdata /tmp/r20_allsf > /tmp/r20_allsf.log 2>&1
echo "verify_all_sf exit=$?" | tee -a /tmp/r20_chain.log
tail -5 /tmp/r20_allsf.log | tee -a /tmp/r20_chain.log

echo "=== [3/7] full reps=3 bench ===" | tee -a /tmp/r20_chain.log
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_REPS=3 \
  SPARK_GRAFT_BENCH_OUT=BENCH_LOCAL_r20_final.json \
  sbt -batch "runMain graft.Bench" 2>/dev/null | grep '^\[info\] {' \
  > /tmp/r20_bench.log
echo "bench exit=$? ($(wc -c < /tmp/r20_bench.log) bytes)" | tee -a /tmp/r20_chain.log

echo "=== [4/7] plan audit ===" | tee -a /tmp/r20_chain.log
sbt -batch "runMain graft.tools.PlanAudit /root/testdata/sf0.01" \
  > /tmp/r20_planaudit.log 2>&1
echo "planaudit exit=$?" | tee -a /tmp/r20_chain.log

echo "=== [5/7] ingest soak ===" | tee -a /tmp/r20_chain.log
sbt -batch "runMain graft.tools.IngestSoak 100 200 10" 2>/dev/null \
  | grep '\[ingsoak\]' > /tmp/r20_soak.log
echo "soak exit=$?" | tee -a /tmp/r20_chain.log
tail -20 /tmp/r20_soak.log | tee -a /tmp/r20_chain.log

echo "=== [6/7] locked-78 subset reps=3 ===" | tee -a /tmp/r20_chain.log
L78="q01_pricing_summary,q02_filter_case,q03_join_nation_revenue,q04_left_join_counts,q05_semi_join,q06_anti_join,q07_broadcast_brand,q08_distinct_agg,q09_rollup,q10_cube,q11_window_rank,q12_window_running,q13_topk_per_group,q14_intersect,q15_except,q16_union,q17_string_fns,q18_datetime_fns,q19_math_fns,q20_json_extract,q21_having,q22_orderby_limit,q23_cross_join,q24_full_outer,q25_range_join,q26_grouping_sets,q27_percentiles,q28_word_counts,q29_approx_distinct,q30_candles_1h,q31_resample_1d,q32_gaps,q33_vwap,q34_moving_agg,q35_sessionize,q36_daily_cum,q37_asof_join,q38_gapfill,q39_indicators,q40_store_upsert,q41_store_prune,q42_store_range,q43_map_json,q44_dedup_corpus,q45_quality_filter,q46_corpus_stats,q47_asof_tolerance,q48_asof_forward,q49_range_frame,q4A_first_last,q4B_pivot,q4C_unpivot,q4D_rank_dist,q4E_sliding_window,q4F_store_catalog,q4G_approx_percentile,q4H_edit_distance,q50_exact_dedup,q51_ngram_jaccard,q52_minhash_pairs,q53_simhash_pairs,q54_text_counts,q55_text_lang_fp,q56_topk_cosine,q57_embedding_stats,q58_cosine_neardup,q59_ivf_topk,q60_multimodal_features,q61_streaming_ingest,q62_ysf_roundtrip,q63_ivf_kmeans_recall,q64_bucketed_join,q65_image_decode,q66_doc_chunks,q67_hash_split,q68_repetition_stats,q6A_wav_decode,q6B_lsh_pairs_recall"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_REPS=3 \
  SPARK_GRAFT_ONLY="$L78" SPARK_GRAFT_BENCH_OUT=BENCH_LOCAL_r20_locked78.json \
  sbt -batch "runMain graft.Bench" 2>/dev/null | grep '^\[info\] {' \
  > /tmp/r20_locked78.log
echo "locked78 exit=$?" | tee -a /tmp/r20_chain.log

echo "=== [7/7] view-feed decade (final tree) ===" | tee -a /tmp/r20_chain.log
sbt -batch "runMain graft.tools.ViewBench /root/testdata/sf0.1 feed-decade" \
  2>/dev/null | grep '"metric"' > /tmp/r20_feeddecade.log
echo "feed-decade exit=$?" | tee -a /tmp/r20_chain.log
cat /tmp/r20_feeddecade.log | tee -a /tmp/r20_chain.log
echo "=== CHAIN FULLY DONE ===" | tee -a /tmp/r20_chain.log
