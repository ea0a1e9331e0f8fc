#!/bin/bash
# r12 sweep, take 3: q07/q33/q60 go through the STAGED quantile replay
# (their single-statement oracles grind >45 min each at sf100 — the
# r11 lesson re-learned the hard way in this round's tiny_a), med/ord/
# li go through the constant-memory multiset compare. tiny_a's
# q01/q03/q04 already passed (log kept).
set -x
cd "$(dirname "$0")/.."
B=tools/sf100_batch2.sh
# remainder of tiny_a (no quantile oracles)
$B check  tiny_a2 q16_pivot q31_histogram q35_rollup q40_cube q42_grouping_sets q55_hist2d
# staged quantile replays: one Verify dump, one staged compare for all three
SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=60g tools/run.sh graft.Verify target/testdata/sf100 target/tmp_sf100_r12_qq q07_quantiles q33_group_quantiles q60_grouped_mad 2>&1 | grep "\[verify\]" | tee target/sf100_r12_qq.log || true
ORACLE_DUCKDB_MEM=60GB ORACLE_DUCKDB_TMP=target/ducktmp python3 tools/oracle_quantiles_staged.py target/testdata/sf100 target/tmp_sf100_r12_qq q07_quantiles q33_group_quantiles q60_grouped_mad 2>&1 | tee -a target/sf100_r12_qq.log
rm -rf target/tmp_sf100_r12_qq target/ducktmp
$B check  tiny_b q66_ks_test q67_chi2 q79_mann_whitney q81_chi2_residuals q83_trimmed_mean q84_cramers_v q105_ref_integrity q112_weighted_median q114_triangles q115_dq_audit q116_partial_corr q121_rank_churn q133_basket_profile q134_pairgrid
# the six r11-blocked heavies: pair aggregates get a 256-way shuffle
SPARK_GRAFT_VERIFY_COALESCE=0 SPARK_GRAFT_SHUFFLE=256 $B multiset heavy_a q94_market_basket q113_item_sim
SPARK_GRAFT_VERIFY_COALESCE=0 SPARK_GRAFT_SHUFFLE=256 $B multiset heavy_b graph_kcore mm_phash
# staged oracle: pagerank (single-statement replay exceeds disk)
SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=60g tools/run.sh graft.Verify target/testdata/sf100 target/tmp_sf100_r12_pr q98_pagerank 2>&1 | grep "\[verify\]" | tee target/sf100_r12_pr.log || true
ORACLE_DUCKDB_MEM=80GB ORACLE_DUCKDB_TMP=target/ducktmp python3 tools/oracle_pagerank_staged.py target/testdata/sf100 target/tmp_sf100_r12_pr 2>&1 | tee -a target/sf100_r12_pr.log
rm -rf target/tmp_sf100_r12_pr target/ducktmp
# the 1.8B-row melt: constant-memory multiset compare
SPARK_GRAFT_VERIFY_COALESCE=0 $B multiset melt q36_melt
# medium outputs: multiset (single streaming scan per side)
SPARK_GRAFT_VERIFY_COALESCE=0 $B multiset med_a q02_filter_project q99_abc q50_grouped_topk mm_scene_cuts mm_shared_frames
SPARK_GRAFT_VERIFY_COALESCE=0 $B multiset med_b st_dedup st_sessionize st_session_window st_scd2 st_interval_join_left tx_winnow tx_hash_features
# orders-per-row (~150M rows each)
SPARK_GRAFT_VERIFY_COALESCE=0 $B multiset ord_a q05_window q100_bollinger q101_robust_z q20_ordinal_encode q29_rename_chain q30_minmax_scale
SPARK_GRAFT_VERIFY_COALESCE=0 $B multiset ord_b q39_moving_avg q45_decile q48_percent_rank q52_range_frame q58_ewma q59_diff q92_expanding q22_bool_map q23_bucket_map
# lineitem-per-row (~600M rows each)
SPARK_GRAFT_VERIFY_COALESCE=0 $B multiset li_a q08_outlier_clip q25_standard_scale
SPARK_GRAFT_VERIFY_COALESCE=0 $B multiset li_b q26_ratio_features q28_feature_combine
SPARK_GRAFT_VERIFY_COALESCE=0 $B multiset li_c q43_grouped_winsorize q54_mahalanobis
SPARK_GRAFT_VERIFY_COALESCE=0 $B multiset li_d q63_group_percent_rank dd_minhash
echo "ALL BATCHES DONE"
