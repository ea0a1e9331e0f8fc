#!/bin/bash
# Revised round-11 sf100 runner (v2): tiny_a + staged q07/q33 already
# green; remaining batches below. q79-probe showed a single 600M-row
# window sort costs ~15 s in DuckDB — only q07's 4-sort join shape was
# pathological (staged replay, see oracle_quantiles_staged.py).
set -x
cd "$(dirname "$0")/.."
B=tools/sf100_batch.sh
$B check tiny_b q60_grouped_mad q66_ks_test q67_chi2 q79_mann_whitney q81_chi2_residuals q83_trimmed_mean q84_cramers_v q105_ref_integrity q112_weighted_median q114_triangles q115_dq_audit q116_partial_corr q121_rank_churn q133_basket_profile q134_pairgrid
SPARK_GRAFT_VERIFY_COALESCE=0 $B except med_a q02_filter_project q99_abc q50_grouped_topk q94_market_basket q113_item_sim graph_kcore mm_phash mm_scene_cuts
SPARK_GRAFT_VERIFY_COALESCE=0 $B except med_b st_dedup st_sessionize st_session_window st_scd2 st_interval_join_left tx_winnow tx_hash_features
SPARK_GRAFT_VERIFY_COALESCE=0 $B except ord_a q05_window q100_bollinger q101_robust_z q20_ordinal_encode q29_rename_chain q30_minmax_scale
SPARK_GRAFT_VERIFY_COALESCE=0 $B except ord_b q39_moving_avg q45_decile q48_percent_rank q52_range_frame q58_ewma q59_diff q92_expanding q22_bool_map q23_bucket_map
SPARK_GRAFT_VERIFY_COALESCE=0 $B multiset li_a q08_outlier_clip q25_standard_scale
SPARK_GRAFT_VERIFY_COALESCE=0 $B multiset li_b q26_ratio_features q28_feature_combine
SPARK_GRAFT_VERIFY_COALESCE=0 $B multiset li_c q43_grouped_winsorize q54_mahalanobis
SPARK_GRAFT_VERIFY_COALESCE=0 $B multiset li_d q63_group_percent_rank dd_minhash
SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=60g tools/run.sh graft.Verify target/testdata/sf100 /tmp/sf100_r11_pr q98_pagerank 2>&1 | grep "\[verify\]" || true
ORACLE_DUCKDB_MEM=80GB ORACLE_DUCKDB_TMP=target/ducktmp python3 tools/oracle_pagerank_staged.py target/testdata/sf100 /tmp/sf100_r11_pr 2>&1 | tee target/sf100_r11_pr.log
rm -rf /tmp/sf100_r11_pr
SPARK_GRAFT_VERIFY_COALESCE=0 $B multiset melt q36_melt
echo "ALL BATCHES DONE"
# --- r11 retries appended mid-run (collateral kills + solo-memory cases) ---
SPARK_GRAFT_VERIFY_COALESCE=0 $B except med_a2 q02_filter_project q99_abc q50_grouped_topk q94_market_basket q113_item_sim mm_scene_cuts
$B check tiny_c q133_basket_profile
SPARK_GRAFT_CPUS=16 SPARK_DRIVER_MEM=90g $B check heavy_a q114_triangles
SPARK_GRAFT_CPUS=16 SPARK_DRIVER_MEM=90g $B check heavy_b graph_kcore
SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=60g tools/run.sh graft.Verify target/testdata/sf100 /tmp/sf100_r11_q60 q60_grouped_mad 2>&1 | grep "\[verify\]" || true
ORACLE_DUCKDB_MEM=60GB ORACLE_DUCKDB_TMP=target/ducktmp python3 tools/oracle_quantiles_staged.py target/testdata/sf100 /tmp/sf100_r11_q60 q60_grouped_mad 2>&1 | tee target/sf100_r11_q60.log
rm -rf /tmp/sf100_r11_q60
echo "RETRY BATCHES DONE"
