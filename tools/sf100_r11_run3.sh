#!/bin/bash
set -x
cd "$(dirname "$0")/.."
B=tools/sf100_batch.sh
SPARK_GRAFT_VERIFY_COALESCE=0 $B multiset li_b q26_ratio_features q28_feature_combine
SPARK_GRAFT_VERIFY_COALESCE=0 $B multiset li_c q43_grouped_winsorize q54_mahalanobis
SPARK_GRAFT_VERIFY_COALESCE=0 $B multiset li_d q63_group_percent_rank dd_minhash
SPARK_GRAFT_VERIFY_COALESCE=0 $B except med_a2 q02_filter_project q99_abc q50_grouped_topk q94_market_basket q113_item_sim mm_scene_cuts
$B check tiny_c q133_basket_profile
SPARK_GRAFT_CPUS=16 SPARK_DRIVER_MEM=90g $B check heavy_a q114_triangles
SPARK_GRAFT_CPUS=16 SPARK_DRIVER_MEM=90g $B check heavy_b graph_kcore
SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=60g tools/run.sh graft.Verify target/testdata/sf100 /tmp/sf100_r11_q60 q60_grouped_mad 2>&1 | grep "\[verify\]" || true
ORACLE_DUCKDB_MEM=60GB ORACLE_DUCKDB_TMP=target/ducktmp python3 tools/oracle_quantiles_staged.py target/testdata/sf100 /tmp/sf100_r11_q60 q60_grouped_mad 2>&1 | tee target/sf100_r11_q60.log
rm -rf /tmp/sf100_r11_q60
SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=60g tools/run.sh graft.Verify target/testdata/sf100 /tmp/sf100_r11_pr q98_pagerank 2>&1 | grep "\[verify\]" || true
ORACLE_DUCKDB_MEM=80GB ORACLE_DUCKDB_TMP=target/ducktmp python3 tools/oracle_pagerank_staged.py target/testdata/sf100 /tmp/sf100_r11_pr 2>&1 | tee target/sf100_r11_pr.log
rm -rf /tmp/sf100_r11_pr
SPARK_GRAFT_VERIFY_COALESCE=0 $B multiset melt q36_melt
echo "RUN3 DONE"
