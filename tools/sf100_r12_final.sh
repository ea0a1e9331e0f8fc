#!/bin/bash
# Final wave: stragglers from the r12 crunch windows, serialized
# compares (duck.lock), full DuckDB memory, FORCE.
set -x
cd "$(dirname "$0")/.."
B=tools/sf100_batch2.sh
export SPARK_GRAFT_VERIFY_FORCE=1
$B check fw_a q83_trimmed_mean q121_rank_churn q133_basket_profile
SPARK_GRAFT_VERIFY_COALESCE=0 $B multiset fw_b q08_outlier_clip
SPARK_GRAFT_VERIFY_COALESCE=0 $B multiset fw_c q26_ratio_features q28_feature_combine
SPARK_GRAFT_VERIFY_COALESCE=0 $B multiset fw_d q43_grouped_winsorize q54_mahalanobis
SPARK_GRAFT_VERIFY_COALESCE=0 $B multiset fw_e q63_group_percent_rank
echo "FINAL DONE"
