#!/bin/bash
# Third wave: queries lost to the two-stream disk crunches. Full DuckDB
# memory (the q112 weighted-median sort needs it), default threads,
# small groups, FORCE (outputs known-small or already gate-sized).
set -x
cd "$(dirname "$0")/.."
B=tools/sf100_batch2.sh
export SPARK_GRAFT_VERIFY_FORCE=1
$B check rq_a q83_trimmed_mean q115_dq_audit q116_partial_corr
$B check rq_b q112_weighted_median
SPARK_GRAFT_VERIFY_COALESCE=0 $B multiset rq_c q08_outlier_clip
SPARK_GRAFT_VERIFY_COALESCE=0 $B multiset rq_d q26_ratio_features q28_feature_combine
SPARK_GRAFT_VERIFY_COALESCE=0 $B multiset rq_e q43_grouped_winsorize q54_mahalanobis
SPARK_GRAFT_VERIFY_COALESCE=0 $B multiset rq_f q63_group_percent_rank
echo "REQUEUE DONE"
