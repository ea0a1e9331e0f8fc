#!/bin/bash
# r12 retry stream — runs IN PARALLEL with the main sweep: the flock in
# tools/run.sh serializes the Spark phases, ORACLE_DUCKDB_TMP isolates
# this stream's DuckDB spill from the main stream's batch cleanup, and
# both DuckDB memory caps sum under the box's RAM. Everything here was
# lost to co-tenant disk pressure in the first pass (the 55 GB
# ducktmp_staged leak, now wiped per batch). FORCE=1: these run solo-ish
# with the most free disk the round gets, and the first-pass refusals
# were transient dips or stats garbage, not real sizes.
set -x
cd "$(dirname "$0")/.."
B=tools/sf100_batch2.sh
export ORACLE_DUCKDB_TMP=target/ducktmp_r
export ORACLE_DUCKDB_MEM=40GB
export SPARK_GRAFT_VERIFY_FORCE=1
# med_a refugees (verify phase hit the 6.8 GB window)
SPARK_GRAFT_VERIFY_COALESCE=0 $B multiset med_a2 q02_filter_project q50_grouped_topk mm_scene_cuts mm_shared_frames
# tiny_b stats in small groups, DuckDB at 8 threads (q114 recipe)
export ORACLE_DUCKDB_THREADS=8
$B check tb_r1 q66_ks_test q67_chi2 q79_mann_whitney
$B check tb_r2 q81_chi2_residuals q83_trimmed_mean q84_cramers_v
$B check tb_r3 q112_weighted_median q115_dq_audit q116_partial_corr
$B check tb_r4 q121_rank_churn q133_basket_profile q134_pairgrid
ORACLE_DUCKDB_THREADS=4 ORACLE_DUCKDB_MEM=25GB $B check tb_r5 q114_triangles
unset ORACLE_DUCKDB_THREADS
# the 1.8B-row melt, solo-ish (its 8.5 GB estimate was real)
SPARK_GRAFT_VERIFY_COALESCE=0 $B multiset melt2 q36_melt
# q94/q113: pair shuffle + items checkpoint need tens of GB each
SPARK_GRAFT_VERIFY_COALESCE=0 SPARK_GRAFT_SHUFFLE=256 $B multiset q94 q94_market_basket
SPARK_GRAFT_VERIFY_COALESCE=0 SPARK_GRAFT_SHUFFLE=256 $B multiset q113 q113_item_sim
SPARK_GRAFT_VERIFY_COALESCE=0 SPARK_GRAFT_SHUFFLE=256 $B multiset kcore graph_kcore
# pagerank last (its staged DB gets its own dir, wiped here only)
SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=60g SPARK_GRAFT_VERIFY_COALESCE=0 SPARK_GRAFT_VERIFY_FORCE=1 tools/run.sh graft.Verify target/testdata/sf100 target/tmp_sf100_r12_pr q98_pagerank 2>&1 | tee target/sf100_r12_pr2_verify.log | grep "\[verify\]" | tee target/sf100_r12_pr2.log || true
ORACLE_STAGED_DB=target/ducktmp_r_staged/pr.duckdb ORACLE_DUCKDB_MEM=60GB python3 tools/oracle_pagerank_staged.py target/testdata/sf100 target/tmp_sf100_r12_pr 2>&1 | tee -a target/sf100_r12_pr2.log
rm -rf target/tmp_sf100_r12_pr target/ducktmp_r target/ducktmp_r_staged
echo "RETRY DONE"
