#!/bin/bash
# Round-11 sf100 tail runner: for each query batch, dump the Spark side
# (graft.Verify), compare against the DuckDB oracle, then DELETE the
# dump before the next batch — the 52 GB free disk can't hold all 66
# sf100 dumps at once. Compare mode per batch:
#   check  — tools/oracle_check.py  (pandas cell compare; small outputs)
#   except — tools/oracle_except.py (streamed EXCEPT ALL inside DuckDB;
#            the >=20M-row per-row surfaces)
# Usage: tools/sf100_batch.sh <check|except> <out_tag> query [query ...]
set -e
cd "$(dirname "$0")/.."
MODE=$1; TAG=$2; shift 2
SF=target/testdata/sf100
OUT=/tmp/sf100_r11_$TAG
LOG=target/sf100_r11_$TAG.log
mkdir -p "$(dirname "$LOG")"
echo "== batch $TAG ($MODE): $*" | tee "$LOG"
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-60g} \
  tools/run.sh graft.Verify "$SF" "$OUT" "$@" 2>&1 | grep "\[verify\]" | tee -a "$LOG" || true
if [ "$MODE" = except ]; then
  ORACLE_DUCKDB_MEM=${ORACLE_DUCKDB_MEM:-80GB} ORACLE_DUCKDB_TMP=target/ducktmp \
    python3 tools/oracle_except.py "$SF" "$OUT" "$@" 2>&1 | tee -a "$LOG"
elif [ "$MODE" = multiset ]; then
  ORACLE_DUCKDB_MEM=${ORACLE_DUCKDB_MEM:-80GB} ORACLE_DUCKDB_TMP=target/ducktmp \
    python3 tools/oracle_multiset.py "$SF" "$OUT" "$@" 2>&1 | tee -a "$LOG"
else
  ORACLE_DUCKDB_MEM=${ORACLE_DUCKDB_MEM:-80GB} ORACLE_DUCKDB_TMP=target/ducktmp \
    python3 tools/oracle_check.py "$SF" "$OUT" "$@" 2>&1 | tee -a "$LOG"
fi
rm -rf "$OUT"
