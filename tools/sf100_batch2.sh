#!/bin/bash
# Round-12 sf100 batch runner. Differences from r11's sf100_batch.sh
# (which burned ~6 oracle runs): dumps AND logs live under target/ (no
# /tmp tmpfs casualties), DuckDB temp is wiped after every batch, free
# disk is logged before/after, and graft.Verify now self-gates on disk
# headroom + cleans partial dumps on failure.
# Usage: tools/sf100_batch2.sh <check|except|multiset> <out_tag> query...
set -e
cd "$(dirname "$0")/.."
MODE=$1; TAG=$2; shift 2
SF=${SF100_DIR:-target/testdata/sf100}
OUT=target/tmp_sf100_r12_$TAG
LOG=target/sf100_r12_$TAG.log
mkdir -p target
{ echo "== batch $TAG ($MODE): $*"; df -h / | tail -1; } | tee "$LOG"
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-60g} \
  tools/run.sh graft.Verify "$SF" "$OUT" "$@" 2>&1 | grep "\[verify\]" | tee -a "$LOG" || true
if [ "$MODE" = except ]; then
  ORACLE_DUCKDB_MEM=${ORACLE_DUCKDB_MEM:-80GB} ORACLE_DUCKDB_TMP=${ORACLE_DUCKDB_TMP:-target/ducktmp} \
    flock -w 86400 target/.duck.lock python3 tools/oracle_except.py "$SF" "$OUT" "$@" 2>&1 | tee -a "$LOG"
elif [ "$MODE" = multiset ]; then
  ORACLE_DUCKDB_MEM=${ORACLE_DUCKDB_MEM:-80GB} ORACLE_DUCKDB_TMP=${ORACLE_DUCKDB_TMP:-target/ducktmp} \
    flock -w 86400 target/.duck.lock python3 tools/oracle_multiset.py "$SF" "$OUT" "$@" 2>&1 | tee -a "$LOG"
else
  ORACLE_DUCKDB_MEM=${ORACLE_DUCKDB_MEM:-80GB} ORACLE_DUCKDB_TMP=${ORACLE_DUCKDB_TMP:-target/ducktmp} \
    flock -w 86400 target/.duck.lock python3 tools/oracle_check.py "$SF" "$OUT" "$@" 2>&1 | tee -a "$LOG"
fi
rm -rf "$OUT" "${ORACLE_DUCKDB_TMP:-target/ducktmp}" target/ducktmp_staged
df -h / | tail -1 | tee -a "$LOG"
