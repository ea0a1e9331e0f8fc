#!/bin/bash
# Last q94 attempt: the 60g/32-thread run OOM'd (items checkpoint +
# 32 concurrent pair-agg tasks contend for execution memory); 90g heap
# and 16 threads halve the concurrent buffers.
set -x
cd "$(dirname "$0")/.."
SPARK_GRAFT_VERIFY_FORCE=1 SPARK_GRAFT_VERIFY_COALESCE=0 SPARK_GRAFT_SHUFFLE=256 \
SPARK_GRAFT_CPUS=16 SPARK_DRIVER_MEM=90g \
  tools/sf100_batch2.sh multiset q94b q94_market_basket
