#!/bin/bash
# Round-close test runner: takes the SAME lock as tools/run.sh so the
# suite never co-tenants a heavy sf100 verify (r11's 10 phantom MlSpec
# failures were shuffle-spill disk-full from exactly that overlap).
# Usage: tools/sbt_test.sh [sbt args...]   (default: test)
set -e
cd "$(dirname "$0")/.."
mkdir -p target
exec flock -w 86400 target/.graft.lock sbt -batch "${@:-test}"
