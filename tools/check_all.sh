#!/bin/bash
# One-shot round check: compile, full test suite, oracle verify, bench.
# Usage: tools/check_all.sh [sf_verify_dir] [sf_bench_dir]
set -e
cd "$(dirname "$0")/.."
VSF=${1:-/root/testdata/sf0.01}
BSF=${2:-/root/testdata/sf0.1}
echo "== test ==";    sbt -batch test 2>&1 | grep -E "Tests:|FAILED" | head -3
echo "== verify =="
sbt -batch "runMain graft.Verify $VSF /root/verify_out" 2>&1 | grep -E "verify\] " || true
python3 tools/check_oracle.py "$VSF" /root/verify_out 2>/dev/null | tail -2
echo "== bench =="
SPARK_GRAFT_SF_DIR=$BSF SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"'
