#!/usr/bin/env bash
# Full local replica of the driver's gates: build, unit tests,
# DuckDB-oracle correctness at sf0.01, bench at sf0.1.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== compile + unit tests =="
sbt -batch compile test

echo "== correctness (sf0.01, DuckDB oracle) =="
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
python3 tools/compare.py /root/testdata/sf0.01 /tmp/verify_out

echo "== bench (sf0.1) =="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
  sbt -batch "runMain graft.Bench" | grep -F '{"metric"'
# no '|| true': Bench exits nonzero when any query errors, and under
# pipefail that must fail this gate (grep also fails if no JSON line)
