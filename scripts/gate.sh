#!/usr/bin/env bash
# Full local replica of the driver's per-round gate, one command:
#   compile -> unit specs -> Verify@sf0.01 -> DuckDB oracle -> Bench@sf0.1
# Usage: scripts/gate.sh [--no-bench]
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== compile + unit specs =="
sbt -batch test

echo "== correctness dump (sf0.01) =="
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/gate_verify"

echo "== DuckDB oracle compare =="
python3 scripts/oracle_check.py /root/testdata/sf0.01 /tmp/gate_verify

if [[ "${1:-}" != "--no-bench" ]]; then
  echo "== bench (sf0.1) =="
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" \
    | grep -oE '\{"metric".*\}' || true
fi
echo "== gate complete =="
