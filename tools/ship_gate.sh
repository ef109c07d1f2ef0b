#!/usr/bin/env bash
# Round-close ship gate (VERDICT r13 prescription 1): run the FULL catalog
# through Verify at all three scale factors, then through BOTH local
# replicas of the driver's correctness gate — tools/check.py (arrow/repr
# compare) and tools/strcheck.py (the pandas-string hash-gate replica that
# caught the r12/r13 DECIMAL->float64 class). A query cannot ship unless
# every (sf, gate) cell is green.
#
# Usage: tools/ship_gate.sh [outRoot]   (default /tmp/shipgate)
set -euo pipefail
cd "$(dirname "$0")/.."
ROOT="${1:-/tmp/shipgate}"
rm -rf "$ROOT"
FAIL=0
for SF in 0.001 0.01 0.1; do
  OUT="$ROOT/sf$SF"
  echo "=== Verify sf$SF -> $OUT"
  sbt -batch "runMain graft.Verify /root/testdata/sf$SF $OUT" 2>&1 | tail -2
  echo "--- check.py sf$SF"
  python3 tools/check.py "$OUT" "/root/testdata/sf$SF" | tail -3 || FAIL=1
  echo "--- strcheck.py sf$SF"
  python3 tools/strcheck.py "$OUT" "/root/testdata/sf$SF" | tail -3 || FAIL=1
done
if [ "$FAIL" -ne 0 ]; then echo "SHIP GATE: RED"; exit 1; fi
echo "SHIP GATE: ALL GREEN (3 SFs x 2 gates)"
