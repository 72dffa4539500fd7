#!/bin/bash
# Cross-SF correctness gate: dump the full query corpus at every
# sf* under the testdata root, then replay the driver's DuckDB compare
# per SF. Exits non-zero on ANY mismatch at ANY scale factor.
#
#   tools/verify_all_sf.sh [testdataRoot] [outRoot]
#
# Wall-clock is ~3x one Verify run; use before closing a round to keep
# the corpus provably correct at sf0.001 / sf0.01 / sf0.1, not just the
# driver's sf0.01.
set -u -o pipefail
ROOT="${1:-/root/testdata}"
OUT="${2:-/tmp/verify_all_sf}"
cd "$(dirname "$0")/.."

# Fresh output dir: a stale $OUT from a previous invocation would let
# oracle_check compare old dumps and report a false green if this
# Verify run fails partway.
rm -rf "$OUT"

# 2>&1: Verify reports per-query failures on STDERR ("[verify] <name>
# failed"); discarding stderr would silence exactly those diagnostics.
# pipefail + explicit status check: grep must not swallow sbt failures.
sbt -batch "runMain graft.Verify --all-sf $ROOT $OUT" 2>&1 | grep '\[verify\]'
if [ $? -ne 0 ]; then
  echo "== verify run FAILED (sbt exit or no [verify] output) ==" >&2
  exit 2
fi

fail=0
total_ok=0
total_bad=0
for sf in "$ROOT"/sf*/; do
  name="$(basename "$sf")"
  echo "== $name =="
  out="$(python3 tools/oracle_check.py "$sf" "$OUT/$name")"
  rc=$?
  echo "$out" | grep -v ' MATCH '   # full list only for non-matches
  summary="$(echo "$out" | tail -1)"
  echo "$summary"
  total_ok=$((total_ok + $(echo "$summary" | sed -E 's/== ([0-9]+) match, ([0-9]+) mismatch ==/\1/')))
  total_bad=$((total_bad + $(echo "$summary" | sed -E 's/== ([0-9]+) match, ([0-9]+) mismatch ==/\2/')))
  [ $rc -ne 0 ] && fail=1
done
echo "== ALL-SF TOTAL: $total_ok match, $total_bad mismatch =="
exit $fail
