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

# Verify reports per-query failures on STDERR ("[verify] <name>
# failed"); keep the full sbt log aside and surface exactly those
# lines. A clean run has ZERO [verify] lines — so gate on sbt's OWN
# exit code and on every SF's dump landing, never on grep finding
# matches (grep exits 1 on a fully-clean log).
mkdir -p "$OUT"
sbt -batch "runMain graft.Verify --all-sf $ROOT $OUT" > "$OUT/sbt.log" 2>&1
rc=$?
grep '\[verify\]' "$OUT/sbt.log" || true
if [ $rc -ne 0 ]; then
  echo "== verify run FAILED (sbt exit $rc; see $OUT/sbt.log) ==" >&2
  exit 2
fi
for sf in "$ROOT"/sf*/; do
  if [ ! -f "$OUT/$(basename "$sf")/oracle_sql.json" ]; then
    echo "== verify run FAILED (no dump for $(basename "$sf")) ==" >&2
    exit 2
  fi
done

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
