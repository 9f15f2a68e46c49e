#!/bin/bash
# Full-suite chunked runner (tests/README policy): one pytest process per
# file with a 15-min bound, per-file rc + wall recorded, slowest tests
# listed per file (--durations) so future rounds can target cuts.
# Usage: bash benchmarks/run_full_suite.sh logs/pytest_full_r5.txt
set -u
LOG=${1:-logs/pytest_full_r5.txt}
mkdir -p "$(dirname "$LOG")"
{
  echo "Full-suite green log, round 5 ($(date))"
  echo "Policy (tests/README): this 1-core box cannot run all files in one"
  echo "pytest invocation inside a 55-min bound; the suite runs as per-file"
  echo "chunks with a 15-min per-file bound. Same tests, same interpreter,"
  echo "same 8-virtual-device CPU config; per-file rc and wall time recorded."
  echo
} > "$LOG"
T0=$(date +%s)
FAIL=0
for f in tests/test_*.py; do
  t0=$(date +%s)
  out=$(timeout 900 python -m pytest "$f" -q --durations=5 2>&1)
  rc=$?
  t1=$(date +%s)
  echo "[$f] rc=$rc wall=$((t1 - t0))s" >> "$LOG"
  echo "$out" | tail -10 >> "$LOG"
  echo >> "$LOG"
  [ $rc -ne 0 ] && FAIL=1
  echo "[$f] rc=$rc wall=$((t1 - t0))s"
done
T1=$(date +%s)
echo "TOTAL wall=$((T1 - T0))s fail=$FAIL" | tee -a "$LOG"
exit $FAIL
