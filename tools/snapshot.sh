#!/usr/bin/env bash
# Snapshot gate runner: executes the three gates (sbt test, Verify +
# DuckDB oracle, Bench) and appends a one-line gate-summary record to
# PROGRESS.jsonl — the audit trail that lets a later reader confirm
# WHICH gates ran green at each snapshot without re-deriving it from
# CI noise. Usage: tools/snapshot.sh <round> [--skip-test] [--all]
#   --skip-test  reuse the last sbt-test line (when the suite just ran)
#   --all        bench the FULL query inventory, not the headline set
set -uo pipefail
cd "$(dirname "$0")/.."
round=${1:?usage: tools/snapshot.sh <round> [--skip-test] [--all]}
shift || true
skip_test=0; bench_all=""
for a in "$@"; do
  case "$a" in
    --skip-test) skip_test=1 ;;
    --all) bench_all=1 ;;
  esac
done

fail=0
if [ "$skip_test" = 1 ] && [ -f /tmp/graft_last_test_line ]; then
  test_line=$(cat /tmp/graft_last_test_line)
else
  test_line=$(sbt -batch test 2>&1 | grep -E "Tests: succeeded" | tail -1 \
    | sed 's/^\[info\] //')
  # a compile error or aborted run produces NO summary line — record
  # the failure loudly instead of an empty string that reads as fine
  if [ -z "$test_line" ]; then test_line="GATE FAILED: no test summary (compile error or aborted run)"; fail=1
  else echo "$test_line" > /tmp/graft_last_test_line; fi
fi
case "$test_line" in *"failed 0"*|"GATE FAILED"*) : ;; *) fail=1 ;; esac

if ! sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/snapshot_vout" \
    > /tmp/snapshot_verify.log 2>&1; then
  fail=1
fi
verify_line=$(python3 tools/check.py /root/testdata/sf0.01 /tmp/snapshot_vout \
  | tail -1)
case "$verify_line" in *" 0 fail") : ;; *) fail=1; verify_line="GATE FAILED: $verify_line" ;; esac

bench_out=$(SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_ALL=$bench_all sbt -batch "runMain graft.Bench" 2>&1)
bench_rc=$?
bench_raw=$(echo "$bench_out" | grep '"metric"' | tail -1 | sed 's/^\[info\] //')
# a bench that crashed or printed no metric line is a red gate, same
# as a test or verify failure
if [ "$bench_rc" -ne 0 ] || [ -z "$bench_raw" ]; then fail=1; fi
# full-inventory runs are committed as the round's comparison floor
if [ "$bench_all" = 1 ]; then
  { echo "$bench_out" | grep '"detail"' | tail -1 | sed 's/^\[info\] //'
    echo "$bench_raw"; } > "BENCH_FULL_r$(printf '%02d' "$round").jsonl"
fi

python3 - "$round" "$test_line" "$verify_line" "$bench_raw" <<'EOF'
import json, sys, time
_, rnd, t, v, b = sys.argv
try:
    d = json.loads(b)
    bench = {"total_sec": d.get("value"), "n_queries": len(d.get("queries", {})),
             "baseline": d.get("baseline")}
except Exception:
    bench = {"raw": b[:300]}
rec = {"ts": time.time(), "round": int(rnd),
       "gate_summary": {"sbt_test": t, "verify": v, "bench": bench}}
with open("PROGRESS.jsonl", "a") as f:
    f.write(json.dumps(rec) + "\n")
print("gate_summary appended:", json.dumps(rec["gate_summary"], indent=None)[:400])
EOF
# non-zero exit when any gate failed, so callers can't mistake a
# red snapshot for a green one
exit "$fail"
