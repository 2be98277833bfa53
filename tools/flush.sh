#!/usr/bin/env bash
# One-command sf-corpus oracle flush (r15 ask 7): generate the
# sf-parameterized corpus (GenTestData), dump every query result
# (graft.Verify), then sweep every oracle SQL in DuckDB against the
# same parquet (tools/check.py). The sf1/sf3 flushes were driven by
# hand; this pins the procedure + artifact paths so every future
# flush is one command.
#
# usage: tools/flush.sh <sf> [workdir] [cpus] [driver_mem] [prefixes]
#   sf          scale factor, e.g. 10 (sf1 = 6M-row lineitem)
#   workdir     default /tmp/flush_sf<sf>[_skew<z>]; holds corpus/ vout/ logs
#   cpus        local[N] for Verify (default 16 — leave headroom)
#   driver_mem  forked-JVM -Xmx for Gen/Verify (default 28g)
#   prefixes    comma-separated query-name prefixes (resume a sweep)
#   GRAFT_GEN_SKEW=<s>  env: zipf exponent for the generator's skew
#               knob (r16 ask 2) — keys go zipfian (top-1 share
#               1-2^-(s-1)); unset/0 = the uniform corpus
#
# Re-runs are incremental: an existing corpus is reused (delete the
# workdir for a clean run). Exit status is check.py's (non-zero on
# any FAIL or an empty filtered oracle set).
set -euo pipefail
cd "$(dirname "$0")/.."

SF="${1:?usage: tools/flush.sh <sf> [workdir] [cpus] [driver_mem] [prefixes]}"
SKEW="${GRAFT_GEN_SKEW:-0}"
if [ "$SKEW" != "0" ]; then
  WORK="${2:-/tmp/flush_sf${SF}_skew${SKEW}}"
else
  WORK="${2:-/tmp/flush_sf${SF}}"
fi
CPUS="${3:-16}"
MEM="${4:-28g}"
PREFIXES="${5:-}"
CORPUS="$WORK/corpus"
VOUT="$WORK/vout"
mkdir -p "$WORK"

if [ -f "$CORPUS/lineitem.parquet/_SUCCESS" ] || [ -f "$CORPUS/lineitem.parquet" ]; then
  echo "[flush] reusing corpus at $CORPUS"
else
  echo "[flush] generating sf=$SF corpus at $CORPUS"
  SPARK_DRIVER_MEM="$MEM" sbt -batch "runMain graft.GenTestData $CORPUS $SF $SKEW" \
    > "$WORK/gen.log" 2>&1 || { tail -20 "$WORK/gen.log"; exit 1; }
  tail -2 "$WORK/gen.log"
fi

echo "[flush] dumping query results (Verify, local[$CPUS], $MEM)"
SPARK_GRAFT_CPUS="$CPUS" SPARK_DRIVER_MEM="$MEM" \
  sbt -batch "runMain graft.Verify $CORPUS $VOUT ${PREFIXES}" \
  > "$WORK/verify.log" 2>&1 || { tail -20 "$WORK/verify.log"; exit 1; }
grep -E "\[verify\].*failed" "$WORK/verify.log" && echo "[flush] ^ EXECUTION FAILURES" || true

echo "[flush] DuckDB oracle sweep (memory-capped; spills to $VOUT/.duckdb_tmp)"
set +e
if [ -n "$PREFIXES" ]; then
  python3 tools/check.py "$CORPUS" "$VOUT" "$PREFIXES" | tee "$WORK/check.txt"
else
  python3 tools/check.py "$CORPUS" "$VOUT" | tee "$WORK/check.txt"
fi
STATUS=${PIPESTATUS[0]}
set -e
echo "[flush] done — artifacts: $WORK/{gen,verify}.log, $WORK/check.txt"
exit "$STATUS"
