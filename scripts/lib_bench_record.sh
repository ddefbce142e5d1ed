# Shared bench-row recorder for the campaign scripts (sourced, not run).
#
# bench_record TAG [bench.py args...]:
#   run bench.py under a timeout, capture python's OWN exit status (not a
#   pipeline tail's), and append a JSONL row to $BENCH_OUT only when the
#   last stdout line parses as JSON — a crashed bench must not corrupt the
#   results file with partial output (ADVICE round-4 low).
#
# Callers set before use:
#   BENCH_PREFIX  log tag shown on stderr            (required)
#   BENCH_OUT     JSONL results path                 (required)
#   BENCH_LOG     tmp log stem                       (default /tmp/bench_$BENCH_PREFIX)
#   BENCH_TIMEOUT per-run timeout seconds            (default 2400)
bench_record() {
  local tag="$1"; shift
  local stem="${BENCH_LOG:-/tmp/bench_${BENCH_PREFIX}}"
  echo "[${BENCH_PREFIX}] $tag: bench.py $*" >&2
  timeout "${BENCH_TIMEOUT:-2400}" python bench.py "$@" >"${stem}_out.log" 2>"${stem}_err.log"
  local rc=$?
  local line
  line=$(tail -1 "${stem}_out.log")
  if [ $rc -eq 0 ] && printf '%s' "$line" | python -c 'import json,sys; json.loads(sys.stdin.read())' 2>/dev/null; then
    echo "{\"tag\": \"$tag\", \"result\": $line}" >> "$BENCH_OUT"
  else
    local err
    err=$(tail -c 300 "${stem}_err.log" | tr '\n' ' ' | tr '"' "'")
    echo "{\"tag\": \"$tag\", \"rc\": $rc, \"error\": \"$err\"}" >> "$BENCH_OUT"
  fi
}
