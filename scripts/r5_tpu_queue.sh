#!/bin/bash
# Round-5 TPU work queue: serializes everything that needs the single chip.
#  1. wait for the adafactor2 campaign (pid file) to finish
#  2. adafactor3 campaign (flash-attention memory lever)
#  3. celeb task-step benches with the DPM fast-eval path (VERDICT #3)
#  4. tshirt eval-solver A/B on the live workflow (VERDICT #3 quality side)
set -u
cd /root/repo
Q=docs/bench/bench_celeb_fasteval.jsonl
WAIT_PID=${1:-}

if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

bash scripts/bench_sd_adafactor3.sh

. "$(dirname "$0")/lib_bench_record.sh"
BENCH_PREFIX=fasteval
BENCH_OUT=$Q
run() { local t="$1"; shift; bench_record "$t" "$@"; }

# celeb TASK step incl. every-step eval, reference shape and re-shape,
# DPM-Solver++(2M) fast eval (10-step sample + 10-call injection) vs the
# round-4 DDPM rows (13.0 / 22.2 img/s, BASELINE.md)
run celeb_task_bs4x16_dpm10  --include-eval --eval-solver dpm --eval-inference-steps 10 \
    --injection-steps 10 --batch-size 4 --accum 16
run celeb_task_bs16x4_dpm10  --include-eval --eval-solver dpm --eval-inference-steps 10 \
    --injection-steps 10 --batch-size 16 --accum 4

bash scripts/ab_tshirt_eval_solver.sh /tmp/ab_solver > /tmp/ab_solver.log 2>&1
echo "[r5-queue] done" >&2
