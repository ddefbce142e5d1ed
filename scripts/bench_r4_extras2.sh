#!/bin/bash
# Round-4 extras, second wave:
#  - param_cast_dtype A/B (hoist the fp32->bf16 param cast out of the
#    microbatch scan) on both workloads
#  - the celeb TASK-shape row (--include-eval: train + 50-step sampling +
#    t=250 injection every step, the reference's sampling_steps: 1)
#  - K=8 dispatch folding on the celeb headline shape
# Waits for an earlier campaign PID (arg 1) to release the TPU first.
set -u
OUT=${OUT:-/root/repo/docs/bench/bench_r4_extras2.jsonl}
mkdir -p "$(dirname "$OUT")"
cd /root/repo

if [ -n "${1:-}" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi

run() {
  tag="$1"; shift
  echo "[extras2] $tag: bench.py $*" >&2
  line=$(timeout 2400 python bench.py "$@" 2>/tmp/bench_r4x2_err.log | tail -1)
  rc=$?
  if [ -n "$line" ] && [ $rc -eq 0 ]; then
    echo "{\"tag\": \"$tag\", \"result\": $line}" >> "$OUT"
  else
    err=$(tail -c 400 /tmp/bench_r4x2_err.log | tr '\n' ' ' | tr '"' "'")
    echo "{\"tag\": \"$tag\", \"rc\": $rc, \"error\": \"$err\"}" >> "$OUT"
  fi
}

# celeb headline shape: param-cast A/B (control re-measured same-session)
run celeb_control --batch-size 16 --accum 4
run celeb_cast_once --batch-size 16 --accum 4 --cast-params-once
# K=8 folding (control K=4 above)
run celeb_k8 --batch-size 16 --accum 4 --opt-steps-per-call 8
# the reference's ACTUAL per-step celeb workload: train + every-step eval
run celeb_task_eval --batch-size 4 --accum 16 --include-eval
run celeb_task_eval_bs16 --batch-size 16 --accum 4 --include-eval
# SD: param-cast A/B at the shipped shape
run sd_cast_once --workload sd --memory-efficient --batch-size 1 --accum 16 --remat --attention-impl einsum --cast-params-once
echo "[extras2] done" >&2
