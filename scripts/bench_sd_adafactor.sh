#!/bin/bash
# Round-4 Adafactor campaign: does freeing ~6.9G of Adam state unlock
# microbatch>1 for the SD workload on one v5e, and does the larger
# microbatch beat the bs1 plateau (9.76 img/s)?
set -u
OUT=${OUT:-/root/repo/docs/bench/bench_sd_adafactor.jsonl}
mkdir -p "$(dirname "$OUT")"
cd /root/repo

run() {
  tag="$1"; shift
  echo "[adafactor] $tag: bench.py $*" >&2
  # capture python's own exit status (not tail's) via a temp file, and
  # only record a success row when the last line parses as JSON — a
  # crashed bench must not corrupt the JSONL with partial output
  timeout 2400 python bench.py --workload sd "$@" >/tmp/bench_af_out.log 2>/tmp/bench_af_err.log
  rc=$?
  line=$(tail -1 /tmp/bench_af_out.log)
  if [ $rc -eq 0 ] && printf '%s' "$line" | python -c 'import json,sys; json.loads(sys.stdin.read())' 2>/dev/null; then
    echo "{\"tag\": \"$tag\", \"result\": $line}" >> "$OUT"
  else
    err=$(tail -c 300 /tmp/bench_af_err.log | tr '\n' ' ' | tr '"' "'")
    echo "{\"tag\": \"$tag\", \"rc\": $rc, \"error\": \"$err\"}" >> "$OUT"
  fi
}

# control anchor (known shape): adamw bs1, memory-efficient
run adamw_bs1_ctrl --memory-efficient --batch-size 1 --accum 16 --remat --attention-impl einsum
# adafactor, fp32 accumulators
run af_bs2_remat   --optimizer adafactor --batch-size 2 --accum 8 --remat --attention-impl einsum
run af_bs4_remat   --optimizer adafactor --batch-size 4 --accum 4 --remat --attention-impl einsum
# adafactor + bf16 accumulators (frees another ~3.4G)
run af_bs4_bf16acc --optimizer adafactor --batch-size 4 --accum 4 --remat --attention-impl einsum --grad-accum-dtype bfloat16
run af_bs8_bf16acc --optimizer adafactor --batch-size 8 --accum 2 --remat --attention-impl einsum --grad-accum-dtype bfloat16
# no remat at the largest fitting batch (recompute fully avoided)
run af_bs2_noremat --optimizer adafactor --batch-size 2 --accum 8 --attention-impl einsum --grad-accum-dtype bfloat16
echo "[adafactor] done" >&2
