#!/bin/bash
# Round-5 Adafactor campaign continuation: round-5a showed every REMAT
# variant OOMs while bs2 no-remat + bf16 accumulators fits and beats the
# bs1 control (10.81 vs 9.76 img/s). Push the no-remat direction to the
# largest fitting microbatch, and isolate the bf16-acc contribution.
set -u
OUT=${OUT:-/root/repo/docs/bench/bench_sd_adafactor.jsonl}
mkdir -p "$(dirname "$OUT")"
cd /root/repo

run() {
  tag="$1"; shift
  echo "[adafactor2] $tag: bench.py $*" >&2
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

# largest fitting no-remat microbatch (bf16 accumulators)
run af_bs4_noremat  --optimizer adafactor --batch-size 4 --accum 4 --attention-impl einsum --grad-accum-dtype bfloat16
run af_bs8_noremat  --optimizer adafactor --batch-size 8 --accum 2 --attention-impl einsum --grad-accum-dtype bfloat16
run af_bs16_noremat --optimizer adafactor --batch-size 16 --accum 1 --attention-impl einsum --grad-accum-dtype bfloat16
# isolate the bf16-acc contribution at the known-fitting shape
run af_bs2_noremat_fp32acc --optimizer adafactor --batch-size 2 --accum 8 --attention-impl einsum
# selective remat (dots) as the fallback if larger no-remat OOMs
run af_bs4_rematdots --optimizer adafactor --batch-size 4 --accum 4 --remat --remat-policy dots --attention-impl einsum --grad-accum-dtype bfloat16
echo "[adafactor2] done" >&2
