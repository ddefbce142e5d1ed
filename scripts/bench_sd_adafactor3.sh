#!/bin/bash
# Round-5 Adafactor campaign, part 3: FLASH attention as the memory lever.
# Einsum self-attention materializes fp32 [B*heads, 4096, 4096] logits for
# backward at the 64x64-latent levels (~2.1G each at bs4) — that, not the
# optimizer state, is what OOMs every bs>=4 variant in parts 1-2. The
# Pallas flash kernel is O(N) memory; it lost to einsum on *speed* at bs1
# (BASELINE.md round-4 SD table) but at bs4/bs8 it may buy enough MXU
# fill to win overall.
set -u
OUT=${OUT:-/root/repo/docs/bench/bench_sd_adafactor.jsonl}
mkdir -p "$(dirname "$OUT")"
cd /root/repo

run() {
  tag="$1"; shift
  echo "[adafactor3] $tag: bench.py $*" >&2
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

run af_bs4_flash  --optimizer adafactor --batch-size 4 --accum 4 --attention-impl flash --grad-accum-dtype bfloat16
run af_bs8_flash  --optimizer adafactor --batch-size 8 --accum 2 --attention-impl flash --grad-accum-dtype bfloat16
# flash + selective remat in case plain flash still OOMs at bs8
run af_bs8_flash_rematdots --optimizer adafactor --batch-size 8 --accum 2 --attention-impl flash --remat --remat-policy dots --grad-accum-dtype bfloat16
# control: does flash at the known-fitting bs2 cost or gain?
run af_bs2_flash  --optimizer adafactor --batch-size 2 --accum 8 --attention-impl flash --grad-accum-dtype bfloat16
echo "[adafactor3] done" >&2
