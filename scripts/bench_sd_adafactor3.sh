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

. "$(dirname "$0")/lib_bench_record.sh"
BENCH_PREFIX=adafactor3
BENCH_OUT=$OUT
run() { local t="$1"; shift; bench_record "$t" --workload sd "$@"; }

run af_bs4_flash  --optimizer adafactor --batch-size 4 --accum 4 --attention-impl flash --grad-accum-dtype bfloat16
run af_bs8_flash  --optimizer adafactor --batch-size 8 --accum 2 --attention-impl flash --grad-accum-dtype bfloat16
# flash + selective remat in case plain flash still OOMs at bs8
run af_bs8_flash_rematdots --optimizer adafactor --batch-size 8 --accum 2 --attention-impl flash --remat --remat-policy dots --grad-accum-dtype bfloat16
# control: does flash at the known-fitting bs2 cost or gain?
run af_bs2_flash  --optimizer adafactor --batch-size 2 --accum 8 --attention-impl flash --grad-accum-dtype bfloat16
echo "[adafactor3] done" >&2
