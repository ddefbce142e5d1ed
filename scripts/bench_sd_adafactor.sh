#!/bin/bash
# Round-4 Adafactor campaign: does freeing ~6.9G of Adam state unlock
# microbatch>1 for the SD workload on one v5e, and does the larger
# microbatch beat the bs1 plateau (9.76 img/s)?
set -u
OUT=${OUT:-/root/repo/docs/bench/bench_sd_adafactor.jsonl}
mkdir -p "$(dirname "$OUT")"
cd /root/repo

. "$(dirname "$0")/lib_bench_record.sh"
BENCH_PREFIX=adafactor
BENCH_OUT=$OUT
run() { local t="$1"; shift; bench_record "$t" --workload sd "$@"; }

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
