#!/bin/bash
# Round-5 Adafactor campaign continuation: round-5a showed every REMAT
# variant OOMs while bs2 no-remat + bf16 accumulators fits and beats the
# bs1 control (10.81 vs 9.76 img/s). Push the no-remat direction to the
# largest fitting microbatch, and isolate the bf16-acc contribution.
set -u
OUT=${OUT:-/root/repo/docs/bench/bench_sd_adafactor.jsonl}
mkdir -p "$(dirname "$OUT")"
cd /root/repo

. "$(dirname "$0")/lib_bench_record.sh"
BENCH_PREFIX=adafactor2
BENCH_OUT=$OUT
run() { local t="$1"; shift; bench_record "$t" --workload sd "$@"; }

# largest fitting no-remat microbatch (bf16 accumulators)
run af_bs4_noremat  --optimizer adafactor --batch-size 4 --accum 4 --attention-impl einsum --grad-accum-dtype bfloat16
run af_bs8_noremat  --optimizer adafactor --batch-size 8 --accum 2 --attention-impl einsum --grad-accum-dtype bfloat16
run af_bs16_noremat --optimizer adafactor --batch-size 16 --accum 1 --attention-impl einsum --grad-accum-dtype bfloat16
# isolate the bf16-acc contribution at the known-fitting shape
run af_bs2_noremat_fp32acc --optimizer adafactor --batch-size 2 --accum 8 --attention-impl einsum
# selective remat (dots) as the fallback if larger no-remat OOMs
run af_bs4_rematdots --optimizer adafactor --batch-size 4 --accum 4 --remat --remat-policy dots --attention-impl einsum --grad-accum-dtype bfloat16
echo "[adafactor2] done" >&2
