#!/bin/bash
# Round-5 follow-up: surgical attention-core remat ("einsum_remat") —
# einsum math at full MXU efficiency, but only bf16 q/k/v saved for
# backward instead of the fp32 softmax residuals (512 MB/layer at 64x64
# latents). The one configuration the round-4/5 OOM matrix never tried:
# blanket block remat reduced the fitting batch, flash paid 1.6-3.2x MXU
# padding; this keeps resnet/dense activations saved AND drops the logits.
set -u
OUT=${OUT:-/root/repo/docs/bench/bench_sd_adafactor.jsonl}
mkdir -p "$(dirname "$OUT")"
cd /root/repo

. "$(dirname "$0")/lib_bench_record.sh"
BENCH_PREFIX=einsum_remat
BENCH_OUT=$OUT
run() { local t="$1"; shift; bench_record "$t" --workload sd "$@"; }

run af_bs4_einsumremat  --optimizer adafactor --batch-size 4 --accum 4 --attention-impl einsum_remat --grad-accum-dtype bfloat16
run af_bs8_einsumremat  --optimizer adafactor --batch-size 8 --accum 2 --attention-impl einsum_remat --grad-accum-dtype bfloat16
run af_bs2_einsumremat  --optimizer adafactor --batch-size 2 --accum 8 --attention-impl einsum_remat --grad-accum-dtype bfloat16
run af_bs16_einsumremat --optimizer adafactor --batch-size 16 --accum 1 --attention-impl einsum_remat --grad-accum-dtype bfloat16
echo "[einsum_remat] done" >&2
