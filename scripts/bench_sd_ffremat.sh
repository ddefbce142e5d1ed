#!/bin/bash
# Round-5 final lever: surgical GEGLU feed-forward remat (ff_impl=remat)
# composed with the attention-core remat (einsum_remat). The einsum_remat
# campaign showed the binding allocation past microbatch 4 is the
# [B,N,8*dim] GEGLU projection/gate temps — the one per-token activation
# class no attention-side lever touches. ff_impl=remat drops them from
# the saved set (only the FF's LayerNorm'd input — already a residual —
# is kept), at ~one extra FF forward per backward. Question: does the
# extra microbatch headroom (bs 8/16) amortize accumulators better than
# the recompute costs, i.e. does anything here beat the standing
# 10.81 img/s (adafactor einsum bs 2x8) single-v5e bound?
set -u
OUT=${OUT:-/root/repo/docs/bench/bench_sd_adafactor.jsonl}
mkdir -p "$(dirname "$OUT")"
cd /root/repo

. "$(dirname "$0")/lib_bench_record.sh"
BENCH_PREFIX=ffremat
BENCH_OUT=$OUT
run() { local t="$1"; shift; bench_record "$t" --workload sd "$@"; }

run af_bs8_einsumremat_ffremat  --optimizer adafactor --batch-size 8  --accum 2 --attention-impl einsum_remat --ff-impl remat --grad-accum-dtype bfloat16
run af_bs4_einsumremat_ffremat  --optimizer adafactor --batch-size 4  --accum 4 --attention-impl einsum_remat --ff-impl remat --grad-accum-dtype bfloat16
run af_bs16_einsumremat_ffremat --optimizer adafactor --batch-size 16 --accum 1 --attention-impl einsum_remat --ff-impl remat --grad-accum-dtype bfloat16
run af_bs2_einsum_ffremat       --optimizer adafactor --batch-size 2  --accum 8 --attention-impl einsum --ff-impl remat --grad-accum-dtype bfloat16
echo "[ffremat] done" >&2
