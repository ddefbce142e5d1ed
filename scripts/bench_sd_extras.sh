#!/bin/bash
# Round-4 SD extras: einsum-attention variants the first campaign pass
# motivated (flash measured slower at SD's 40/80 head_dim — lane padding),
# plus no-remat shapes to see whether bs1 fits without recompute.
set -u
OUT=${OUT:-/root/repo/docs/bench/bench_sd_r4.jsonl}
mkdir -p "$(dirname "$OUT")"
cd /root/repo

run() {
  tag="$1"; shift
  echo "[extras] $tag: bench.py $*" >&2
  line=$(timeout 2400 python bench.py --workload sd --memory-efficient "$@" 2>/tmp/bench_sd_err.log | tail -1)
  rc=$?
  if [ -n "$line" ] && [ $rc -eq 0 ]; then
    echo "{\"tag\": \"$tag\", \"result\": $line}" >> "$OUT"
  else
    err=$(tail -c 400 /tmp/bench_sd_err.log | tr '\n' ' ' | tr '"' "'")
    echo "{\"tag\": \"$tag\", \"rc\": $rc, \"error\": \"$err\"}" >> "$OUT"
  fi
}

# attention fwd kept (resnets still rematted), einsum logits
run einsum_noremat_attn_bs1 --batch-size 1 --accum 16 --remat --attention-impl einsum --no-remat-attention
# no remat at all at bs1 (does it fit? recompute fully avoided)
run einsum_noremat_bs1 --batch-size 1 --accum 16 --attention-impl einsum
# larger microbatch with einsum
run einsum_bs2 --batch-size 2 --accum 8 --remat --attention-impl einsum
run einsum_noremat_attn_bs2 --batch-size 2 --accum 8 --remat --attention-impl einsum --no-remat-attention
# selective remat policy (save matmul/conv outputs inside rematted blocks)
run einsum_bs1_dots --batch-size 1 --accum 16 --remat --attention-impl einsum --remat-policy dots
run einsum_bs2_dots --batch-size 2 --accum 8 --remat --attention-impl einsum --remat-policy dots
run einsum_bs4_dots --batch-size 4 --accum 4 --remat --attention-impl einsum --remat-policy dots
# end-to-end anchor with the SHIPPED attention impl (the round-3 e2e row
# used the rejected flash kernel; this is the honest task-shape number)
run einsum_e2e_bs1 --batch-size 1 --accum 16 --remat --attention-impl einsum --include-vae
echo "[extras] done" >&2
