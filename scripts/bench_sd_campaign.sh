#!/bin/bash
# Serial SD-workload bench campaign (round 4): measure the round-3 SD
# levers (Pallas flash attention, selective remat, larger microbatches,
# end-to-end VAE encode) one at a time on the single v5e.
# Results appended as JSONL to $OUT (one line per config, with a tag).
set -u
OUT=${OUT:-/root/repo/runs/bench_sd_r4.jsonl}
mkdir -p "$(dirname "$OUT")"
cd /root/repo

run() {
  tag="$1"; shift
  echo "[campaign] $tag: bench.py $*" >&2
  line=$(timeout 2400 python bench.py --workload sd --memory-efficient "$@" 2>/tmp/bench_sd_err.log | tail -1)
  rc=$?
  if [ -n "$line" ] && [ $rc -eq 0 ]; then
    echo "{\"tag\": \"$tag\", \"result\": $line}" >> "$OUT"
  else
    err=$(tail -c 400 /tmp/bench_sd_err.log | tr '\n' ' ' | tr '"' "'")
    echo "{\"tag\": \"$tag\", \"rc\": $rc, \"error\": \"$err\"}" >> "$OUT"
  fi
}

# 1. control: round-2 code path (einsum attention, blanket remat) bs1x16
run control_einsum_bs1 --batch-size 1 --accum 16 --remat --attention-impl einsum
# 2. flash attention, blanket remat
run flash_bs1 --batch-size 1 --accum 16 --remat --attention-impl flash
# 3. flash + selective remat (transformer blocks not rematted)
run flash_noremat_attn_bs1 --batch-size 1 --accum 16 --remat --attention-impl flash --no-remat-attention
# 4. larger microbatches at same effective batch 16
run flash_noremat_attn_bs2 --batch-size 2 --accum 8 --remat --attention-impl flash --no-remat-attention
run flash_bs2 --batch-size 2 --accum 8 --remat --attention-impl flash
run flash_noremat_attn_bs4 --batch-size 4 --accum 4 --remat --attention-impl flash --no-remat-attention
# 5. end-to-end including frozen VAE encode of both 512px batches (best shape)
run flash_e2e_vae_bs1 --batch-size 1 --accum 16 --remat --attention-impl flash --no-remat-attention --include-vae
echo "[campaign] done" >&2
