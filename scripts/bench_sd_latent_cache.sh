#!/bin/bash
# Round-5 lever: frozen-VAE latent-moments cache (cache_latents knob).
# The reference re-encodes both 512px pixel batches through the frozen
# VAE encoder EVERY step (delete_sd.py:879-888); the moments are
# step-invariant for finite datasets, so caching them deletes the
# encoder stack from the hot path while fresh per-step reparameterization
# noise keeps training exactly distribution-identical. Question: how
# close does the END-TO-END delete_sd step get to the 10.81 img/s
# latent-only bound once the encoder is elided? (Uncached e2e anchor:
# 5.99 img/s flash bs1, BASELINE.md round-4.)
set -u
OUT=${OUT:-/root/repo/docs/bench/bench_sd_latent_cache.jsonl}
mkdir -p "$(dirname "$OUT")"
cd /root/repo

. "$(dirname "$0")/lib_bench_record.sh"
BENCH_PREFIX=latcache
BENCH_OUT=$OUT
run() { local t="$1"; shift; bench_record "$t" --workload sd --include-vae "$@"; }

# cached e2e at the standing best latent config (adafactor einsum bs 2x8)
run af_bs2_einsum_e2e_cached --cache-latents --optimizer adafactor --batch-size 2 --accum 8 --attention-impl einsum --grad-accum-dtype bfloat16
# cached e2e at the reference-exact shape (bs 1x16, memory-efficient adamw)
run adamw_bs1_flash_e2e_cached --cache-latents --batch-size 1 --accum 16 --memory-efficient --attention-impl flash
run adamw_bs1_einsum_e2e_cached --cache-latents --batch-size 1 --accum 16 --memory-efficient --attention-impl einsum
# uncached e2e control at the adafactor config (did not exist in round 4;
# einsum e2e OOM'd at bs1 under fp32 adamw state — adafactor may fit)
run af_bs2_einsum_e2e_encode --optimizer adafactor --batch-size 2 --accum 8 --attention-impl einsum --grad-accum-dtype bfloat16
echo "[latcache] done" >&2
