#!/usr/bin/env python
"""Benchmark: SISS unlearning train-step throughput on the flagship
CelebA-HQ-256 workload (the reference's headline config,
``config/delete_celeb.yaml``).

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "images/sec/chip", "vs_baseline": N}

Baseline (see BASELINE.md): the reference publishes no numbers, so
``vs_baseline`` is measured-v5e / estimated-A100-reference, where the
A100 estimate assumes the reference's fp32 (mixed_precision: null) torch
train step sustains 35% of A100 TF32 peak (156 TFLOP/s) on the same
step FLOPs. Both numerator FLOPs and the estimate come from XLA's own
cost analysis of the compiled step, so the comparison is workload-exact.

``--workload sd`` benches the ``delete_sd`` latent-space step instead.
NOTE: full SD fp32 training state (~17.2G: params + Adam + the surgery's
two gradient trees) exceeds one v5e's 15.75G HBM (measured OOM at 21.4G).
Pass ``--memory-efficient`` (bf16 Adam moments + bf16 grad accumulators,
~10.3G) to fit one chip; for reference-exact fp32 state use the
``delete_sd`` TASK on a ≥2-chip slice, whose ``fsdp`` mesh axis shards
the state — this bench itself builds an unsharded single-device step.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax


def build_sd(batch_size: int, accum: int, remat: bool, memory_efficient: bool = False,
             variant: str = "sd_v1", attention_impl: str = "auto",
             remat_attention: bool = True, include_vae: bool = False,
             fused_surgery: bool = True, grad_accum_dtype: str = None,
             remat_policy: str = None, cast_params_once: bool = False,
             optimizer: str = "adamw", ff_impl: str = "saved",
             cache_latents: bool = False):
    """SD-1.x latent-space SISS step (``config/delete_sd.yaml`` workload):
    the conditional UNet over 64×64×4 latents with 77-token text
    conditioning, t≡999, fixed scaling_norm 750. VAE encode is excluded
    (the reference encodes per step too, but the UNet dominates; latents
    are fed directly so the number isolates the unlearning step)."""
    from siss_tpu.diffusion.sd_pipeline import sd_noise_schedule
    from siss_tpu.models.unet2d_cond import UNet2DCondition, UNet2DConditionConfig
    from siss_tpu.train import DeletionStepConfig, TrainState, build_deletion_train_step

    if variant == "tiny":  # CPU smoke tests
        cfg = UNet2DConditionConfig(**{**UNet2DConditionConfig.tiny().__dict__,
                                       "gradient_checkpointing": remat,
                                       "attention_impl": attention_impl,
                                       "ff_impl": ff_impl,
                                       "remat_attention": remat_attention,
                                       "remat_policy": remat_policy})
    else:
        cfg = UNet2DConditionConfig.sd_v1(gradient_checkpointing=remat,
                                          attention_impl=attention_impl,
                                          ff_impl=ff_impl,
                                          remat_attention=remat_attention,
                                          remat_policy=remat_policy)
    model = UNet2DCondition(cfg, dtype=jnp.bfloat16)
    params = model.init_params(jax.random.PRNGKey(0))

    def eps_apply(p, x, t, cond):
        return model.apply({"params": p}, x.astype(jnp.bfloat16), t, cond)

    schedule = sd_noise_schedule()
    # memory-efficient single-chip mode: bf16 Adam moments + bf16
    # gradient accumulators cut the static training state from ~17.2G
    # (OOM on one v5e) to ~10.3G (see BASELINE.md)
    if optimizer == "adafactor":
        # factored second moments (T5X-style): ~6.9G of fp32 Adam state
        # becomes a few MB, freeing HBM for microbatch>1 on one chip.
        # Built via the shared builder so the lr-scaled (AdamW-style)
        # weight-decay semantics match what the task would train with.
        from siss_tpu.config.core import Config
        from siss_tpu.train.optim import build_optimizer

        tx = build_optimizer(Config({"_target_": "adafactor", "lr": 1e-5,
                                     "weight_decay": 1e-2}))
    else:
        tx = optax.adamw(1e-5, weight_decay=1e-2,
                         mu_dtype=jnp.bfloat16 if memory_efficient else None)
        if memory_efficient:
            from siss_tpu.train.optim import cast_nu_dtype

            tx = cast_nu_dtype(tx, jnp.bfloat16)
    step_cfg = DeletionStepConfig(
        loss_fn="importance_sampling_with_mixture",
        loss_params=(("lambd", 0.5),),
        scaling_norm=750.0,
        grad_accum_steps=accum,
        t_min=999, t_max=1000,
        grad_accum_dtype=grad_accum_dtype or ("bfloat16" if memory_efficient else "float32"),
        fused_surgery=fused_surgery,
        param_cast_dtype="bfloat16" if cast_params_once else None,
    )
    latent_step = build_deletion_train_step(eps_apply, schedule, tx, step_cfg)
    rng = np.random.default_rng(0)
    hw, ch, ctx = cfg.sample_size, cfg.in_channels, cfg.cross_attention_dim

    if include_vae and cache_latents:
        # end-to-end delete_sd step with the frozen-VAE latent-moments
        # cache (tasks/delete_sd.py cache_latents knob): the encoder leaves
        # the hot path; the step selects a flip orientation and samples
        # z = (mean + σ·ε)·sf from cached moments — distributionally exact
        # vs the per-step encode. The FLOP anchor still runs the UNCACHED
        # e2e program, so vs_baseline keeps charging the reference (and the
        # MFU denominator) its per-step encoder cost (delete_sd.py:879-888).
        from siss_tpu.data.latent_cache import sample_from_moments
        from siss_tpu.models.vae import AutoencoderKLConfig

        vcfg = (AutoencoderKLConfig.tiny() if variant == "tiny"
                else AutoencoderKLConfig.sd_v1())
        sf = vcfg.scaling_factor
        lat_hw, lat_ch = hw, ch

        def cached_step(state, moments, key, dyn):
            k_a, k_d, k_step, k_flip = jax.random.split(key, 4)
            A, mb = moments["all"].shape[:2]
            flip = jax.random.bernoulli(k_flip, 0.5, (A, mb, 1, 1, 1))
            batch = {
                "all": sample_from_moments(
                    moments["all"], k_a, flip, sf).astype(jnp.float32),
                "deletion": sample_from_moments(
                    moments["deletion"], k_d, flip, sf).astype(jnp.float32),
                "conditioning": moments["conditioning"],
            }
            return latent_step(state, batch, k_step, dyn)

        step = jax.jit(cached_step, donate_argnums=0)
        state = TrainState.create(params, tx)
        mom_shape = (accum, batch_size, 2, lat_hw, lat_hw, 2 * lat_ch)
        batch = {
            "all": jnp.asarray(rng.normal(size=mom_shape), jnp.bfloat16),
            "deletion": jnp.asarray(rng.normal(size=mom_shape), jnp.bfloat16),
            "conditioning": jnp.asarray(
                rng.normal(size=(accum, batch_size, 77, ctx)), jnp.float32),
        }
        return step, state, batch

    if include_vae:
        # end-to-end delete_sd step: fold the frozen VAE encode of BOTH
        # pixel batches (512px for SD v1) into the jitted program, exactly
        # as the task does (tasks/delete_sd.py::sd_step_core; reference
        # encodes per step too, delete_sd.py:879-888)
        from siss_tpu.models.vae import AutoencoderKL, AutoencoderKLConfig

        vcfg = (AutoencoderKLConfig.tiny() if variant == "tiny"
                else AutoencoderKLConfig.sd_v1())
        vae = AutoencoderKL(vcfg, dtype=jnp.bfloat16)
        px = hw * (2 ** (len(vcfg.block_out_channels) - 1))
        vae_params = vae.init_params(jax.random.PRNGKey(1), image_size=px)
        sf = 0.18215

        def e2e_step(state, images, key, dyn):
            k_a, k_d, k_step = jax.random.split(key, 3)
            A, mb = images["all"].shape[:2]

            def enc(imgs, k):
                # per-microbatch encode via lax.map, matching the task
                # (tasks/delete_sd.py::enc) — one flat A×mb encode spikes
                # peak 512px activations ×A and OOMs the einsum program
                def one(xs):
                    im, kk = xs
                    z = vae.apply({"params": vae_params},
                                  im.astype(jnp.bfloat16), kk,
                                  method=vae.encode_sample)
                    return (z * sf).astype(jnp.float32)
                return jax.lax.map(one, (imgs, jax.random.split(k, A)))

            batch = {
                "all": enc(images["all"], k_a),
                "deletion": enc(images["deletion"], k_d),
                "conditioning": images["conditioning"],
            }
            return latent_step(state, batch, k_step, dyn)

        step = jax.jit(e2e_step, donate_argnums=0)
        state = TrainState.create(params, tx)
        batch = {
            "all": jnp.asarray(rng.normal(size=(accum, batch_size, px, px, 3)), jnp.float32),
            "deletion": jnp.asarray(rng.normal(size=(accum, batch_size, px, px, 3)), jnp.float32),
            "conditioning": jnp.asarray(rng.normal(size=(accum, batch_size, 77, ctx)), jnp.float32),
        }
        return step, state, batch

    step = jax.jit(latent_step, donate_argnums=0)
    state = TrainState.create(params, tx)
    batch = {
        "all": jnp.asarray(rng.normal(size=(accum, batch_size, hw, hw, ch)), jnp.float32),
        "deletion": jnp.asarray(rng.normal(size=(accum, batch_size, hw, hw, ch)), jnp.float32),
        "conditioning": jnp.asarray(rng.normal(size=(accum, batch_size, 77, ctx)), jnp.float32),
    }
    return step, state, batch


def build(batch_size: int, accum: int, image_size: int, remat: bool,
          fused_surgery: bool = True, grad_accum_dtype: str = "float32",
          cast_params_once: bool = False,
          include_eval: bool = False, eval_batch_size: int = 1,
          eval_inference_steps: int = 50, injection_timestep: int = 250,
          eval_solver: str = "ddpm", injection_steps: int = 10):
    from siss_tpu.diffusion import NoiseSchedule
    from siss_tpu.models import UNet2D, UNet2DConfig
    from siss_tpu.train import DeletionStepConfig, TrainState, build_deletion_train_step

    cfg = UNet2DConfig.celebahq_256()
    if image_size != 256:
        cfg = UNet2DConfig(**{**cfg.__dict__, "sample_size": image_size})
    model = UNet2D(cfg, dtype=jnp.bfloat16)
    params = model.init_params(jax.random.PRNGKey(0))

    apply_fn = model.apply
    if remat:
        apply_fn = jax.checkpoint(lambda v, x, t: model.apply(v, x, t))

    def eps_apply(p, x, t, cond):
        return apply_fn({"params": p}, x.astype(jnp.bfloat16), t)

    schedule = NoiseSchedule.create(1000, "linear")
    tx = optax.adamw(5e-6, b1=0.95, b2=0.999, weight_decay=1e-6)
    step_cfg = DeletionStepConfig(
        loss_fn="importance_sampling_with_mixture",
        loss_params=(("lambd", 0.5),),
        scaling_norm=500.0,
        grad_accum_steps=accum,
        t_min=999, t_max=1000,
        fused_surgery=fused_surgery,
        grad_accum_dtype=grad_accum_dtype,
        param_cast_dtype="bfloat16" if cast_params_once else None,
    )
    step = jax.jit(build_deletion_train_step(eps_apply, schedule, tx, step_cfg), donate_argnums=0)
    state = TrainState.create(params, tx)

    rng = np.random.default_rng(0)
    batch = {
        "all": jnp.asarray(rng.normal(size=(accum, batch_size, image_size, image_size, 3)), jnp.float32),
        "deletion": jnp.asarray(rng.normal(size=(accum, batch_size, image_size, image_size, 3)), jnp.float32),
    }

    eval_fns = None
    if include_eval:
        # the reference's ACTUAL per-step workload (config/delete_celeb.yaml
        # `sampling_steps: 1`): every optimizer step also runs (a) a full
        # `eval_batch_size`-image 50-step DDPM sampling pass
        # (delete_celeb.py:486-489) and (b) a denoising injection — the
        # forget image noised to t=250 and reverse-diffused back
        # (delete_celeb.py:404-436,473-475). Both are single fused lax.scan
        # programs here (evaluate.py semantics), vs the reference's 50/250
        # Python-dispatched diffusers UNet calls.
        from siss_tpu.diffusion.sampling import (
            denoise_from_t, denoise_from_t_dpm, sample_ddpm, sample_dpm_solver_2m)
        from siss_tpu.diffusion.schedule import q_sample

        shape = (eval_batch_size, image_size, image_size, 3)
        sampler = sample_dpm_solver_2m if eval_solver == "dpm" else sample_ddpm

        @jax.jit
        def sample_fn(p, key):
            return sampler(lambda x, t, c: eps_apply(p, x, t, c),
                           schedule, key, shape, eval_inference_steps)

        @jax.jit
        def denoise_fn(p, x_t, key):
            if eval_solver == "dpm":
                # fast injection: DPM-Solver++(2M) ODE from t=250 in
                # ~injection_steps calls vs the ancestral 251-call loop
                return denoise_from_t_dpm(lambda x, t, c: eps_apply(p, x, t, c),
                                          schedule, x_t, injection_timestep,
                                          injection_steps)
            return denoise_from_t(lambda x, t, c: eps_apply(p, x, t, c),
                                  schedule, key, x_t, injection_timestep)

        k = jax.random.PRNGKey(7)
        target = jnp.asarray(rng.normal(size=(image_size, image_size, 3)), jnp.float32)
        noise = jax.random.normal(k, shape)
        x_t = q_sample(schedule, jnp.broadcast_to(target, shape), noise,
                       jnp.full((eval_batch_size,), injection_timestep))
        eval_fns = (sample_fn, denoise_fn, x_t)
    return step, state, batch, eval_fns


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--accum", type=int, default=4)
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--opt-steps-per-call", type=int, default=4,
                   help="fold K optimizer steps into one dispatched program "
                        "(lax.scan). Each step is the SAME workload (same "
                        "effective batch, same math); only the host round-"
                        "trip is amortized — the ~67 ms tunnel dispatch "
                        "otherwise costs ~5%% at accum 4. 1 = one step per "
                        "dispatch.")
    p.add_argument("--remat", action="store_true")
    p.add_argument("--workload", choices=("celeb", "sd"), default="celeb",
                   help="celeb: 256px pixel-space DDPM (headline); sd: SD-1.x "
                        "latent-space conditional UNet (delete_sd workload)")
    p.add_argument("--memory-efficient", action="store_true",
                   help="sd only: bf16 Adam moments + bf16 grad accumulators "
                        "so the full SD state fits one v5e (~10.3G vs ~17.2G)")
    p.add_argument("--no-fused-surgery", action="store_true",
                   help="restore the literal sweep-by-sweep surgery epilogue "
                        "(combine -> materialized global norm -> clip) for A/B "
                        "against the fused single-pass default")
    p.add_argument("--grad-accum-dtype", default=None,
                   choices=("float32", "bfloat16"),
                   help="dtype of the two surgery gradient accumulator trees "
                        "(default: float32; bfloat16 halves their HBM traffic "
                        "and footprint)")
    p.add_argument("--ff-impl", default="saved", choices=("saved", "remat"),
                   help="sd only: GEGLU feed-forward residuals — saved, or "
                        "rematerialized in backward (frees the [B,N,10240] "
                        "projection temps; identical math)")
    p.add_argument("--attention-impl", default="auto",
                   choices=("auto", "einsum", "einsum_remat", "flash"),
                   help="sd only: self-attention implementation (auto = Pallas "
                        "flash kernel for the 4096/1024-token levels on TPU; "
                        "einsum_remat = einsum math with the attention core "
                        "checkpointed so q/k/v replace the fp32 logits as "
                        "the saved residuals)")
    p.add_argument("--no-remat-attention", action="store_true",
                   help="sd only: with --remat, remat only the resnets and "
                        "keep transformer blocks un-rematted")
    p.add_argument("--remat-policy", default=None,
                   choices=("dots", "dots_no_batch"),
                   help="sd only: selective remat policy for checkpointed "
                        "blocks (save matmul/conv outputs; recompute only "
                        "the cheap elementwise chains)")
    p.add_argument("--include-vae", action="store_true",
                   help="sd only: fold the frozen VAE encode of both 512px "
                        "pixel batches into the step (end-to-end task shape)")
    p.add_argument("--cache-latents", action="store_true",
                   help="sd --include-vae only: bench the e2e step with the "
                        "frozen-VAE latent-moments cache (the task's "
                        "cache_latents knob) — flip-select + reparameterize "
                        "from cached moments instead of encoding pixels; the "
                        "FLOP anchor/denominator still charges the uncached "
                        "per-step encode the reference performs")
    p.add_argument("--cast-params-once", action="store_true",
                   help="pre-cast the fp32 param tree to bf16 once per step "
                        "outside the microbatch scan instead of at use "
                        "inside it (identical math; saves accum-1 re-cast "
                        "traffic if XLA does not hoist the converts)")
    p.add_argument("--include-eval", action="store_true",
                   help="celeb only: bench the reference's FULL per-step "
                        "workload — train step + 50-step DDPM sampling of "
                        "eval_batch_size images + the t=250 denoising "
                        "injection, every step (its `sampling_steps: 1`)")
    p.add_argument("--eval-batch-size", type=int, default=1,
                   help="--include-eval: images per sampling eval "
                        "(reference `eval_batch_size: 1`)")
    p.add_argument("--eval-inference-steps", type=int, default=50,
                   help="--include-eval: DDPM sampling steps per eval "
                        "(reference `num_inference_steps: 50`)")
    p.add_argument("--eval-solver", default="ddpm", choices=("ddpm", "dpm"),
                   help="--include-eval: dpm = DPM-Solver++(2M) for both the "
                        "sampling pass and the injection (quality-matched "
                        "fast eval; A/B'd on the live tshirt workflow, "
                        "docs/RESULTS.md). The A100 denominator still "
                        "charges the reference its own 50-step DDPM + "
                        "ancestral-injection eval cost.")
    p.add_argument("--injection-timestep", type=int, default=250,
                   help="--include-eval: diffusion timestep the forget "
                        "image is noised to before the denoising injection "
                        "(reference `timestep_to_noise_to: 250`); the "
                        "ancestral injection costs t+1 model calls")
    p.add_argument("--injection-steps", type=int, default=10,
                   help="--eval-solver dpm: model calls for the injection "
                        "(vs the ancestral loop's t+1)")
    p.add_argument("--optimizer", default="adamw",
                   choices=("adamw", "adafactor"),
                   help="sd only: adafactor = factored second moments "
                        "(T5X-style); frees ~6.9G of Adam state so "
                        "microbatch>1 fits one v5e. The FLOP anchor uses "
                        "the same optimizer (update FLOPs are noise either "
                        "way).")
    p.add_argument("--platform", default=None)
    args = p.parse_args()

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    # persistent compilation cache: repeated bench configs (and the FLOP
    # anchor program) compile once per machine, not once per process
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    n_chips = len(jax.devices())
    key = jax.random.PRNGKey(0)

    # FLOPs are anchored to the CANONICAL program (accum=1, no remat): the
    # algorithmic work of one SISS surgery step, which is also what the
    # reference's torch step performs. Anchoring this way keeps the metric
    # honest — rematerialisation or accumulation variants cannot inflate
    # MFU or deflate the A100 denominator with recompute FLOPs. The anchor
    # is built, costed, and FREED before the benched step is built, so the
    # two full model states never coexist in HBM (matters for SD, whose
    # state fills most of one chip).
    def _cost_flops(c):
        try:
            cost = c.cost_analysis()
            return float(cost.get("flops", 0.0)) if cost else 0.0
        except Exception:
            return 0.0

    def _build(accum, remat, anchor=False):
        if args.workload == "sd":
            # the FLOP anchor always uses einsum attention: XLA's cost
            # analysis cannot see inside Pallas kernels (flash programs
            # report fewer FLOPs for the same math), and the reference's
            # torch step materializes the logits einsum-style — so the
            # einsum program is the canonical algorithmic-work denominator
            # for every attention_impl variant
            return (*build_sd(args.batch_size, accum, remat, args.memory_efficient,
                              attention_impl="einsum" if anchor else args.attention_impl,
                              ff_impl="saved" if anchor else args.ff_impl,
                              remat_attention=not args.no_remat_attention,
                              include_vae=args.include_vae,
                              fused_surgery=not args.no_fused_surgery,
                              grad_accum_dtype=args.grad_accum_dtype,
                              remat_policy=args.remat_policy,
                              cast_params_once=args.cast_params_once and not anchor,
                              optimizer=args.optimizer,
                              cache_latents=args.cache_latents and not anchor), None)
        return build(args.batch_size, accum, args.image_size, remat,
                     fused_surgery=not args.no_fused_surgery,
                     grad_accum_dtype=args.grad_accum_dtype or "float32",
                     cast_params_once=args.cast_params_once and not anchor,
                     include_eval=args.include_eval and not anchor,
                     eval_batch_size=args.eval_batch_size,
                     eval_inference_steps=args.eval_inference_steps,
                     eval_solver=args.eval_solver,
                     injection_timestep=args.injection_timestep,
                     injection_steps=args.injection_steps)

    K = max(int(args.opt_steps_per_call), 1)
    if args.include_eval:
        if args.workload != "celeb":
            p.error("--include-eval is celeb-only")
        # the reference evaluates EVERY optimizer step, so a dispatch per
        # step is inherent to this workload — folding would misrepresent it
        K = 1
    flops_per_image = None
    if args.cache_latents and not (args.workload == "sd" and args.include_vae):
        p.error("--cache-latents requires --workload sd --include-vae")
    needs_anchor = (args.accum != 1 or args.remat or K > 1
                    or (args.workload == "sd" and
                        (args.attention_impl != "einsum" or args.ff_impl != "saved"
                         or args.cache_latents)))
    if needs_anchor:
        anchor_step, anchor_state, anchor_batch, _ = _build(1, False, anchor=True)
        # the anchor DOES device-compile (cost analysis needs the compiled
        # executable), but its accum=1/no-remat program is the smallest
        # variant and everything is deleted before the benched build below
        anchor = anchor_step.lower(anchor_state, anchor_batch, key, {}).compile()
        flops_per_image = _cost_flops(anchor) / args.batch_size
        del anchor, anchor_step, anchor_state, anchor_batch

    step, state, batch, eval_fns = _build(args.accum, args.remat)
    if K > 1:
        # K optimizer steps per dispatched program: identical per-step math
        # (the scan body IS the single-step program), host round-trip paid
        # once per K steps. Batches get a leading [K] axis.
        from siss_tpu.train import fold_steps

        step = jax.jit(fold_steps(step), donate_argnums=0)
        batch = jax.tree.map(lambda x: jnp.broadcast_to(x[None], (K, *x.shape)), batch)
        call_args = lambda k: (jax.random.split(k, K), {})  # noqa: E731
    else:
        call_args = lambda k: (k, {})  # noqa: E731

    # compile + warmup
    a, d = call_args(key)
    lowered = step.lower(state, batch, a, d)
    compiled = lowered.compile()
    if flops_per_image is None:
        flops_per_image = _cost_flops(compiled) / args.batch_size
    step_flops = flops_per_image * args.batch_size * args.accum
    state, warm_metrics = compiled(state, batch, a, d)
    jax.block_until_ready((state, warm_metrics))

    eval_flops = ref_eval_flops = 0.0
    if eval_fns is not None:
        sample_fn, denoise_fn, x_t = eval_fns
        ekey = jax.random.PRNGKey(1)
        sample_c = sample_fn.lower(state.params, ekey).compile()
        denoise_c = denoise_fn.lower(state.params, x_t, ekey).compile()
        sample_flops = _cost_flops(sample_c)
        denoise_flops = _cost_flops(denoise_c)
        eval_flops = sample_flops + denoise_flops
        ref_eval_flops = eval_flops
        if args.eval_solver == "dpm":
            # quality-matched denominator: the reference only achieves this
            # eval with its 50-step DDPM sample + (t+1)-call ancestral
            # injection (config/delete_celeb.yaml:140-141, evaluate.py:64-79)
            # — scale our per-call FLOPs up to the reference's call counts
            ref_inj_calls = args.injection_timestep + 1
            inj_calls = max(2, min(args.injection_steps, ref_inj_calls))
            ref_eval_flops = (sample_flops * 50.0 / args.eval_inference_steps
                              + denoise_flops * ref_inj_calls / inj_calls)
        jax.block_until_ready((sample_c(state.params, ekey),
                               denoise_c(state.params, x_t, ekey)))
    # MFU uses the FLOPs we actually execute; the A100 denominator charges
    # the reference ITS eval cost (identical to ours unless --eval-solver dpm)
    step_flops_total = step_flops + eval_flops

    times = []
    for i in range(args.steps):
        key = jax.random.fold_in(key, i)
        a, d = call_args(key)
        t0 = time.perf_counter()
        state, metrics = compiled(state, batch, a, d)
        if eval_fns is not None:
            # the reference's every-step eval (sampling grid + injection),
            # run on the post-update params exactly like log_metrics does
            ekey = jax.random.fold_in(jax.random.PRNGKey(1), i)
            outs = (sample_c(state.params, ekey), denoise_c(state.params, x_t, ekey))
            jax.block_until_ready(outs)
        # block on the metrics too, not just params: params are donated
        # aliased buffers, and timing only their ready event produced a
        # physically impossible step time (2168% MFU) for one program on
        # the tunneled TPU platform — the fresh metric buffers (loss
        # means, grad norms) depend on the whole step and cannot lie
        jax.block_until_ready((state, metrics))
        times.append(time.perf_counter() - t0)

    dt = float(np.median(times)) / K
    imgs_per_step = args.batch_size * args.accum
    # the benched step is an unsharded single-device program, so per-chip
    # throughput divides by the ONE chip it runs on — not len(jax.devices())
    # (which would understate it on a multi-chip host)
    ips_per_chip = imgs_per_step / dt

    # A100 reference estimate (see module docstring / BASELINE.md). With
    # --include-eval the denominator charges the reference the same total
    # work per step (train + the 50-step sampling + the injection) at the
    # same generous 35% TF32 MFU — its actual eval is 300+ Python-dispatched
    # batch-1 diffusers UNet calls per step, which sustains far less.
    ref_flops_per_image = (step_flops + ref_eval_flops) / imgs_per_step if imgs_per_step else 0.0
    a100_ref_ips = (156e12 * 0.35) / ref_flops_per_image if ref_flops_per_image else 0.0
    vs_baseline = ips_per_chip / a100_ref_ips if a100_ref_ips else 0.0

    achieved_flops = step_flops_total / dt if step_flops_total else 0.0
    mfu_v5e = achieved_flops / 197e12
    if mfu_v5e > 1.0:
        import sys

        print(f"[bench] WARNING: MFU {mfu_v5e:.2f} exceeds peak — the timing "
              "is an artifact, do not record this row", file=sys.stderr)

    metric_name = ("siss_sd_latent_train_step_throughput" if args.workload == "sd"
                   else "siss_celeb256_task_step_throughput" if args.include_eval
                   else "siss_celeb256_train_step_throughput")
    detail = {
        "batch_size": args.batch_size,
        "accum": args.accum,
        "image_size": args.image_size,
        "n_chips": n_chips,
        "step_time_s": round(dt, 4),
        "step_tflops": round(step_flops_total / 1e12, 2),
        "mfu_v5e_bf16": round(mfu_v5e, 4),
        "a100_ref_est_ips": round(a100_ref_ips, 4),
        "platform": jax.devices()[0].platform,
    }
    if eval_fns is not None:
        detail.update(eval_batch_size=args.eval_batch_size,
                      eval_inference_steps=args.eval_inference_steps,
                      eval_solver=args.eval_solver,
                      eval_tflops=round(eval_flops / 1e12, 2))
        if args.eval_solver == "dpm":
            detail.update(injection_steps=args.injection_steps,
                          ref_eval_tflops=round(ref_eval_flops / 1e12, 2))
    print(json.dumps({
        "metric": metric_name,
        "value": round(ips_per_chip, 4),
        "unit": "images/sec/chip",
        "vs_baseline": round(vs_baseline, 4),
        "detail": detail,
    }))


if __name__ == "__main__":
    main()
