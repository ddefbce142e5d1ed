"""The jitted unlearning train step: loss → paired gradients → surgery → update.

This is the centerpiece of the framework (SURVEY.md §7.3). The reference
implements the SISS gradient-surgery step as two Python-side ``backward()``
passes with host-side norm loops (``delete_celeb.py:682-767``); here the
whole pipeline — q(x_t|x_0) noising, defensive-mixture loss, the two
gradient pytrees, global norms, ``scaling_norm`` rescale, clip-to-1, optax
update and EMA — is ONE XLA program with zero host syncs:

* shared-forward losses (SISS, subscore-Bernoulli) use a single ``jax.vjp``
  pulled twice (one forward, two backwards — the ``retain_graph`` semantics
  of ``delete_celeb.py:690``);
* two-forward losses (double-forward, EraseDiff) take two independent
  ``jax.grad``s;
* gradient accumulation is a ``lax.scan`` over the microbatch axis carrying
  ``(g_x, g_a)`` accumulator trees (reference: Accelerate ``accumulate()``
  + the manual ``accum_loss_a`` dict, ``delete_celeb.py:702-712``);
* under a sharded ``Mesh``, gradients and both global norms are computed on
  the *fully-reduced* gradients automatically — XLA inserts the psums —
  matching the reference's post-DDP-allreduce surgery ordering (SURVEY §2.8).

Normalisation matches the reference exactly: each microbatch loss is
``sum() / global_microbatch_size`` (``delete_celeb.py:683-687`` plus DDP
mean), and accumulated gradients are averaged over microbatches (Accelerate
divides by ``gradient_accumulation_steps``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from siss_tpu.diffusion.schedule import NoiseSchedule, q_sample, snr_weights
from siss_tpu.losses.deletion import (
    DeletionLoss,
    SCALAR_PATH_LOSSES,
    SHARED_FORWARD_LOSSES,
)
from siss_tpu.train.ema import ema_update
from siss_tpu.train.state import TrainState

EpsApply = Callable[[Any, jax.Array, jax.Array, Any], jax.Array]
# (params, noisy_latents, timesteps, conditioning) -> eps prediction


def global_norm(tree) -> jax.Array:
    """Global L2 norm of a pytree, accumulated in float32
    (reference: ``delete_celeb.py:716-737``, but on-device)."""
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(l.astype(jnp.float32) ** 2) for l in leaves))


def tree_dot(a, b) -> jax.Array:
    la, lb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
    return sum(jnp.sum(x.astype(jnp.float32) * y.astype(jnp.float32)) for x, y in zip(la, lb))


def clip_by_global_norm(tree, max_norm: float):
    """torch.nn.utils.clip_grad_norm_ semantics (``delete_celeb.py:767``)."""
    norm = global_norm(tree)
    scale = jnp.minimum(1.0, max_norm / (norm + 1e-6))
    return jax.tree.map(lambda g: g * scale.astype(g.dtype), tree), norm


def _tensor_stats(x: jax.Array, prefix: str) -> Dict[str, jax.Array]:
    """loss*/mean|max|min|std over per-sample means — the reference's
    wandb ``batch_stats`` block (``delete_celeb.py:626-655``)."""
    per_sample = x.mean(axis=tuple(range(1, x.ndim))) if x.ndim > 1 else x
    return {
        f"{prefix}/mean": x.mean(),
        f"{prefix}/max": per_sample.max(),
        f"{prefix}/min": per_sample.min(),
        f"{prefix}/std": per_sample.std(),
    }


@dataclasses.dataclass(frozen=True)
class DeletionStepConfig:
    """Static knobs of the unlearning step (from the Hydra-surface config)."""

    loss_fn: str = "importance_sampling_with_mixture"
    loss_params: Tuple[Tuple[str, float], ...] = (("lambd", 0.5),)
    scaling_norm: float = 5.0
    eta: float = 1e-3                    # EraseDiff projection slack
    max_grad_norm: float = 1.0
    grad_accum_steps: int = 1
    # Timestep sampling window [t_min, t_max): full-range for tshirt
    # (``delete_tshirt.py:535-540``), fixed 999 for celeb/SD
    # (``delete_celeb.py:593-598`` — a deliberate reference quirk).
    t_min: int = 0
    t_max: int = 1000
    # Zero out a non-finite scaling factor (``delete_tshirt.py:688-690``).
    guard_inf_scaling: bool = True
    use_ema: bool = False
    ema_inv_gamma: float = 1.0
    ema_power: float = 0.75
    ema_max_decay: float = 0.9999
    # SD options (``delete_sd.py:893-904``): offset noise / input perturbation.
    noise_offset: float = 0.0
    input_perturbation: float = 0.0
    # Fused Pallas epilogue for the SISS mixture loss (one HBM pass for all
    # per-sample reductions + custom-VJP backward; see ops/siss_pallas.py).
    fused_siss: bool = True
    # EXPERIMENTAL: batch the two gradient pulls of shared-forward losses
    # into one vmapped backward. Equivalence-tested, but measured WORSE on
    # v5e for the celeb-256 conv UNet (the size-2 vmap axis breaks conv
    # tiling: 27.8 vs 49.9 img/s at bs 8, and OOM at bs 16) — keep False
    # unless profiling shows otherwise on your model.
    batched_dual_backward: bool = False
    # Dtype of the two gradient accumulator trees. float32 matches the
    # reference exactly; bfloat16 halves the surgery's largest memory cost
    # (two full-model trees — 6.9G for SD-1.x) at a small accumulation-
    # precision cost, and is what lets single-chip SD fit in 16G HBM
    # together with adam_mu_dtype=bfloat16 (see BASELINE.md).
    grad_accum_dtype: str = "float32"
    # Single-pass surgery epilogue: computes ‖g_x‖², ‖g_a‖², ⟨g_x,g_a⟩ in
    # ONE read over the two gradient trees and derives the post-surgery
    # clip norm in closed form (‖g_x − s·g_a‖² = ‖g_x‖² − 2s⟨g_x,g_a⟩ +
    # s²‖g_a‖²), so the combined gradient is never materialized for its
    # own norm reduction — the combine, clip scale and optimizer update
    # fuse into a single elementwise HBM pass per leaf. Mathematically
    # identical to the reference's sequence (combine → global-norm →
    # clip → step, ``delete_celeb.py:746-767``) up to fp32 reduction
    # order; False restores the literal sweep-by-sweep ordering.
    fused_surgery: bool = True
    # Pre-cast fp32 params to the model's compute dtype ONCE per step,
    # outside the microbatch scan. Flax casts params at use (param_dtype
    # fp32 → dtype bf16), so under grad accumulation the fp32→bf16 convert
    # of the whole parameter tree replays inside every scan iteration
    # unless XLA hoists it (SD-1.x: ~5.1G of convert traffic × accum).
    # Mathematically identical dataflow: the cast's VJP is itself a cast,
    # and the accumulators already convert incoming grads to
    # ``grad_accum_dtype``. None = cast at use (reference-literal).
    param_cast_dtype: Optional[str] = None

    def __post_init__(self):
        from siss_tpu.losses.deletion import LOSS_FUNCTIONS

        if self.loss_fn == "modified_noise_obj":
            # Dead config path documented in the reference (option listed at
            # ``config/delete_celeb.yaml:16-17`` with a guard at
            # ``delete_tshirt.py:532-534``, but no such loss method exists).
            raise NotImplementedError(
                "modified_noise_obj is an abandoned variant in the reference "
                "(config option with no implementation); choose one of "
                f"{LOSS_FUNCTIONS}")
        if self.loss_fn not in LOSS_FUNCTIONS:
            raise ValueError(f"Unknown loss_fn {self.loss_fn!r}; choose one of {LOSS_FUNCTIONS}")

    @property
    def is_scalar_path(self) -> bool:
        return self.loss_fn in SCALAR_PATH_LOSSES

    @property
    def is_shared_forward(self) -> bool:
        return self.loss_fn in SHARED_FORWARD_LOSSES


def _dual_pullback(pullback):
    """Both gradient pulls of a (loss_x, loss_a) vjp in ONE batched backward.

    The two cotangent chains differ only in their scalar seeds, so vmapping
    the pullback over the seed pair in principle lets XLA share residual
    reads between the chains. In practice XLA:TPU tiles the size-2 vmap
    axis poorly for convolutions and peak memory doubles — see the
    ``batched_dual_backward`` knob note for measurements. Kept as an
    equivalence-tested option for models where it profiles favourably."""
    seeds = (jnp.asarray([1.0, 0.0], jnp.float32), jnp.asarray([0.0, 1.0], jnp.float32))
    (g_both,) = jax.vmap(lambda ct: pullback(ct))(seeds)
    g_x = jax.tree.map(lambda g: g[0], g_both)
    g_a = jax.tree.map(lambda g: g[1], g_both)
    return g_x, g_a


def build_deletion_train_step(
    eps_apply: EpsApply,
    schedule: NoiseSchedule,
    tx: optax.GradientTransformation,
    cfg: DeletionStepConfig,
):
    """Returns ``step(state, batch, key, dyn_scalars) -> (state, metrics)``.

    ``batch``: dict with
      - "all":      [A, mb, ...]  keep-set clean latents (A = accum steps)
      - "deletion": [A, mb, ...]  forget-set clean latents
      - "conditioning": optional pytree with leading [A, mb, ...] axes
    ``dyn_scalars``: dict of runtime-decayed loss params (e.g. superfactor,
    reference ``delete_celeb.py:658-662``) merged over cfg.loss_params.
    """
    loss_obj = DeletionLoss(gamma=schedule.gamma, sigma=schedule.sigma)
    loss_method = getattr(loss_obj, cfg.loss_fn)
    # Keep only the params the chosen loss accepts — lets one config sweep
    # across loss_fns without editing loss_params (the reference crashes
    # on mismatched **loss_params).
    import inspect

    accepted = set(inspect.signature(loss_method).parameters)
    static_params = {k: v for k, v in dict(cfg.loss_params).items() if k in accepted}

    def _draw_noise_and_t(key, keep):
        """Shared per-microbatch randomness: ε (+offset), t, loss key,
        input perturbation — distinct streams for every draw."""
        mb = keep.shape[0]
        k_noise, k_t, k_loss, k_offset, k_perturb = jax.random.split(key, 5)
        noise = jax.random.normal(k_noise, keep.shape, dtype=keep.dtype)
        if cfg.noise_offset > 0.0:
            # offset noise trick: per-sample-per-channel DC shift.
            off_shape = keep.shape[:1] + (1,) * (keep.ndim - 2) + keep.shape[-1:]
            noise = noise + cfg.noise_offset * jax.random.normal(k_offset, off_shape, dtype=keep.dtype)
        timesteps = jax.random.randint(k_t, (mb,), cfg.t_min, cfg.t_max)
        input_noise = noise
        if cfg.input_perturbation > 0.0:
            input_noise = noise + cfg.input_perturbation * jax.random.normal(k_perturb, noise.shape, dtype=noise.dtype)
        return noise, input_noise, timesteps, k_loss

    def microbatch_terms(params, keep, forget, cond, key, dyn_scalars):
        """Compute (term_x, term_a | scalar loss, stats) for one microbatch."""
        mb = keep.shape[0]
        noise, input_noise, timesteps, k_loss = _draw_noise_and_t(key, keep)

        all_samples = {
            "og_latents": keep,
            "noisy_latents": q_sample(schedule, keep, input_noise, timesteps),
        }
        deletion_samples = {
            "og_latents": forget,
            "noisy_latents": q_sample(schedule, forget, input_noise, timesteps),
        }
        loss_params = {**static_params,
                       **{k: v for k, v in dyn_scalars.items() if k in accepted}}

        def eps_fn(x, t, c):
            return eps_apply(params, x, t, c)

        out = loss_method(
            eps_fn, k_loss, timesteps, noise, cond, all_samples, deletion_samples, **loss_params
        )
        stats = {}
        for name, field in [("loss", out.loss), ("loss_x", out.loss_x), ("loss_a", out.loss_a)]:
            if field is not None:
                stats.update(_tensor_stats(field, name))
        for name, field in [
            ("importance_weight_x", out.importance_weight_x),
            ("importance_weight_a", out.importance_weight_a),
        ]:
            if field is not None:
                stats.update(_tensor_stats(field, name))
        return out, stats, mb

    if cfg.is_scalar_path:

        def micro_grads(params, keep, forget, cond, key, dyn_scalars):
            def scalar_loss(p):
                out, stats, mb = microbatch_terms(p, keep, forget, cond, key, dyn_scalars)
                return out.loss.sum() / mb, stats

            (_, stats), g = jax.value_and_grad(scalar_loss, has_aux=True)(params)
            return g, None, stats

    elif (cfg.loss_fn == "importance_sampling_with_mixture" and cfg.fused_siss
          and cfg.noise_offset == 0.0 and cfg.input_perturbation == 0.0):
        # Fused path: mixture select + shared forward + the Pallas epilogue
        # computing all per-sample reductions in one HBM pass.
        from siss_tpu.ops.siss_pallas import siss_weighted_sums

        lambd = float(static_params["lambd"])

        def micro_grads(params, keep, forget, cond, key, dyn_scalars):
            if "lambd" in dyn_scalars:
                raise ValueError(
                    "dynamic lambd is not supported by the fused SISS path; "
                    "set fused_siss=False to decay lambd at runtime")
            mb = keep.shape[0]
            noise, _, timesteps, k_loss = _draw_noise_and_t(key, keep)
            noisy_keep = q_sample(schedule, keep, noise, timesteps)
            noisy_forget = q_sample(schedule, forget, noise, timesteps)
            all_mask = jax.random.uniform(k_loss, (mb,)) > lambd
            mask = all_mask.reshape((mb,) + (1,) * (keep.ndim - 1))
            mix = jnp.where(mask, noisy_keep, noisy_forget)
            gamma_t = schedule.gamma[timesteps]
            sigma_t = schedule.sigma[timesteps]

            def two_terms(p):
                preds = eps_apply(p, mix, timesteps, cond)
                wlx, wla, aux = siss_weighted_sums(
                    preds, mix, keep, forget, gamma_t, sigma_t, lambd)
                stats = {}
                stats.update(_tensor_stats(aux["lx_mean"], "loss_x"))
                stats.update(_tensor_stats(aux["la_mean"], "loss_a"))
                stats.update(_tensor_stats(aux["iw_x"], "importance_weight_x"))
                stats.update(_tensor_stats(aux["iw_a"], "importance_weight_a"))
                return (wlx / mb, wla / mb), stats

            _, pullback, stats = jax.vjp(two_terms, params, has_aux=True)
            if cfg.batched_dual_backward:
                g_x, g_a = _dual_pullback(pullback)
            else:
                one = jnp.ones((), jnp.float32)
                zero = jnp.zeros((), jnp.float32)
                (g_x,) = pullback((one, zero))
                (g_a,) = pullback((zero, one))
            return g_x, g_a, stats

    elif cfg.is_shared_forward:

        def micro_grads(params, keep, forget, cond, key, dyn_scalars):
            def two_terms(p):
                out, stats, mb = microbatch_terms(p, keep, forget, cond, key, dyn_scalars)
                return (out.weighted_loss_x.sum() / mb, out.weighted_loss_a.sum() / mb), stats

            # ONE forward, TWO backward pulls over the shared graph
            # (= retain_graph=True in the reference).
            _, pullback, stats = jax.vjp(two_terms, params, has_aux=True)
            if cfg.batched_dual_backward:
                g_x, g_a = _dual_pullback(pullback)
            else:
                one = jnp.ones((), jnp.float32)
                zero = jnp.zeros((), jnp.float32)
                (g_x,) = pullback((one, zero))
                (g_a,) = pullback((zero, one))
            return g_x, g_a, stats

    elif cfg.loss_fn in ("double_forward_with_neg_del", "erasediff"):
        # Two-forward losses: differentiate each term through ONLY its own
        # UNet forward (2 fwd + 2 bwd total — differentiating the full
        # loss method per term would re-run both forwards each time).
        # Per-term MSE math mirrors losses/deletion.py:double_forward/erasediff.

        def micro_grads(params, keep, forget, cond, key, dyn_scalars):
            mb = keep.shape[0]
            noise, input_noise, timesteps, k_loss = _draw_noise_and_t(key, keep)
            noisy_keep = q_sample(schedule, keep, input_noise, timesteps)
            noisy_forget = q_sample(schedule, forget, input_noise, timesteps)
            if cfg.loss_fn == "erasediff":
                forget_target = jax.random.uniform(k_loss, noise.shape, dtype=noise.dtype)
            else:
                forget_target = noise

            def term_x(p):
                lx = (eps_apply(p, noisy_keep, timesteps, cond) - noise) ** 2
                return lx.sum() / mb, _tensor_stats(lx, "loss_x")

            def term_a(p):
                la = (eps_apply(p, noisy_forget, timesteps, cond) - forget_target) ** 2
                return la.sum() / mb, _tensor_stats(la, "loss_a")

            g_x, stats_x = jax.grad(term_x, has_aux=True)(params)
            g_a, stats_a = jax.grad(term_a, has_aux=True)(params)
            return g_x, g_a, {**stats_x, **stats_a}

    else:  # generic surgery-path fallback: two grads through the loss method

        def micro_grads(params, keep, forget, cond, key, dyn_scalars):
            def term(p, which):
                out, stats, mb = microbatch_terms(p, keep, forget, cond, key, dyn_scalars)
                wl = out.weighted_loss_x if which == "x" else out.weighted_loss_a
                return wl.sum() / mb, stats

            g_x, stats = jax.grad(lambda p: term(p, "x"), has_aux=True)(params)
            g_a, _ = jax.grad(lambda p: term(p, "a"), has_aux=True)(params)
            return g_x, g_a, stats

    def step(state: TrainState, batch: Dict[str, Any], key: jax.Array,
             dyn_scalars: Optional[Dict[str, jax.Array]] = None):
        dyn_scalars = dyn_scalars or {}
        keep_all = batch["all"]
        forget_all = batch["deletion"]
        cond_all = batch.get("conditioning")
        A = keep_all.shape[0]
        keys = jax.random.split(key, A)

        acc_dtype = jnp.dtype(cfg.grad_accum_dtype)
        zeros_like_params = jax.tree.map(lambda p: jnp.zeros(p.shape, acc_dtype), state.params)

        # One cast of the fp32 tree per STEP (not per microbatch); see the
        # ``param_cast_dtype`` knob note. Grads pulled wrt the cast tree
        # equal the cast of grads wrt the fp32 tree leaf-for-leaf.
        fwd_params = state.params
        if cfg.param_cast_dtype is not None:
            cast_to = jnp.dtype(cfg.param_cast_dtype)
            fwd_params = jax.tree.map(
                lambda p: p.astype(cast_to) if p.dtype == jnp.float32 else p,
                state.params)

        # Dyn scalars with a leading [A] axis vary per microbatch and ride
        # the scan (the reference decays ``superfactor`` inside the
        # accumulation loop, once per microbatch — ``delete_celeb.py:658-662``);
        # plain scalars broadcast to every microbatch.
        dyn_scan = {k: v for k, v in dyn_scalars.items()
                    if hasattr(v, "ndim") and v.ndim >= 1 and v.shape[0] == A}
        dyn_const = {k: v for k, v in dyn_scalars.items() if k not in dyn_scan}

        def body(carry, xs):
            g_x_acc, g_a_acc = carry
            keep, forget, cond, k, dyn_mb = xs
            g_x, g_a, stats = micro_grads(fwd_params, keep, forget, cond, k,
                                          {**dyn_const, **dyn_mb})
            g_x_acc = jax.tree.map(lambda a, b: a + b.astype(acc_dtype), g_x_acc, g_x)
            if g_a is not None:
                g_a_acc = jax.tree.map(lambda a, b: a + b.astype(acc_dtype), g_a_acc, g_a)
            return (g_x_acc, g_a_acc), stats

        xs = (keep_all, forget_all, cond_all, keys, dyn_scan)
        (g_x, g_a), stats = jax.lax.scan(body, (zeros_like_params, zeros_like_params), xs)
        # Mean over microbatches (Accelerate divides by accumulation steps).
        g_x = jax.tree.map(lambda g: g / A, g_x)
        g_a = jax.tree.map(lambda g: g / A, g_a)

        # Aggregate per-microbatch stats across the scan axis: extrema keep
        # their semantics; means/stds average.
        def agg(k, v):
            if k.endswith("/max"):
                return v.max()
            if k.endswith("/min"):
                return v.min()
            return v.mean()

        metrics = {k: agg(k, v) for k, v in stats.items()}

        if cfg.is_scalar_path:
            final_grad = g_x
            final_grad, pre_clip_norm = clip_by_global_norm(final_grad, cfg.max_grad_norm)
        elif cfg.fused_surgery:
            # ONE fp32 read pass over both gradient trees yields all three
            # surgery scalars; every downstream quantity (scaling factor,
            # post-combine clip norm) is closed-form in them, so the
            # combine × clip × cast chain below is a single fused
            # elementwise pass with no intervening reduction barrier.
            lx = jax.tree_util.tree_leaves(g_x)
            la = jax.tree_util.tree_leaves(g_a)
            f32 = jnp.float32
            norm_x_sq = sum(jnp.sum(x.astype(f32) ** 2) for x in lx)
            norm_a_sq = sum(jnp.sum(a.astype(f32) ** 2) for a in la)
            dot_xa = sum(jnp.sum(x.astype(f32) * a.astype(f32)) for x, a in zip(lx, la))
            norm_x = jnp.sqrt(norm_x_sq)
            norm_a = jnp.sqrt(norm_a_sq)
            if cfg.loss_fn == "erasediff":
                scaling = cfg.eta - dot_xa / norm_a_sq
                scaling = -jnp.maximum(scaling, 0.0)
            else:
                scaling = cfg.scaling_norm / norm_a
            if cfg.guard_inf_scaling:
                scaling = jnp.where(jnp.isfinite(scaling), scaling, 0.0)
            # Post-combine clip norm as reduce(combine(x, a)): XLA fuses the
            # combine into the reduction's read pass, so the combined tree
            # is still never written to HBM for its own norm (the closed
            # form ‖x‖² − 2s⟨x,a⟩ + s²‖a‖² would save this read pass too,
            # but suffers fp32 cancellation when the surgery nearly zeroes
            # the gradient — exact numerics win here).
            combined = jax.tree.map(lambda x, a: x.astype(f32) - scaling * a.astype(f32),
                                    g_x, g_a)
            pre_clip_norm = global_norm(combined)
            clip_scale = jnp.minimum(1.0, cfg.max_grad_norm / (pre_clip_norm + 1e-6))
            final_grad = jax.tree.map(lambda c: c * clip_scale, combined)
            metrics["gradient/norm_loss_x"] = norm_x
            metrics["gradient/norm_loss_a"] = norm_a
            metrics["gradient/scaling_factor"] = scaling
        else:
            norm_x = global_norm(g_x)
            norm_a = global_norm(g_a)
            if cfg.loss_fn == "erasediff":
                # Projected-gradient step (``delete_celeb.py:740-742``).
                scaling = cfg.eta - tree_dot(g_x, g_a) / (norm_a**2)
                scaling = -jnp.maximum(scaling, 0.0)
            else:
                # scaling_norm clip of the forget gradient
                # (``delete_celeb.py:746``).
                scaling = cfg.scaling_norm / norm_a
            if cfg.guard_inf_scaling:
                scaling = jnp.where(jnp.isfinite(scaling), scaling, 0.0)
            final_grad = jax.tree.map(lambda x, a: x - scaling * a, g_x, g_a)
            metrics["gradient/norm_loss_x"] = norm_x
            metrics["gradient/norm_loss_a"] = norm_a
            metrics["gradient/scaling_factor"] = scaling
            final_grad, pre_clip_norm = clip_by_global_norm(final_grad, cfg.max_grad_norm)
        metrics["gradient/pre_clip_norm"] = pre_clip_norm

        final_grad = jax.tree.map(lambda g, p: g.astype(p.dtype), final_grad, state.params)
        updates, new_opt_state = tx.update(final_grad, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        new_ema = state.ema
        if state.ema is not None:
            new_ema = ema_update(
                state.ema, new_params,
                inv_gamma=cfg.ema_inv_gamma, power=cfg.ema_power, max_decay=cfg.ema_max_decay,
            )

        new_state = TrainState(
            params=new_params, opt_state=new_opt_state, step=state.step + 1, ema=new_ema
        )
        return new_state, metrics

    return step


def fold_steps(step_fn):
    """Fold K optimizer steps into ONE XLA program (lax.scan over stacked
    inputs): ``multi(state, batches[K,...], keys[K], *rest)`` runs
    ``step_fn(state, batches[i], keys[i], *rest)`` K times and stacks the
    per-step metrics. Per-step math/FLOPs are identical to K separate
    calls; only the host dispatch is amortized. Shared by bench.py and the
    tasks' ``steps_per_call`` modes so the fold logic exists once."""

    def multi(state, batches, keys, *rest):
        def body(st, xs):
            b, k = xs
            st, metrics = step_fn(st, b, k, *rest)
            return st, metrics

        return jax.lax.scan(body, state, (batches, keys))

    return multi


def build_pretrain_step(
    eps_apply: EpsApply,
    schedule: NoiseSchedule,
    tx: optax.GradientTransformation,
    *,
    prediction_type: str = "epsilon",
    max_grad_norm: float = 1.0,
    ema_inv_gamma: float = 1.0,
    ema_power: float = 0.75,
    ema_max_decay: float = 0.9999,
):
    """Standard DDPM pretraining step (``train_unconditional.py:366-415``):
    epsilon-MSE, or SNR-weighted sample-prediction loss."""

    def step(state: TrainState, batch: jax.Array, key: jax.Array):
        k_noise, k_t = jax.random.split(key)
        noise = jax.random.normal(k_noise, batch.shape, dtype=batch.dtype)
        timesteps = jax.random.randint(k_t, (batch.shape[0],), 0, schedule.num_train_timesteps)
        noisy = q_sample(schedule, batch, noise, timesteps)

        def loss_fn(p):
            pred = eps_apply(p, noisy, timesteps, None)
            if prediction_type == "epsilon":
                loss = ((pred - noise) ** 2).mean()
            elif prediction_type == "sample":
                w = snr_weights(schedule, timesteps, pred)
                loss = (w * (pred - batch) ** 2).mean()
            else:
                raise ValueError(prediction_type)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        grads, grad_norm = clip_by_global_norm(grads, max_grad_norm)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = state.ema
        if state.ema is not None:
            new_ema = ema_update(state.ema, new_params, inv_gamma=ema_inv_gamma,
                                 power=ema_power, max_decay=ema_max_decay)
        new_state = TrainState(params=new_params, opt_state=new_opt_state,
                               step=state.step + 1, ema=new_ema)
        return new_state, {"loss": loss, "gradient/pre_clip_norm": grad_norm}

    return step
