"""Numerical parity of ``get_text_cond_grad`` / ``aug_prompt`` with the
reference formulas (``local_sd_pipeline.py:325-472`` / ``:474-702``),
VERDICT r1 weak #7.

Golden implementations here are written independently, mirroring the
reference's loop structure statement-for-statement:

* token gradients: at each target step i (latents advanced by no-grad CFG
  DDIM between them), loss = full-tensor L2 of (ε_text − ε_uncond); token
  grads = per-token L2 of ∂loss/∂(text embeds), batch-averaged; the result
  is the MEAN over target steps, returned at ``max(target_steps)``
  (``:427-445``). Note the reference fixes the gradient target to the text
  embeddings (Wen et al. semantics); its literal ``autograd.grad(loss,
  [prompt_embeds])`` on a detached clone would error at runtime.
* aug_prompt: torch.optim.AdamW drives the golden loop with gradients
  produced by the same jax loss — checking our optax AdamW (+ frozen BOS
  token, L2 anchor mixing, check-then-step ``target_loss`` early stop)
  against torch's real optimizer arithmetic.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from siss_tpu.diffusion import NoiseSchedule
from siss_tpu.diffusion.sd_pipeline import StableDiffusionPipeline
from siss_tpu.diffusion.schedule import ddim_step, spaced_timesteps

L, D, HW, C = 7, 6, 8, 2  # tokens, embed dim, latent size, channels


def _eps_fn(params, x, t, cond):
    """Synthetic differentiable 'unet': mixes conditioning nonlinearly into
    the prediction so embedding gradients are nontrivial per token."""
    w = jnp.tanh(cond @ params["proj"])          # [B, L, C]
    shift = jnp.einsum("blc,l->bc", w, params["tok_w"])
    return 0.2 * x + shift[:, None, None, :] + 0.01 * jnp.sin(x) * (t[:, None, None, None] / 1000.0)


@pytest.fixture
def setup():
    sched = NoiseSchedule.create(1000, "scaled_linear", 0.00085, 0.012, clip_sample=False)
    rng = np.random.default_rng(0)
    params = {
        "proj": jnp.asarray(rng.normal(size=(D, C)) * 0.5, jnp.float32),
        "tok_w": jnp.asarray(rng.normal(size=(L,)), jnp.float32),
    }
    pipe = StableDiffusionPipeline(
        unet_apply=_eps_fn, unet_params=params,
        vae_decode=lambda p, z: z, vae_params={},
        text_apply=None, text_params=None, tokenizer=None,
        schedule=sched, latent_channels=C, vae_scale_factor=1,
    )
    prompt = jnp.asarray(rng.normal(size=(1, L, D)), jnp.float32)
    uncond = jnp.zeros((1, L, D), jnp.float32)
    return sched, params, pipe, prompt, uncond


def _golden_token_grads(sched, params, prompt, uncond, key, target_steps,
                        num_inference_steps, guidance_scale):
    ts = spaced_timesteps(sched.num_train_timesteps, num_inference_steps)
    prev = np.concatenate([ts[1:], [-1]]).astype(np.int32)
    key, ikey = jax.random.split(key)
    latents = jax.random.normal(ikey, (1, HW, HW, C))

    def loss(e, latents, t):
        B = latents.shape[0]
        eps_u = _eps_fn(params, latents, jnp.broadcast_to(t, (B,)), jnp.broadcast_to(uncond, (B, L, D)))
        eps_t = _eps_fn(params, latents, jnp.broadcast_to(t, (B,)), jnp.broadcast_to(e, (B, L, D)))
        return jnp.sqrt(jnp.sum((eps_t - eps_u).astype(jnp.float32) ** 2))

    all_token_grads = []
    for i, (t, p) in enumerate(zip(ts, prev)):
        t = jnp.asarray(int(t))
        if i in set(target_steps):
            g = jax.grad(loss)(prompt, latents, t)
            all_token_grads.append(
                jnp.sqrt(jnp.sum(g.astype(jnp.float32) ** 2, axis=-1)).mean(axis=0))
            if i == max(target_steps):
                return np.asarray(jnp.stack(all_token_grads).mean(axis=0))
        # no-grad CFG advance (reference else-branch)
        B = latents.shape[0]
        eps_u = _eps_fn(params, latents, jnp.broadcast_to(t, (B,)), jnp.broadcast_to(uncond, (B, L, D)))
        eps_t = _eps_fn(params, latents, jnp.broadcast_to(t, (B,)), jnp.broadcast_to(prompt, (B, L, D)))
        eps = eps_u + guidance_scale * (eps_t - eps_u)
        latents = ddim_step(sched, latents, eps, t, jnp.asarray(int(p)))
    raise AssertionError("unreached")


@pytest.mark.parametrize("target_steps", [(0,), (0, 2, 4)])
def test_get_text_cond_grad_matches_golden(setup, target_steps):
    sched, params, pipe, prompt, uncond = setup
    key = jax.random.PRNGKey(3)
    ours = pipe.get_text_cond_grad(prompt, uncond, key, height=HW, width=HW,
                                   num_inference_steps=8, guidance_scale=7.5,
                                   target_steps=target_steps)
    golden = _golden_token_grads(sched, params, prompt, uncond, key,
                                 target_steps, 8, 7.5)
    assert ours.shape == (L,)
    np.testing.assert_allclose(ours, golden, rtol=2e-4, atol=1e-6)


def _golden_aug_prompt(sched, params, prompt, uncond, key, *, lr, optim_iters,
                       target_steps, num_inference_steps, guidance_scale,
                       target_loss=None, optim_epsilon=None, alpha=0.5):
    """Reference ``aug_prompt`` loop with torch.optim.AdamW driving the
    update (gradients supplied by the same jax loss)."""
    import torch

    ts = spaced_timesteps(sched.num_train_timesteps, num_inference_steps)
    prev = np.concatenate([ts[1:], [-1]]).astype(np.int32)
    key, ikey = jax.random.split(key)
    latents = jax.random.normal(ikey, (1, HW, HW, C))

    def norm_loss_and_grad(e_np, with_anchor, init_np, t):
        e = jnp.asarray(e_np)

        def f(e):
            B = latents.shape[0]
            eps_u = _eps_fn(params, latents, jnp.broadcast_to(t, (B,)), jnp.broadcast_to(uncond, (B, L, D)))
            eps_t = _eps_fn(params, latents, jnp.broadcast_to(t, (B,)), jnp.broadcast_to(e, (B, L, D)))
            norm = jnp.sqrt(jnp.sum((eps_t - eps_u).astype(jnp.float32) ** 2))
            if with_anchor:
                drift = jnp.sqrt(jnp.sum((e[:, 1:] - jnp.asarray(init_np)[:, 1:]) ** 2, axis=-1)).mean()
                return alpha * norm + (1 - alpha) * drift, norm
            return norm, norm

        (val, raw), g = jax.value_and_grad(f, has_aux=True)(e)
        return float(raw), np.array(g)  # np.array: writable copy

    first_target = min(target_steps)
    for i in range(first_target):
        t = jnp.asarray(int(ts[i]))
        B = latents.shape[0]
        eps_u = _eps_fn(params, latents, jnp.broadcast_to(t, (B,)), jnp.broadcast_to(uncond, (B, L, D)))
        eps_t = _eps_fn(params, latents, jnp.broadcast_to(t, (B,)), jnp.broadcast_to(prompt, (B, L, D)))
        eps = eps_u + guidance_scale * (eps_t - eps_u)
        latents = ddim_step(sched, latents, eps, t, jnp.asarray(int(prev[i])))

    t = jnp.asarray(int(ts[first_target]))
    single = torch.tensor(np.asarray(prompt), dtype=torch.float64, requires_grad=True)
    init_np = np.asarray(prompt).copy()
    optimizer = torch.optim.AdamW([single], lr=lr)
    for j in range(optim_iters):
        e_np = single.detach().numpy().astype(np.float32)
        # drift check BEFORE the loss (reference ``:577-599``)
        drift = float(np.sqrt(((e_np[:, 1:] - init_np[:, 1:]) ** 2).sum(-1)).mean())
        with_anchor = optim_epsilon is not None and drift > optim_epsilon
        raw, g = norm_loss_and_grad(e_np, with_anchor, init_np, t)
        if target_loss is not None and raw <= target_loss:
            break
        g[:, 0] = 0.0
        single.grad = torch.tensor(g, dtype=torch.float64)
        optimizer.step()
        optimizer.zero_grad()
    return single.detach().numpy().astype(np.float32)


@pytest.mark.parametrize("kwargs", [
    dict(lr=0.05, optim_iters=5),
    dict(lr=0.05, optim_iters=8, optim_epsilon=1e-4, alpha=0.5),
    dict(lr=0.05, optim_iters=50, target_loss=3.0),
])
def test_aug_prompt_matches_torch_adamw_loop(setup, kwargs):
    sched, params, pipe, prompt, uncond = setup
    key = jax.random.PRNGKey(5)
    ours = pipe.aug_prompt(prompt, uncond, key, height=HW, width=HW,
                           num_inference_steps=8, guidance_scale=7.5,
                           target_steps=(1,), **kwargs)
    golden = _golden_aug_prompt(sched, params, prompt, uncond, key,
                                target_steps=(1,), num_inference_steps=8,
                                guidance_scale=7.5, **kwargs)
    np.testing.assert_allclose(np.asarray(ours), golden, rtol=5e-4, atol=5e-5)
    # the optimization actually moved the (non-BOS) embeddings
    assert np.abs(np.asarray(ours)[:, 1:] - np.asarray(prompt)[:, 1:]).max() > 1e-4
