"""Stable Diffusion pipeline with memorization diagnostics.

TPU-native equivalent of the reference's ``LocalStableDiffusionPipeline``
(``data/src/local_sd_pipeline.py``, itself forked from Wen et al.'s
memorization repo):

* ``__call__`` — CFG DDIM/DDPM sampling with optional per-step
  ``track_noise_norm`` curves (‖ε_uncond‖, ‖ε_text−ε_uncond‖ per image;
  reference ``:142-196,225-235``) — one ``lax.scan``; VAE decode fused in.
* ``img2img`` — ``get_timesteps``/``prepare_latents_img2img`` (``:241-323``).
* ``get_text_cond_grad`` — per-token gradient norms of the text-conditional
  noise norm w.r.t. prompt embeddings at target steps (``:325-472``).
* ``aug_prompt`` — AdamW optimization of prompt embeddings to minimize the
  text-conditional noise norm (Wen et al. inference-time mitigation; used
  offline to build "augmented prompt" embedding files; ``:474-702``).

Prompts enter as embeddings ([77, 768]) — computed by ``encode_prompt``
when a tokenizer is available, or loaded from ``.npz``/``.pt`` files (the
reference's token-optimized prompts, ``delete_sd.py:937-944``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from siss_tpu.diffusion.sampling import sample_ddim_cfg
from siss_tpu.diffusion.schedule import NoiseSchedule, ddim_step, spaced_timesteps


def sd_noise_schedule(num_train_timesteps: int = 1000) -> NoiseSchedule:
    """SD-1.x schedule: scaled_linear β ∈ [0.00085, 0.012], no clipping."""
    return NoiseSchedule.create(
        num_train_timesteps, "scaled_linear", 0.00085, 0.012, clip_sample=False
    )


@dataclasses.dataclass
class StableDiffusionPipeline:
    unet_apply: Callable      # (params, latents, t, context) -> eps
    unet_params: Any
    vae_decode: Callable      # (params, latents) -> images [-1,1]
    vae_params: Any
    text_apply: Optional[Callable] = None   # (params, input_ids) -> embeds
    text_params: Any = None
    tokenizer: Any = None
    schedule: NoiseSchedule = dataclasses.field(default_factory=sd_noise_schedule)
    latent_channels: int = 4
    vae_scale_factor: int = 8

    # ------------------------------------------------------------- prompts
    def encode_prompt(self, prompt: str, max_length: int = 77) -> jax.Array:
        if self.tokenizer is None or self.text_apply is None:
            raise RuntimeError(
                "No tokenizer/text encoder available; pass precomputed prompt "
                "embeddings (load_prompt_embeds) instead."
            )
        ids = self.tokenizer(prompt, padding="max_length", max_length=max_length,
                             truncation=True, return_tensors="np").input_ids
        return self.text_apply(self.text_params, jnp.asarray(ids))

    def uncond_embeds(self, batch_size: int = 1) -> jax.Array:
        e = self.encode_prompt("")
        return jnp.broadcast_to(e, (batch_size, e.shape[-2], e.shape[-1]))

    @staticmethod
    def load_prompt_embeds(path: str) -> jax.Array:
        """Load precomputed prompt embeddings (.npz with 'embeds', or a
        torch .pt file — the reference's aug-prompt artifacts)."""
        if path.endswith(".npz"):
            return jnp.asarray(np.load(path)["embeds"])
        import torch

        t = torch.load(path, map_location="cpu", weights_only=False)
        return jnp.asarray(np.asarray(t.detach() if hasattr(t, "detach") else t))

    # ------------------------------------------------------------ sampling
    def _eps_fn(self, params):
        def eps_fn(x, t, context):
            return self.unet_apply(params, x, t, context)

        return eps_fn

    def __call__(self, prompt_embeds: jax.Array, uncond_embeds: jax.Array,
                 key: jax.Array, height: int = 512, width: int = 512,
                 num_inference_steps: int = 50, guidance_scale: float = 7.5,
                 track_noise_norm: bool = False, params: Any = None,
                 decode: bool = True) -> Tuple[np.ndarray, Optional[Dict[str, np.ndarray]]]:
        """Sample images for a batch of prompt embeddings; returns
        (images [0,1] NHWC, noise_norms or None)."""
        params = params if params is not None else self.unet_params
        B = prompt_embeds.shape[0]
        shape = (B, height // self.vae_scale_factor, width // self.vae_scale_factor,
                 self.latent_channels)
        latents, norms = sample_ddim_cfg(
            self._eps_fn(params), self.schedule, key, shape,
            prompt_embeds, uncond_embeds, guidance_scale=guidance_scale,
            num_inference_steps=num_inference_steps,
            track_noise_norm=track_noise_norm,
        )
        if decode:
            images = self.vae_decode(self.vae_params, latents)
            images = np.clip((np.asarray(images) + 1.0) / 2.0, 0.0, 1.0)
        else:
            images = np.asarray(latents)
        if track_noise_norm:
            return images, {k: np.asarray(v) for k, v in norms.items()}
        return images, None

    # ------------------------------------------------------------- img2img
    def get_timesteps(self, num_inference_steps: int, strength: float):
        """diffusers img2img timestep clipping (``:241-262``)."""
        init_timestep = min(int(num_inference_steps * strength), num_inference_steps)
        t_start = max(num_inference_steps - init_timestep, 0)
        ts = spaced_timesteps(self.schedule.num_train_timesteps, num_inference_steps)
        return ts[t_start:], num_inference_steps - t_start

    def img2img(self, init_latents: jax.Array, prompt_embeds: jax.Array,
                uncond_embeds: jax.Array, key: jax.Array, strength: float = 0.8,
                num_inference_steps: int = 50, guidance_scale: float = 7.5,
                params: Any = None) -> np.ndarray:
        """``prepare_latents_img2img`` + partial CFG DDIM (``:264-323``)."""
        params = params if params is not None else self.unet_params
        ts, _ = self.get_timesteps(num_inference_steps, strength)
        key, nkey = jax.random.split(key)
        noise = jax.random.normal(nkey, init_latents.shape, dtype=init_latents.dtype)
        t0 = jnp.asarray(int(ts[0]))
        gamma = self.schedule.gamma[t0]
        sigma = self.schedule.sigma[t0]
        x = gamma * init_latents + sigma * noise

        B = prompt_embeds.shape[0]
        both = jnp.concatenate([uncond_embeds, prompt_embeds], axis=0)
        prev = np.concatenate([ts[1:], [-1]]).astype(np.int32)

        def body(carry, step_ts):
            x, k = carry
            t, p = step_ts
            k, sub = jax.random.split(k)
            eps_both = self.unet_apply(params, jnp.concatenate([x, x]), jnp.broadcast_to(t, (2 * B,)), both)
            eps = eps_both[:B] + guidance_scale * (eps_both[B:] - eps_both[:B])
            x = ddim_step(self.schedule, x, eps, t, p)
            return (x, k), None

        (x, _), _ = jax.lax.scan(body, (x, key), (jnp.asarray(ts), jnp.asarray(prev)))
        images = self.vae_decode(self.vae_params, x)
        return np.clip((np.asarray(images) + 1.0) / 2.0, 0.0, 1.0)

    # --------------------------------------------- memorization diagnostics
    def _text_norm_loss(self, params, latents, t, prompt_embeds, uncond_embeds):
        B = latents.shape[0]
        both = jnp.concatenate([jnp.broadcast_to(uncond_embeds, (B, *uncond_embeds.shape[-2:])),
                                jnp.broadcast_to(prompt_embeds, (B, *prompt_embeds.shape[-2:]))])
        eps_both = self.unet_apply(params, jnp.concatenate([latents, latents]),
                                   jnp.broadcast_to(t, (2 * B,)), both)
        delta = eps_both[B:] - eps_both[:B]
        return jnp.sqrt(jnp.sum(delta.astype(jnp.float32) ** 2)), (eps_both[:B], delta)

    def get_text_cond_grad(self, prompt_embeds: jax.Array, uncond_embeds: jax.Array,
                           key: jax.Array, height: int = 512, width: int = 512,
                           num_inference_steps: int = 50, guidance_scale: float = 7.5,
                           target_steps: Sequence[int] = (0,), params: Any = None) -> np.ndarray:
        """Mean (over target steps) per-token L2 norm of ∂‖ε_text−ε_uncond‖/∂embeds
        (``:325-472``). Returns [77] token-gradient magnitudes."""
        params = params if params is not None else self.unet_params
        ts = spaced_timesteps(self.schedule.num_train_timesteps, num_inference_steps)
        prev = np.concatenate([ts[1:], [-1]]).astype(np.int32)
        shape = (1, height // self.vae_scale_factor, width // self.vae_scale_factor, self.latent_channels)
        key, ikey = jax.random.split(key)
        latents = jax.random.normal(ikey, shape)

        @jax.jit
        def grad_at(latents, t, embeds):
            def loss(e):
                val, _ = self._text_norm_loss(params, latents, t, e, uncond_embeds)
                return val

            g = jax.grad(loss)(embeds)
            return jnp.sqrt(jnp.sum(g.astype(jnp.float32) ** 2, axis=-1)).mean(axis=0)

        @jax.jit
        def advance(latents, t, p):
            _, (eps_uncond, delta) = self._text_norm_loss(params, latents, t, prompt_embeds, uncond_embeds)
            eps = eps_uncond + guidance_scale * delta
            return ddim_step(self.schedule, latents, eps, t, p)

        grads = []
        target = set(int(s) for s in target_steps)
        for i, (t, p) in enumerate(zip(ts, prev)):
            t, p = jnp.asarray(int(t)), jnp.asarray(int(p))
            if i in target:
                grads.append(grad_at(latents, t, prompt_embeds))
            if i == max(target):
                break
            latents = advance(latents, t, p)
        return np.asarray(jnp.stack(grads).mean(axis=0))

    def aug_prompt(self, prompt_embeds: jax.Array, uncond_embeds: jax.Array,
                   key: jax.Array, height: int = 512, width: int = 512,
                   num_inference_steps: int = 50, guidance_scale: float = 7.5,
                   target_steps: Sequence[int] = (0,), lr: float = 0.1,
                   optim_iters: int = 10, target_loss: Optional[float] = None,
                   optim_epsilon: Optional[float] = None, alpha: float = 0.5,
                   params: Any = None) -> jax.Array:
        """Optimize prompt embeddings to minimize ‖ε_text−ε_uncond‖ at the
        first target step (``:474-702``): AdamW on the embeddings, BOS token
        (index 0) frozen, optional L2 anchor to the initial embeddings when
        drift exceeds ``optim_epsilon``; optional ``target_loss`` early stop."""
        params = params if params is not None else self.unet_params
        ts = spaced_timesteps(self.schedule.num_train_timesteps, num_inference_steps)
        prev = np.concatenate([ts[1:], [-1]]).astype(np.int32)
        shape = (1, height // self.vae_scale_factor, width // self.vae_scale_factor, self.latent_channels)
        key, ikey = jax.random.split(key)
        latents = jax.random.normal(ikey, shape)

        @jax.jit
        def advance(latents, t, p, embeds):
            _, (eps_uncond, delta) = self._text_norm_loss(params, latents, t, embeds, uncond_embeds)
            eps = eps_uncond + guidance_scale * delta
            return ddim_step(self.schedule, latents, eps, t, p)

        first_target = min(int(s) for s in target_steps)
        for i in range(first_target):
            latents = advance(latents, jnp.asarray(int(ts[i])), jnp.asarray(int(prev[i])), prompt_embeds)

        t = jnp.asarray(int(ts[first_target]))
        init_embeds = prompt_embeds
        # torch AdamW defaults (the reference's optimizer, ``:565``) —
        # weight decay also nudges the frozen BOS slightly, as in torch.
        tx = optax.adamw(lr, weight_decay=0.01)
        opt_state = tx.init(prompt_embeds)

        @jax.jit
        def opt_step(embeds, opt_state):
            def loss_fn(e):
                norm, _ = self._text_norm_loss(params, latents, t, e, uncond_embeds)
                if optim_epsilon is not None:
                    # double-where: sqrt'(0)=inf would leak NaN through the
                    # unselected branch at the first iterate (zero drift)
                    sq = jnp.sum((e[:, 1:] - init_embeds[:, 1:]).astype(jnp.float32) ** 2, axis=-1)
                    safe = jnp.sqrt(jnp.where(sq > 0.0, sq, 1.0))
                    drift = jnp.where(sq > 0.0, safe, 0.0).mean()
                    anchored = alpha * norm + (1 - alpha) * drift
                    norm_out = jnp.where(drift > optim_epsilon, anchored, norm)
                else:
                    norm_out = norm
                return norm_out, norm

            (loss, raw_norm), g = jax.value_and_grad(loss_fn, has_aux=True)(embeds)
            g = g.at[:, 0].set(0.0)  # BOS frozen (reference ``:650-653``)
            updates, opt_state = tx.update(g, opt_state, embeds)
            return optax.apply_updates(embeds, updates), opt_state, raw_norm

        embeds = prompt_embeds
        for j in range(optim_iters):
            # the reference checks target_loss on the CURRENT loss before
            # taking the step (``:641-646``), so a below-target iterate is
            # returned un-updated
            new_embeds, new_opt_state, raw_norm = opt_step(embeds, opt_state)
            if target_loss is not None and float(raw_norm) <= target_loss:
                break
            embeds, opt_state = new_embeds, new_opt_state
        return embeds
