"""Frozen-VAE latent-moments cache for the ``delete_sd`` hot path.

The reference re-encodes every pixel batch through the frozen VAE
encoder every optimizer step (``delete_sd.py:879-888``). But the encoder
is deterministic, its weights are frozen, and both SISS streams draw
from FINITE datasets (``SDData`` keep/forget splits), so each image's
posterior moments ``(mean, logvar)`` are step-invariant — only the
reparameterization noise ``eps`` is fresh per step. Caching the moments
once at task start and sampling

    z = (mean + exp(0.5*logvar) * eps) * scaling_factor

inside the jitted step is *distributionally identical* to re-encoding
(and numerically identical when the cache is built at the same
microbatch shape the step would encode, since the VAE has no cross-batch
ops — GroupNorm normalizes per sample). It deletes the 512px encoder
conv stack from every training step and shrinks the host→device stream
~12× (3 MB fp32 pixels → 256 KB bf16 two-orientation moments at 512px).

``random_flip`` is a pre-encode pixel-space augmentation, and the VAE is
not exactly flip-equivariant, so the cache stores BOTH orientations
(axis 1: ``[unflipped, flipped]``) and the step selects per-sample with
the same Bernoulli draw the pixel path uses — keeping the PRNG
consumption of the cached and uncached steps identical.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def build_moment_cache(
    encode_moments: Callable[[jax.Array], tuple],
    dataset,
    microbatch: int,
    random_flip: bool,
) -> np.ndarray:
    """Encode every image in ``dataset`` once through the frozen encoder.

    Returns ``[N, O, h, w, 2C]`` with orientation axis ``O`` = 2 when
    ``random_flip`` (index 1 = horizontally flipped input) else 1, and the
    last axis = ``concat(mean, logvar)``. Encoded in batches of
    ``microbatch`` — match the training microbatch so the cached step is
    bit-identical to the in-step encode (per-sample numerics do not depend
    on batch size, but matching shapes avoids any layout-dependent drift).
    """
    enc = jax.jit(encode_moments)
    n = len(dataset)
    microbatch = max(1, min(int(microbatch), n))
    out = None
    for start in range(0, n, microbatch):
        idx = range(start, min(start + microbatch, n))
        imgs = np.stack([np.asarray(dataset[i], np.float32) for i in idx])
        pad = microbatch - len(imgs)
        if pad:  # pad the ragged tail; per-sample conv results are unaffected
            imgs = np.concatenate([imgs, np.repeat(imgs[:1], pad, axis=0)])
        variants = [imgs]
        if random_flip:
            variants.append(imgs[:, :, ::-1, :])  # NHWC → flip W
        moms = []
        for v in variants:
            mean, logvar = enc(jnp.asarray(v))
            moms.append(np.concatenate([np.asarray(mean), np.asarray(logvar)], axis=-1))
        m = np.stack(moms, axis=1)  # [mb, O, h, w, 2C]
        if out is None:
            out = np.empty((n, *m.shape[1:]), m.dtype)
        out[start : start + len(idx)] = m[: len(idx)]
    return out


def cache_nbytes(
    n_images: int, resolution: int, vae_scale_factor: int, latent_channels: int,
    random_flip: bool, itemsize: int,
) -> int:
    """Host-RAM footprint of ``build_moment_cache`` for a dataset."""
    hw = resolution // vae_scale_factor
    orient = 2 if random_flip else 1
    return n_images * orient * hw * hw * 2 * latent_channels * itemsize


def sample_from_moments(
    moments: jax.Array,
    key: jax.Array,
    flip_bits,
    scaling_factor: float,
) -> jax.Array:
    """``[A, mb, O, h, w, 2C]`` cached moments → ``[A, mb, h, w, C]`` latents.

    Mirrors the uncached step's RNG exactly: ``key`` is split once per
    accumulation microbatch and one ``normal`` of the latent shape is drawn
    per microbatch (as ``AutoencoderKL.encode_sample`` does per ``enc``
    call in ``tasks/delete_sd.py::sd_step_core``). ``flip_bits`` is the
    step's single Bernoulli draw of shape ``[A, mb, 1, 1, 1]`` (or None
    when ``random_flip`` is off) — the SAME array is passed for both the
    keep and forget streams, matching the pixel path's shared mask.
    """
    accum = moments.shape[0]
    if flip_bits is not None:
        sel = jnp.where(flip_bits, moments[:, :, 1], moments[:, :, 0])
    else:
        sel = moments[:, :, 0]
    mean, logvar = jnp.split(sel, 2, axis=-1)

    def one(xs):
        m, lv, k = xs
        z = m + jnp.exp(0.5 * lv) * jax.random.normal(k, m.shape, dtype=m.dtype)
        return z * scaling_factor

    keys = jax.random.split(key, accum)
    return jax.lax.map(one, (mean, logvar, keys))
