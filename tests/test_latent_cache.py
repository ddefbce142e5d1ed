"""Frozen-VAE latent-moments cache (``data/latent_cache.py``).

The cache must reproduce the per-step encode the reference does
(``delete_sd.py:879-888``): same posterior moments per image (both flip
orientations), same reparameterization-noise RNG consumption. The cached
DeleteSD step then trains on the same latents as the uncached one up to
XLA fusion noise (~1e-7 fp32 — the moments come from a separately
compiled program), i.e. identical in distribution and numerics.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from siss_tpu.data.latent_cache import (build_moment_cache, cache_nbytes,
                                        sample_from_moments)
from siss_tpu.models.vae import AutoencoderKL, AutoencoderKLConfig

RES = 16


@pytest.fixture(scope="module")
def tiny_vae():
    vae = AutoencoderKL(AutoencoderKLConfig.tiny())
    params = vae.init_params(jax.random.PRNGKey(0), image_size=RES)
    return vae, params


def _moments_fn(vae, params):
    return lambda imgs: vae.apply({"params": params}, imgs,
                                  method=vae.encode_moments)


def test_cache_matches_encode_sample_unflipped(tiny_vae):
    """sample_from_moments(cache) ≡ lax.map(encode_sample) with identical keys."""
    vae, params = tiny_vae
    rng = np.random.default_rng(0)
    imgs = rng.normal(size=(6, RES, RES, 3)).astype(np.float32)
    cache = build_moment_cache(_moments_fn(vae, params), list(imgs),
                               microbatch=2, random_flip=False)
    lat = RES // (2 ** (len(vae.config.block_out_channels) - 1))
    assert cache.shape == (6, 1, lat, lat, 2 * vae.config.latent_channels)

    accum, mb = 3, 2
    batch_idx = np.arange(6).reshape(accum, mb)
    moments = jnp.asarray(cache[batch_idx])          # [A, mb, 1, h, w, 2C]
    key = jax.random.PRNGKey(7)
    z_cached = sample_from_moments(moments, key, None, vae.config.scaling_factor)

    # the uncached step path: split once per microbatch, encode_sample each
    ks = jax.random.split(key, accum)
    z_direct = jnp.stack([
        vae.apply({"params": params}, jnp.asarray(imgs[batch_idx[a]]), ks[a],
                  method=vae.encode_sample)
        for a in range(accum)
    ])
    # not bit-exact: encode_moments and encode_sample compile as separate
    # XLA programs whose conv fusions differ at ~1e-7 fp32; the moments and
    # the noise draw are identical, so the latents agree to fusion noise
    np.testing.assert_allclose(np.asarray(z_cached), np.asarray(z_direct),
                               rtol=5e-3, atol=5e-6)


def test_cache_flip_orientation_matches_pixel_flip(tiny_vae):
    """Orientation 1 of the cache ≡ encoding the horizontally flipped image,
    and the where-mask selection reproduces the pixel path's flip-then-encode."""
    vae, params = tiny_vae
    rng = np.random.default_rng(1)
    imgs = rng.normal(size=(4, RES, RES, 3)).astype(np.float32)
    cache = build_moment_cache(_moments_fn(vae, params), list(imgs),
                               microbatch=4, random_flip=True)
    assert cache.shape[1] == 2

    accum, mb = 2, 2
    batch_idx = np.arange(4).reshape(accum, mb)
    moments = jnp.asarray(cache[batch_idx])          # [A, mb, 2, h, w, 2C]
    key, k_flip = jax.random.PRNGKey(3), jax.random.PRNGKey(9)
    flip_bits = jax.random.bernoulli(k_flip, 0.5, (accum, mb, 1, 1, 1))
    z_cached = sample_from_moments(moments, key, flip_bits,
                                   vae.config.scaling_factor)

    pix = jnp.asarray(imgs[batch_idx])               # [A, mb, H, W, 3]
    pix = jnp.where(flip_bits, pix[:, :, :, ::-1, :], pix)
    ks = jax.random.split(key, accum)
    z_direct = jnp.stack([
        vae.apply({"params": params}, pix[a], ks[a], method=vae.encode_sample)
        for a in range(accum)
    ])
    np.testing.assert_allclose(np.asarray(z_cached), np.asarray(z_direct),
                               rtol=5e-3, atol=5e-6)


def test_cache_nbytes_and_budget_math():
    # 512px SD shape: 64×64 latents, 4 channels, two orientations, bf16
    per_img = cache_nbytes(1, 512, 8, 4, random_flip=True, itemsize=2)
    assert per_img == 64 * 64 * 8 * 2 * 2
    assert cache_nbytes(100, 512, 8, 4, True, 2) == 100 * per_img


def test_ragged_tail_batches_encode_correctly(tiny_vae):
    """N not divisible by the microbatch: padded tail rows must still hold
    each image's own moments (per-sample conv independence)."""
    vae, params = tiny_vae
    rng = np.random.default_rng(2)
    imgs = rng.normal(size=(5, RES, RES, 3)).astype(np.float32)
    c_mb2 = build_moment_cache(_moments_fn(vae, params), list(imgs), 2, False)
    c_mb5 = build_moment_cache(_moments_fn(vae, params), list(imgs), 5, False)
    np.testing.assert_allclose(c_mb2, c_mb5, rtol=1e-6, atol=1e-6)


@pytest.mark.slow
def test_delete_sd_cached_vs_uncached_task_equivalence(tmp_path):
    """The full DeleteSD task logs identical loss trajectories with
    cache_latents on vs off (same seed, random_flip on) — the cache is a
    pure hot-path optimization, not a semantic change."""
    from siss_tpu.config import load_config
    from siss_tpu.tasks.delete_sd import DeleteSD
    from tests.test_sd_pipeline import _make_sd_dataset

    def run(mode, sub):
        root = str(tmp_path / sub)
        os.makedirs(root)
        _make_sd_dataset(root)
        cfg = load_config("delete_sd", [
            f"base_dir={root}",
            f"output_dir={root}/out",
            "model_variant=tiny",
            "mesh.data=1",
            "training_steps=2",
            "train_batch_size=2",
            "gradient_accumulation_steps=2",
            "eval_batches=0",
            "resolution=32",
            "random_flip=true",
            # fp32 compute: in bf16 the cache's separately-rounded moments
            # differ in the last bf16 bit, which shows up as ~4e-4 in the
            # loss — fp32 keeps the A/B at XLA-fusion-noise tightness
            "compute_dtype=float32",
            f"cache_latents={mode}",
            "gradient_checkpointing=false",
            "pretrained_model_name_or_path=/nonexistent",
            "og_prompts_path=/nonexistent.json",
            "modified_prompts_path=/nonexistent.json",
        ])
        DeleteSD(cfg).run()
        rows = [json.loads(l) for l in open(os.path.join(root, "out", "metrics.jsonl"))]
        return [r for r in rows if "loss_x/mean" in r]

    cached, plain = run("true", "cached"), run("false", "plain")
    assert len(cached) == len(plain) == 2
    for rc, rp in zip(cached, plain):
        for k in ("loss_x/mean", "loss_a/mean", "gradient/scaling_factor",
                  "gradient/norm_loss_a"):
            np.testing.assert_allclose(rc[k], rp[k], rtol=1e-4,
                                       err_msg=f"metric {k} diverged")
