"""Pinned-output regression goldens for the model stack.

Round 2 rewrote three layer lowerings (nearest-upsample as
broadcast+reshape, folded downsample padding, matmul 1×1 shortcut) that
are supposed to be *numerically identical* re-lowerings. These goldens
pin the float32 CPU outputs of fixed-seed models on fixed inputs so any
future "optimization" that silently changes semantics fails loudly.

If a change is INTENTIONALLY semantics-altering, regenerate with:
    python -m tests.test_model_goldens
"""

import json
import os

import jax

if __name__ == "__main__":
    # goldens are CPU-float32 numbers; the test harness (conftest) forces
    # CPU, and the sitecustomize's TPU platform choice beats env vars, so
    # regeneration must force it too
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from siss_tpu.models import UNet2D, UNet2DConfig

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "goldens", "unet_goldens.json")


def _build_cases():
    """Two fixed models exercising every rewritten layer: asymmetric-pad
    downsample + attention (celeb-style) and the default symmetric config."""
    celebish = UNet2DConfig(
        sample_size=16, in_channels=3, out_channels=3,
        block_out_channels=(16, 16, 32), layers_per_block=1,
        down_block_types=("DownBlock2D", "AttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "AttnUpBlock2D", "UpBlock2D"),
        attention_head_dim=None, norm_num_groups=8,
        flip_sin_to_cos=False, freq_shift=1, downsample_padding=0,
    )
    mnistish = UNet2DConfig(
        sample_size=16, in_channels=1, out_channels=1,
        block_out_channels=(16, 32), layers_per_block=2,
        down_block_types=("DownBlock2D", "AttnDownBlock2D"),
        up_block_types=("AttnUpBlock2D", "UpBlock2D"),
        attention_head_dim=8, norm_num_groups=8,
    )
    cases = {}
    for name, cfg in [("celebish", celebish), ("mnistish", mnistish)]:
        model = UNet2D(cfg)
        params = model.init_params(jax.random.PRNGKey(42))
        x = jax.random.normal(jax.random.PRNGKey(7),
                              (2, cfg.sample_size, cfg.sample_size, cfg.in_channels))
        t = jnp.asarray([17, 999])
        out = np.asarray(model.apply({"params": params}, x, t))
        cases[name] = out
    return cases


def _fingerprint(out: np.ndarray) -> dict:
    flat = out.reshape(-1).astype(np.float64)
    probe_idx = np.linspace(0, flat.size - 1, 16).astype(int)
    return {
        "shape": list(out.shape),
        "mean": float(flat.mean()),
        "std": float(flat.std()),
        "absmax": float(np.abs(flat).max()),
        "probes": [float(flat[i]) for i in probe_idx],
    }


def test_unet_outputs_match_goldens():
    with open(GOLDEN_PATH) as f:
        goldens = json.load(f)
    for name, out in _build_cases().items():
        got = _fingerprint(out)
        want = goldens[name]
        assert got["shape"] == want["shape"], (name, got["shape"], want["shape"])
        np.testing.assert_allclose(got["mean"], want["mean"], rtol=1e-4, atol=1e-6, err_msg=name)
        np.testing.assert_allclose(got["std"], want["std"], rtol=1e-4, err_msg=name)
        np.testing.assert_allclose(got["probes"], want["probes"], rtol=2e-4, atol=1e-5,
                                   err_msg=f"{name}: per-pixel outputs drifted — a layer "
                                           "rewrite changed semantics")


if __name__ == "__main__":
    os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
    with open(GOLDEN_PATH, "w") as f:
        json.dump({n: _fingerprint(o) for n, o in _build_cases().items()}, f, indent=2)
    print(f"wrote {GOLDEN_PATH}")
