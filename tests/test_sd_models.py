"""SD-stack model tests: shapes, conditioning sensitivity, and golden
numerical parity of the CLIP text encoder against HF transformers' torch
implementation (random-init tiny config — no downloads needed)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from siss_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
from siss_tpu.models.unet2d_cond import UNet2DCondition, UNet2DConditionConfig
from siss_tpu.models.vae import AutoencoderKL, AutoencoderKLConfig


@pytest.mark.slow
def test_cond_unet_shapes_and_conditioning():
    cfg = UNet2DConditionConfig.tiny()
    model = UNet2DCondition(cfg)
    params = model.init_params(jax.random.PRNGKey(0), context_len=7)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
    t = jnp.array([999, 999])
    ctx1 = jax.random.normal(jax.random.PRNGKey(2), (2, 7, cfg.cross_attention_dim))
    ctx2 = jax.random.normal(jax.random.PRNGKey(3), (2, 7, cfg.cross_attention_dim))
    o1 = model.apply({"params": params}, x, t, ctx1)
    o2 = model.apply({"params": params}, x, t, ctx2)
    assert o1.shape == (2, 8, 8, 4)
    assert np.abs(np.asarray(o1) - np.asarray(o2)).max() > 1e-5  # text actually conditions


@pytest.mark.slow
def test_cond_unet_gradient_checkpointing_equivalence():
    cfg = UNet2DConditionConfig.tiny()
    cfg_ckpt = UNet2DConditionConfig(**{**cfg.__dict__, "gradient_checkpointing": True})
    m1, m2 = UNet2DCondition(cfg), UNet2DCondition(cfg_ckpt)
    params = m1.init_params(jax.random.PRNGKey(0), context_len=7)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 7, cfg.cross_attention_dim))
    t = jnp.array([10])

    def loss(m):
        return lambda p: (m.apply({"params": p}, x, t, ctx) ** 2).sum()

    v1, g1 = jax.value_and_grad(loss(m1))(params)
    v2, g2 = jax.value_and_grad(loss(m2))(params)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)
    # selective remat policies change only WHAT is saved vs recomputed,
    # never the math — gradients must match the unrematted model too
    for policy in ("dots", "dots_no_batch"):
        cfg_pol = UNet2DConditionConfig(**{**cfg.__dict__, "gradient_checkpointing": True,
                                           "remat_policy": policy})
        v3, g3 = jax.value_and_grad(loss(UNet2DCondition(cfg_pol)))(params)
        np.testing.assert_allclose(float(v1), float(v3), rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g3)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_vae_roundtrip_shapes():
    cfg = AutoencoderKLConfig.tiny()
    vae = AutoencoderKL(cfg)
    params = vae.init_params(jax.random.PRNGKey(0), image_size=16)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
    z = vae.apply({"params": params}, x, jax.random.PRNGKey(2), method=vae.encode_sample)
    assert z.shape == (2, 8, 8, 4)  # /2 spatial (1 downsample in tiny), 4 latent ch
    rec = vae.apply({"params": params}, z, method=vae.decode)
    assert rec.shape == (2, 16, 16, 3)
    mean, logvar = vae.apply({"params": params}, x, method=vae.encode_moments)
    assert mean.shape == z.shape and logvar.shape == z.shape
    # sampling is keyed and reparameterized: different key → different z
    z2 = vae.apply({"params": params}, x, jax.random.PRNGKey(3), method=vae.encode_sample)
    assert np.abs(np.asarray(z) - np.asarray(z2)).max() > 1e-6


@pytest.mark.slow
def test_clip_text_parity_with_transformers():
    transformers = pytest.importorskip("transformers")
    import torch

    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=1000, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, max_position_embeddings=16, hidden_act="quick_gelu",
    )
    torch.manual_seed(0)
    hf_model = transformers.CLIPTextModel(hf_cfg).eval()

    cfg = CLIPTextConfig.tiny()
    model = CLIPTextModel(cfg)
    template = model.init_params(jax.random.PRNGKey(0))

    from siss_tpu.utils.sd_convert import convert_clip_text

    sd = {k: v.numpy() for k, v in hf_model.state_dict().items()}
    params = convert_clip_text(sd, template)

    ids = np.random.default_rng(0).integers(0, 1000, size=(2, 16))
    with torch.no_grad():
        hf_out = hf_model(torch.from_numpy(ids)).last_hidden_state.numpy()
    out = model.apply({"params": params}, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(out), hf_out, rtol=2e-4, atol=2e-5)


def test_sd_unet_converter_roundtrip():
    """Export our tiny cond-UNet params into a diffusers-named torch-layout
    state dict, convert back, require bit-identity — validates the name map
    and transposes are mutually consistent."""
    cfg = UNet2DConditionConfig.tiny()
    model = UNet2DCondition(cfg)
    params = model.init_params(jax.random.PRNGKey(0), context_len=7)

    from siss_tpu.utils.sd_convert import _SUFFIX, _expand_block_names, _fix_ff, convert_sd_unet

    sd = {}
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        names = tuple(p.key for p in path)
        parts = _expand_block_names(_fix_ff(names)[:-1])
        if parts[-1] == "to_out":
            parts = parts + ["0"]
        key = ".".join(parts + [_SUFFIX[names[-1]]])
        arr = np.asarray(leaf)
        if names[-1] == "kernel":
            arr = arr.transpose(3, 2, 0, 1) if arr.ndim == 4 else arr.transpose(1, 0)
        sd[key] = arr
    # sanity: keys look like diffusers keys
    assert any(k.startswith("down_blocks.0.attentions.0.transformer_blocks.0.attn2.to_k.weight") for k in sd)
    assert any(".ff.net.0.proj.weight" in k for k in sd)
    back = convert_sd_unet(sd, params)
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_vae_converter_roundtrip():
    cfg = AutoencoderKLConfig.tiny()
    vae = AutoencoderKL(cfg)
    params = vae.init_params(jax.random.PRNGKey(0), image_size=16)

    from siss_tpu.utils.sd_convert import _SUFFIX, _expand_block_names, convert_vae

    sd = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        names = tuple(p.key for p in path)
        parts = _expand_block_names([str(n) for n in names[:-1]])
        if parts[-1] == "to_out":
            parts = parts + ["0"]
        key = ".".join(parts + [_SUFFIX[names[-1]]])
        arr = np.asarray(leaf)
        if names[-1] == "kernel":
            arr = arr.transpose(3, 2, 0, 1) if arr.ndim == 4 else arr.transpose(1, 0)
        sd[key] = arr
    assert any(k.startswith("encoder.down_blocks.0.resnets.0.conv1.weight") for k in sd)
    assert "quant_conv.weight" in sd
    back = convert_vae(sd, params)
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
