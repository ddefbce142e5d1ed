"""HF-checkpoint converter tests.

Since no real diffusers checkpoints exist in offline CI, these tests build
torch modules that replicate the diffusers blocks the reference models use
(ResnetBlock2D, spatial Attention, Downsample2D with DDPM padding) with the
exact diffusers parameter naming, convert their state dicts, and require
numerical agreement between torch and our flax blocks — an independent
golden check of GroupNorm grouping, conv padding, attention scaling and the
weight-transpose map.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from siss_tpu.models.layers import Downsample2D, ResnetBlock2D, SpatialAttention  # noqa: E402
from siss_tpu.utils.hf_convert import convert_unet2d, _flax_path_to_torch_key  # noqa: E402


def _to_flax(sd, template):
    return convert_unet2d({k: v.detach().numpy() for k, v in sd.items()}, template)


class TorchResnetBlock(tnn.Module):
    """diffusers ResnetBlock2D (default config subset) with exact naming."""

    def __init__(self, in_ch, out_ch, temb_ch, groups=8, eps=1e-6):
        super().__init__()
        self.norm1 = tnn.GroupNorm(groups, in_ch, eps=eps)
        self.conv1 = tnn.Conv2d(in_ch, out_ch, 3, padding=1)
        self.time_emb_proj = tnn.Linear(temb_ch, out_ch)
        self.norm2 = tnn.GroupNorm(groups, out_ch, eps=eps)
        self.conv2 = tnn.Conv2d(out_ch, out_ch, 3, padding=1)
        self.conv_shortcut = tnn.Conv2d(in_ch, out_ch, 1) if in_ch != out_ch else None

    def forward(self, x, temb):
        h = self.conv1(F.silu(self.norm1(x)))
        h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        res = self.conv_shortcut(x) if self.conv_shortcut is not None else x
        return h + res


class TorchAttention(tnn.Module):
    """diffusers Attention over 2D maps (modern to_q/to_k/to_v/to_out.0)."""

    def __init__(self, ch, heads=1, groups=8, eps=1e-6):
        super().__init__()
        self.heads = heads
        self.group_norm = tnn.GroupNorm(groups, ch, eps=eps)
        self.to_q = tnn.Linear(ch, ch)
        self.to_k = tnn.Linear(ch, ch)
        self.to_v = tnn.Linear(ch, ch)
        self.to_out = tnn.ModuleList([tnn.Linear(ch, ch)])

    def forward(self, x):
        B, C, H, W = x.shape
        h = self.group_norm(x).reshape(B, C, H * W).transpose(1, 2)
        q, k, v = self.to_q(h), self.to_k(h), self.to_v(h)
        hd = C // self.heads

        def split(a):
            return a.reshape(B, H * W, self.heads, hd).transpose(1, 2)

        q, k, v = split(q), split(k), split(v)
        attn = torch.softmax(q @ k.transpose(-1, -2) / np.sqrt(hd), dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(B, H * W, C)
        out = self.to_out[0](out)
        return out.transpose(1, 2).reshape(B, C, H, W) + x


def test_key_mapping_candidates():
    cands = _flax_path_to_torch_key(("down_blocks_0_resnets_1", "conv1", "kernel"))
    assert cands == ["down_blocks.0.resnets.1.conv1.weight"]
    cands = _flax_path_to_torch_key(("mid_block_attentions_0", "to_out", "kernel"))
    assert cands[0] == "mid_block.attentions.0.to_out.0.weight"
    assert cands[1] == "mid_block.attentions.0.proj_attn.weight"
    cands = _flax_path_to_torch_key(("down_blocks_1_downsamplers_0", "conv", "bias"))
    assert cands == ["down_blocks.1.downsamplers.0.conv.bias"]
    cands = _flax_path_to_torch_key(("conv_norm_out", "scale"))
    assert cands == ["conv_norm_out.weight"]


def test_resnet_block_numerical_parity():
    torch.manual_seed(0)
    tblock = TorchResnetBlock(in_ch=16, out_ch=24, temb_ch=32).eval()
    fblock = ResnetBlock2D(out_channels=24, groups=8)
    x = np.random.default_rng(0).normal(size=(2, 16, 10, 10)).astype(np.float32)
    temb = np.random.default_rng(1).normal(size=(2, 32)).astype(np.float32)

    template = fblock.init(jax.random.PRNGKey(0), jnp.asarray(x.transpose(0, 2, 3, 1)),
                           jnp.asarray(temb))["params"]
    # prefix-free: block params live at top level → direct name mapping
    params = _to_flax(tblock.state_dict(), template)

    with torch.no_grad():
        t_out = tblock(torch.from_numpy(x), torch.from_numpy(temb)).numpy()
    f_out = fblock.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(temb))
    np.testing.assert_allclose(np.asarray(f_out).transpose(0, 3, 1, 2), t_out, rtol=2e-4, atol=2e-5)


def test_attention_numerical_parity():
    torch.manual_seed(1)
    tattn = TorchAttention(ch=32, heads=4).eval()
    fattn = SpatialAttention(channels=32, num_heads=4, groups=8)
    x = np.random.default_rng(2).normal(size=(2, 32, 6, 6)).astype(np.float32)
    template = fattn.init(jax.random.PRNGKey(0), jnp.asarray(x.transpose(0, 2, 3, 1)))["params"]
    params = _to_flax(tattn.state_dict(), template)
    with torch.no_grad():
        t_out = tattn(torch.from_numpy(x)).numpy()
    f_out = fattn.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(f_out).transpose(0, 3, 1, 2), t_out, rtol=2e-4, atol=2e-5)


def test_old_style_attention_names():
    """Pre-0.18 checkpoints use query/key/value/proj_attn with [O,I] or
    [O,I,1] tensors; converter must accept them."""
    torch.manual_seed(2)
    tattn = TorchAttention(ch=16, heads=1).eval()
    sd = tattn.state_dict()
    old_sd = {
        "group_norm.weight": sd["group_norm.weight"],
        "group_norm.bias": sd["group_norm.bias"],
        "query.weight": sd["to_q.weight"],
        "query.bias": sd["to_q.bias"],
        "key.weight": sd["to_k.weight"],
        "key.bias": sd["to_k.bias"],
        "value.weight": sd["to_v.weight"],
        "value.bias": sd["to_v.bias"],
        "proj_attn.weight": sd["to_out.0.weight"],
        "proj_attn.bias": sd["to_out.0.bias"],
    }
    fattn = SpatialAttention(channels=16, num_heads=1, groups=8)
    x = np.random.default_rng(3).normal(size=(1, 16, 4, 4)).astype(np.float32)
    template = fattn.init(jax.random.PRNGKey(0), jnp.asarray(x.transpose(0, 2, 3, 1)))["params"]
    params = _to_flax(old_sd, template)
    with torch.no_grad():
        t_out = tattn(torch.from_numpy(x)).numpy()
    f_out = fattn.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(f_out).transpose(0, 3, 1, 2), t_out, rtol=2e-4, atol=2e-5)


def test_ddpm_downsample_padding_parity():
    """google/ddpm models use downsample_padding=0 → F.pad (0,1,0,1)."""
    torch.manual_seed(3)
    conv = tnn.Conv2d(8, 8, 3, stride=2, padding=0)
    x = np.random.default_rng(4).normal(size=(1, 8, 9, 9)).astype(np.float32)
    with torch.no_grad():
        t_out = conv(F.pad(torch.from_numpy(x), (0, 1, 0, 1))).numpy()
    fdown = Downsample2D(out_channels=8, padding=0)
    template = fdown.init(jax.random.PRNGKey(0), jnp.asarray(x.transpose(0, 2, 3, 1)))["params"]
    params = _to_flax({"conv.weight": conv.weight, "conv.bias": conv.bias}, template)
    f_out = fdown.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(f_out).transpose(0, 3, 1, 2), t_out, rtol=2e-4, atol=2e-5)


def test_missing_weight_raises():
    fblock = Downsample2D(out_channels=4)
    x = jnp.zeros((1, 4, 4, 4))
    template = fblock.init(jax.random.PRNGKey(0), x)["params"]
    with pytest.raises(KeyError):
        convert_unet2d({}, template)
