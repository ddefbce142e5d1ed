"""FULL-UNet golden test: a torch implementation of the diffusers
UNet2DModel forward (diffusers-free, exact naming) vs our flax UNet2D with
converted weights — validates block order, skip wiring, time embeddings,
attention and the weight map end-to-end (SURVEY 'hard parts': gate HF
conversion with golden-output tests)."""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from siss_tpu.models.unet2d import UNet2D, UNet2DConfig  # noqa: E402
from siss_tpu.utils.hf_convert import convert_unet2d  # noqa: E402

CH = (16, 32)
GROUPS = 8
HEAD_DIM = 8


def timestep_embedding(t, dim, flip=True, shift=0.0):
    half = dim // 2
    exponent = -math.log(10000.0) * torch.arange(half, dtype=torch.float32) / (half - shift)
    emb = torch.exp(exponent)[None] * t.float()[:, None]
    emb = torch.cat([emb.sin(), emb.cos()], dim=-1)
    if flip:
        emb = torch.cat([emb[:, half:], emb[:, :half]], dim=-1)
    return emb


class TResnet(tnn.Module):
    def __init__(self, cin, cout, temb):
        super().__init__()
        self.norm1 = tnn.GroupNorm(GROUPS, cin, eps=1e-6)
        self.conv1 = tnn.Conv2d(cin, cout, 3, padding=1)
        self.time_emb_proj = tnn.Linear(temb, cout)
        self.norm2 = tnn.GroupNorm(GROUPS, cout, eps=1e-6)
        self.conv2 = tnn.Conv2d(cout, cout, 3, padding=1)
        self.conv_shortcut = tnn.Conv2d(cin, cout, 1) if cin != cout else None

    def forward(self, x, temb):
        h = self.conv1(F.silu(self.norm1(x)))
        h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        r = self.conv_shortcut(x) if self.conv_shortcut is not None else x
        return h + r


class TAttn(tnn.Module):
    def __init__(self, ch):
        super().__init__()
        self.heads = max(ch // HEAD_DIM, 1)
        self.group_norm = tnn.GroupNorm(GROUPS, ch, eps=1e-6)
        self.to_q, self.to_k, self.to_v = (tnn.Linear(ch, ch) for _ in range(3))
        self.to_out = tnn.ModuleList([tnn.Linear(ch, ch)])

    def forward(self, x):
        B, C, H, W = x.shape
        h = self.group_norm(x).reshape(B, C, H * W).transpose(1, 2)
        q, k, v = self.to_q(h), self.to_k(h), self.to_v(h)
        hd = C // self.heads

        def split(a):
            return a.reshape(B, H * W, self.heads, hd).transpose(1, 2)

        att = torch.softmax(split(q) @ split(k).transpose(-1, -2) / math.sqrt(hd), -1)
        o = (att @ split(v)).transpose(1, 2).reshape(B, H * W, C)
        o = self.to_out[0](o)
        return o.transpose(1, 2).reshape(B, C, H, W) + x


class TorchUNet2D(tnn.Module):
    """diffusers UNet2DModel forward for config: channels (16,32),
    down (DownBlock2D, AttnDownBlock2D), up (AttnUpBlock2D, UpBlock2D),
    layers_per_block=2, downsample padding=1."""

    def __init__(self, in_ch=1, out_ch=1):
        super().__init__()
        temb = CH[0] * 4
        md = tnn.ModuleDict
        self.time_embedding = md({"linear_1": tnn.Linear(CH[0], temb),
                                  "linear_2": tnn.Linear(temb, temb)})
        self.conv_in = tnn.Conv2d(in_ch, CH[0], 3, padding=1)

        self.d0_res = tnn.ModuleList([TResnet(CH[0], CH[0], temb), TResnet(CH[0], CH[0], temb)])
        self.d0_down = tnn.Conv2d(CH[0], CH[0], 3, stride=2, padding=1)
        self.d1_res = tnn.ModuleList([TResnet(CH[0], CH[1], temb), TResnet(CH[1], CH[1], temb)])
        self.d1_attn = tnn.ModuleList([TAttn(CH[1]), TAttn(CH[1])])

        self.mid_res0 = TResnet(CH[1], CH[1], temb)
        self.mid_attn = TAttn(CH[1])
        self.mid_res1 = TResnet(CH[1], CH[1], temb)

        # up block 0: AttnUpBlock2D out=32 (skips: 32,32,16)
        self.u0_res = tnn.ModuleList([TResnet(CH[1] + CH[1], CH[1], temb),
                                      TResnet(CH[1] + CH[1], CH[1], temb),
                                      TResnet(CH[1] + CH[0], CH[1], temb)])
        self.u0_attn = tnn.ModuleList([TAttn(CH[1]) for _ in range(3)])
        self.u0_up = tnn.Conv2d(CH[1], CH[1], 3, padding=1)
        # up block 1: UpBlock2D out=16 (skips: 16,16,16)
        self.u1_res = tnn.ModuleList([TResnet(CH[1] + CH[0], CH[0], temb),
                                      TResnet(CH[0] + CH[0], CH[0], temb),
                                      TResnet(CH[0] + CH[0], CH[0], temb)])
        self.conv_norm_out = tnn.GroupNorm(GROUPS, CH[0], eps=1e-6)
        self.conv_out = tnn.Conv2d(CH[0], out_ch, 3, padding=1)

    def forward(self, x, t):
        temb = timestep_embedding(t, CH[0])
        temb = self.time_embedding["linear_2"](F.silu(self.time_embedding["linear_1"](temb)))
        h = self.conv_in(x)
        skips = [h]
        for r in self.d0_res:
            h = r(h, temb)
            skips.append(h)
        h = self.d0_down(h)
        skips.append(h)
        for r, a in zip(self.d1_res, self.d1_attn):
            h = a(r(h, temb))
            skips.append(h)
        h = self.mid_res1(self.mid_attn(self.mid_res0(h, temb)), temb)
        for r, a in zip(self.u0_res, self.u0_attn):
            h = a(r(torch.cat([h, skips.pop()], dim=1), temb))
        h = self.u0_up(F.interpolate(h, scale_factor=2, mode="nearest"))
        for r in self.u1_res:
            h = r(torch.cat([h, skips.pop()], dim=1), temb)
        return self.conv_out(F.silu(self.conv_norm_out(h)))

    def diffusers_state_dict(self):
        """Rename to diffusers UNet2DModel keys."""
        ren = {}
        sd = self.state_dict()
        for k, v in sd.items():
            nk = (k
                  .replace("d0_res.", "down_blocks.0.resnets.")
                  .replace("d0_down.", "down_blocks.0.downsamplers.0.conv.")
                  .replace("d1_res.", "down_blocks.1.resnets.")
                  .replace("d1_attn.", "down_blocks.1.attentions.")
                  .replace("mid_res0.", "mid_block.resnets.0.")
                  .replace("mid_res1.", "mid_block.resnets.1.")
                  .replace("mid_attn.", "mid_block.attentions.0.")
                  .replace("u0_res.", "up_blocks.0.resnets.")
                  .replace("u0_attn.", "up_blocks.0.attentions.")
                  .replace("u0_up.", "up_blocks.0.upsamplers.0.conv.")
                  .replace("u1_res.", "up_blocks.1.resnets."))
            ren[nk] = v.numpy()
        return ren


def test_full_unet_forward_parity():
    torch.manual_seed(0)
    tmodel = TorchUNet2D().eval()
    cfg = UNet2DConfig(
        sample_size=16, in_channels=1, out_channels=1,
        block_out_channels=CH,
        down_block_types=("DownBlock2D", "AttnDownBlock2D"),
        up_block_types=("AttnUpBlock2D", "UpBlock2D"),
        layers_per_block=2, attention_head_dim=HEAD_DIM,
        norm_num_groups=GROUPS, flip_sin_to_cos=True, freq_shift=0,
        downsample_padding=1,
    )
    fmodel = UNet2D(cfg)
    template = fmodel.init_params(jax.random.PRNGKey(0))
    params = convert_unet2d(tmodel.diffusers_state_dict(), template)

    x = np.random.default_rng(0).normal(size=(2, 1, 16, 16)).astype(np.float32)
    t = np.array([7, 891], np.int64)
    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(x), torch.from_numpy(t)).numpy()
    f_out = fmodel.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)),
                         jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(f_out).transpose(0, 3, 1, 2), t_out,
                               rtol=5e-4, atol=5e-5)
