"""Full-size SD-1.x conditional UNet converter golden.

The SD analog of ``test_celeb_converter_golden``: builds the exact
diffusers ``UNet2DConditionModel`` architecture the reference loads from
``CompVis/stable-diffusion-v1-4`` (``delete_sd.py:459-468``) as a
diffusers-free torch reference — cross-attention Transformer2D blocks
(conv proj_in/out, GEGLU feed-forward, to_out.0 naming), symmetric
downsample, SD's flip_sin_to_cos/freq_shift=0 time embedding — exports a
diffusers-named state dict, converts through ``sd_convert.convert_sd_unet``,
and requires ε-output parity. Fast tier runs the full block structure
narrow; slow tier runs the real 860M-param SD v1 config at 64×64 latents.
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from siss_tpu.models.unet2d_cond import UNet2DCondition, UNet2DConditionConfig  # noqa: E402
from siss_tpu.utils.sd_convert import convert_sd_unet  # noqa: E402


def timestep_embedding(t, dim, flip_sin_to_cos, freq_shift):
    half = dim // 2
    exponent = -math.log(10000.0) * torch.arange(half, dtype=torch.float32)
    emb = torch.exp(exponent / (half - freq_shift))[None] * t.float()[:, None]
    emb = torch.cat([emb.sin(), emb.cos()], dim=-1)
    if flip_sin_to_cos:
        emb = torch.cat([emb[:, half:], emb[:, :half]], dim=-1)
    return emb


class ResnetBlock(tnn.Module):
    def __init__(self, cin, cout, temb_dim, groups, eps):
        super().__init__()
        self.norm1 = tnn.GroupNorm(groups, cin, eps=eps)
        self.conv1 = tnn.Conv2d(cin, cout, 3, padding=1)
        self.time_emb_proj = tnn.Linear(temb_dim, cout)
        self.norm2 = tnn.GroupNorm(groups, cout, eps=eps)
        self.conv2 = tnn.Conv2d(cout, cout, 3, padding=1)
        self.conv_shortcut = tnn.Conv2d(cin, cout, 1) if cin != cout else None

    def forward(self, x, temb):
        h = self.conv1(F.silu(self.norm1(x)))
        h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        skip = self.conv_shortcut(x) if self.conv_shortcut is not None else x
        return h + skip


class Attn(tnn.Module):
    def __init__(self, dim, heads, context_dim=None):
        super().__init__()
        self.heads = heads
        ctx = context_dim or dim
        self.to_q = tnn.Linear(dim, dim, bias=False)
        self.to_k = tnn.Linear(ctx, dim, bias=False)
        self.to_v = tnn.Linear(ctx, dim, bias=False)
        self.to_out = tnn.ModuleList([tnn.Linear(dim, dim)])

    def forward(self, x, context=None):
        context = x if context is None else context
        B, N, C = x.shape
        h = self.heads
        q = self.to_q(x).view(B, N, h, C // h).transpose(1, 2)
        k = self.to_k(context).view(B, context.shape[1], h, C // h).transpose(1, 2)
        v = self.to_v(context).view(B, context.shape[1], h, C // h).transpose(1, 2)
        attn = (q @ k.transpose(-1, -2)) / math.sqrt(C // h)
        out = attn.softmax(dim=-1) @ v
        out = out.transpose(1, 2).reshape(B, N, C)
        return self.to_out[0](out)


class GEGLU(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.proj = tnn.Linear(dim, dim * 8)

    def forward(self, x):
        h, gate = self.proj(x).chunk(2, dim=-1)
        return h * F.gelu(gate)


class BasicBlock(tnn.Module):
    def __init__(self, dim, heads, context_dim):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim)
        self.attn1 = Attn(dim, heads)
        self.norm2 = tnn.LayerNorm(dim)
        self.attn2 = Attn(dim, heads, context_dim)
        self.norm3 = tnn.LayerNorm(dim)
        self.ff = tnn.ModuleDict({"net": tnn.ModuleList(
            [GEGLU(dim), tnn.Identity(), tnn.Linear(dim * 4, dim)])})

    def forward(self, x, ctx):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), ctx)
        x = x + self.ff["net"][2](self.ff["net"][0](self.norm3(x)))
        return x


class Transformer2D(tnn.Module):
    def __init__(self, dim, heads, context_dim, groups_norm=32):
        super().__init__()
        self.norm = tnn.GroupNorm(groups_norm, dim, eps=1e-6)
        self.proj_in = tnn.Conv2d(dim, dim, 1)
        self.transformer_blocks = tnn.ModuleList([BasicBlock(dim, heads, context_dim)])
        self.proj_out = tnn.Conv2d(dim, dim, 1)

    def forward(self, x, ctx):
        B, C, H, W = x.shape
        res = x
        h = self.proj_in(self.norm(x))
        h = h.permute(0, 2, 3, 1).reshape(B, H * W, C)
        h = self.transformer_blocks[0](h, ctx)
        h = h.reshape(B, H, W, C).permute(0, 3, 1, 2)
        return self.proj_out(h) + res


class TorchSDUNetRef(tnn.Module):
    """diffusers UNet2DConditionModel (SD v1 layout), state dict renamed
    to checkpoint keys by ``diffusers_state_dict``."""

    def __init__(self, cfg: UNet2DConditionConfig):
        super().__init__()
        self.cfg = cfg
        ch = cfg.block_out_channels
        temb = ch[0] * 4
        heads = cfg.num_attention_heads
        g = cfg.norm_num_groups
        self.time_embedding = tnn.ModuleDict({
            "linear_1": tnn.Linear(ch[0], temb), "linear_2": tnn.Linear(temb, temb)})
        self.conv_in = tnn.Conv2d(cfg.in_channels, ch[0], 3, padding=1)

        self.down_res, self.down_attn, self.downsamplers = tnn.ModuleList(), tnn.ModuleList(), tnn.ModuleList()
        skip_ch = [ch[0]]
        cur = ch[0]
        for i, btype in enumerate(cfg.down_block_types):
            res, attn = tnn.ModuleList(), tnn.ModuleList()
            for j in range(cfg.layers_per_block):
                res.append(ResnetBlock(cur, ch[i], temb, g, cfg.norm_eps))
                cur = ch[i]
                if btype == "CrossAttnDownBlock2D":
                    attn.append(Transformer2D(cur, heads, cfg.cross_attention_dim, g))
                skip_ch.append(cur)
            self.down_res.append(res)
            self.down_attn.append(attn)
            if i != len(ch) - 1:
                self.downsamplers.append(tnn.Conv2d(cur, cur, 3, stride=2, padding=1))
                skip_ch.append(cur)

        self.mid_res0 = ResnetBlock(cur, cur, temb, g, cfg.norm_eps)
        self.mid_attn = Transformer2D(cur, heads, cfg.cross_attention_dim, g)
        self.mid_res1 = ResnetBlock(cur, cur, temb, g, cfg.norm_eps)

        rev = tuple(reversed(ch))
        self.up_res, self.up_attn, self.upsamplers = tnn.ModuleList(), tnn.ModuleList(), tnn.ModuleList()
        for i, btype in enumerate(cfg.up_block_types):
            res, attn = tnn.ModuleList(), tnn.ModuleList()
            for j in range(cfg.layers_per_block + 1):
                res.append(ResnetBlock(cur + skip_ch.pop(), rev[i], temb, g, cfg.norm_eps))
                cur = rev[i]
                if btype == "CrossAttnUpBlock2D":
                    attn.append(Transformer2D(cur, heads, cfg.cross_attention_dim, g))
            self.up_res.append(res)
            self.up_attn.append(attn)
            if i != len(ch) - 1:
                self.upsamplers.append(tnn.Conv2d(cur, cur, 3, padding=1))

        self.conv_norm_out = tnn.GroupNorm(g, cur, eps=cfg.norm_eps)
        self.conv_out = tnn.Conv2d(cur, cfg.out_channels, 3, padding=1)

    def forward(self, x, t, ctx):
        cfg = self.cfg
        temb = timestep_embedding(t, cfg.block_out_channels[0],
                                  cfg.flip_sin_to_cos, float(cfg.freq_shift))
        temb = self.time_embedding["linear_2"](F.silu(self.time_embedding["linear_1"](temb)))
        h = self.conv_in(x)
        skips = [h]
        for i in range(len(cfg.down_block_types)):
            attns = list(self.down_attn[i])
            for j, r in enumerate(self.down_res[i]):
                h = r(h, temb)
                if attns:
                    h = attns[j](h, ctx)
                skips.append(h)
            if i != len(cfg.block_out_channels) - 1:
                h = self.downsamplers[i](h)
                skips.append(h)
        h = self.mid_res1(self.mid_attn(self.mid_res0(h, temb), ctx), temb)
        for i in range(len(cfg.up_block_types)):
            attns = list(self.up_attn[i])
            for j, r in enumerate(self.up_res[i]):
                h = r(torch.cat([h, skips.pop()], dim=1), temb)
                if attns:
                    h = attns[j](h, ctx)
            if i != len(cfg.block_out_channels) - 1:
                h = self.upsamplers[i](F.interpolate(h, scale_factor=2, mode="nearest"))
        return self.conv_out(F.silu(self.conv_norm_out(h)))

    def diffusers_state_dict(self):
        import re

        ren = {}
        for k, v in self.state_dict().items():
            nk = k
            nk = re.sub(r"^down_res\.(\d+)\.", r"down_blocks.\1.resnets.", nk)
            nk = re.sub(r"^down_attn\.(\d+)\.", r"down_blocks.\1.attentions.", nk)
            nk = re.sub(r"^downsamplers\.(\d+)\.", r"down_blocks.\1.downsamplers.0.conv.", nk)
            nk = re.sub(r"^up_res\.(\d+)\.", r"up_blocks.\1.resnets.", nk)
            nk = re.sub(r"^up_attn\.(\d+)\.", r"up_blocks.\1.attentions.", nk)
            nk = re.sub(r"^upsamplers\.(\d+)\.", r"up_blocks.\1.upsamplers.0.conv.", nk)
            nk = nk.replace("mid_res0.", "mid_block.resnets.0.")
            nk = nk.replace("mid_res1.", "mid_block.resnets.1.")
            nk = nk.replace("mid_attn.", "mid_block.attentions.0.")
            nk = nk.replace(".ff.net.0.proj.", ".ff.net.0.proj.")
            ren[nk] = v.numpy()
        return ren


def _run_parity(cfg: UNet2DConditionConfig, rtol, atol):
    torch.manual_seed(0)
    tmodel = TorchSDUNetRef(cfg).eval()
    sd = tmodel.diffusers_state_dict()
    assert any(".transformer_blocks.0.attn2.to_k.weight" in k for k in sd)
    assert any(".ff.net.0.proj.weight" in k for k in sd)
    assert any(".to_out.0.bias" in k for k in sd)

    fmodel = UNet2DCondition(cfg)
    template = fmodel.init_params(jax.random.PRNGKey(0), context_len=77)
    params = convert_sd_unet(sd, template)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, cfg.in_channels, cfg.sample_size, cfg.sample_size)).astype(np.float32)
    t = np.array([999], np.int64)
    ctx = rng.normal(size=(1, 77, cfg.cross_attention_dim)).astype(np.float32)
    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(ctx)).numpy()
    f_out = jax.jit(lambda p, xx, tt, cc: fmodel.apply({"params": p}, xx, tt, cc))(
        params, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t), jnp.asarray(ctx))
    np.testing.assert_allclose(np.asarray(f_out).transpose(0, 3, 1, 2), t_out,
                               rtol=rtol, atol=atol)


def test_sd_arch_narrow_golden():
    """Fast tier: the full SD v1 BLOCK structure (4 levels, 3 cross-attn
    levels, conv proj_in/out, GEGLU) at 16×16 latents with narrow
    channels."""
    cfg = UNet2DConditionConfig(
        sample_size=16, block_out_channels=(32, 64, 96, 96),
        num_attention_heads=4, cross_attention_dim=48, norm_num_groups=16,
    )
    _run_parity(cfg, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_sd_converter_golden_full_size():
    """Slow tier: the REAL 860M-param SD v1 config at 64×64 latents through
    convert_sd_unet — the strongest offline proof the SD-1.4 checkpoint
    will load correctly (``delete_sd.py:459-468``)."""
    _run_parity(UNet2DConditionConfig.sd_v1(), rtol=5e-4, atol=5e-4)
