"""Text-conditional UNet (Stable Diffusion 1.x) — flax.linen, NHWC.

Architecture-compatible with diffusers ``UNet2DConditionModel`` as used by
the reference's SD unlearning task (``delete_sd.py:459-468``): cross-
attention Transformer2D blocks (self-attn → text cross-attn → GEGLU FF)
interleaved with resnets. TPU-first: NHWC, fused QKV-shaped einsums on the
MXU, bf16 activations, and optional ``jax.checkpoint`` rematerialisation
applied per down/mid/up block (the reference's
``unet.enable_gradient_checkpointing()``, ``delete_sd.py:538-539``).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from siss_tpu.models.layers import (
    Downsample2D,
    ResnetBlock2D,
    TimestepEmbedding,
    Upsample2D,
    get_timestep_embedding,
)


@dataclasses.dataclass(frozen=True)
class UNet2DConditionConfig:
    sample_size: int = 64
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    down_block_types: Tuple[str, ...] = (
        "CrossAttnDownBlock2D", "CrossAttnDownBlock2D", "CrossAttnDownBlock2D", "DownBlock2D",
    )
    up_block_types: Tuple[str, ...] = (
        "UpBlock2D", "CrossAttnUpBlock2D", "CrossAttnUpBlock2D", "CrossAttnUpBlock2D",
    )
    layers_per_block: int = 2
    num_attention_heads: int = 8        # SD v1: 8 heads in every block
    cross_attention_dim: int = 768
    norm_num_groups: int = 32
    norm_eps: float = 1e-5
    flip_sin_to_cos: bool = True
    freq_shift: int = 0
    gradient_checkpointing: bool = False
    # Attention implementation: "einsum" (materialized fp32 logits),
    # "einsum_remat" (einsum math, but the QK→softmax→AV core of the
    # 4096/1024-token self-attentions is jax.checkpoint'ed so only bf16
    # q/k/v are saved for backward — O(N²)→O(N·d) residuals at full MXU
    # efficiency), "flash" (Pallas TPU flash-attention kernel, O(N)
    # memory), or "auto" (flash for long self-attention on TPU, einsum
    # otherwise). The 4096- and 1024-token self-attentions dominate the
    # SD step's HBM traffic when materialized (512 MB of fp32 logits per
    # forward at 64×64 latents).
    attention_impl: str = "auto"
    # Feed-forward implementation: "saved" (default — the GEGLU
    # projection/gate activations stay in the saved set) or "remat"
    # (nn.remat the FF submodule: only its LayerNorm'd input — already a
    # saved residual — is kept; the [B, N, 2·4·dim] GEGLU projection and
    # [B, N, 4·dim] gated activation are recomputed in backward). With
    # attention_impl=einsum_remat these wide per-token temps are the
    # binding allocation past microbatch 4 (BASELINE.md round-5 SD
    # section); identical math, ~one extra FF forward per backward.
    ff_impl: str = "saved"
    # With gradient_checkpointing, also remat the Transformer2D blocks
    # (True = the reference's blanket ``enable_gradient_checkpointing``).
    # False remats only the resnets — with flash attention the transformer
    # residuals are small, and skipping their remat avoids recomputing
    # every attention forward in the backward pass.
    remat_attention: bool = True
    # Selective rematerialisation policy for the checkpointed blocks:
    # None = recompute everything (the reference's blanket behavior);
    # "dots" = save matmul/conv outputs, recompute only the cheap
    # elementwise/norm chains (jax.checkpoint_policies.checkpoint_dots) —
    # trades a little activation memory for skipping the expensive MXU ops
    # in the recompute pass. Identical math either way.
    remat_policy: Optional[str] = None

    @classmethod
    def sd_v1(cls, gradient_checkpointing: bool = False, **kw) -> "UNet2DConditionConfig":
        return cls(gradient_checkpointing=gradient_checkpointing, **kw)

    @classmethod
    def tiny(cls) -> "UNet2DConditionConfig":
        """Small config for tests/dryruns."""
        return cls(
            sample_size=8, block_out_channels=(32, 64),
            down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
            up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
            layers_per_block=1, num_attention_heads=4, cross_attention_dim=32,
            norm_num_groups=8,
        )


class CrossAttention(nn.Module):
    """diffusers ``Attention``: LN'd query from x, key/value from context
    (or x for self-attention); heads × head_dim = channels."""

    query_dim: int
    heads: int
    dim_head: int
    context_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32
    impl: str = "auto"  # "einsum" | "einsum_remat" | "flash" | "auto"

    _IMPLS = ("auto", "einsum", "einsum_remat", "flash")

    def _use_flash(self, is_self: bool, n_q: int) -> bool:
        if self.impl not in self._IMPLS:
            # a typo'd impl would otherwise silently fall through to the
            # plain-einsum branch (no flash, no remat) — fail at trace time
            raise ValueError(f"Unknown attention impl {self.impl!r}; "
                             f"expected one of {self._IMPLS}")
        # kernel-compatible sites only: self-attention, seq a multiple of
        # the 128 block, head_dim within one 128-lane register tile.
        # Cross-attention's 77-token kv side always stays einsum: its
        # logits are tiny and the kernel doesn't block ragged kv.
        compatible = is_self and n_q % 128 == 0 and self.dim_head <= 128
        if self.impl == "flash":
            return compatible
        if self.impl != "auto":
            return False
        # auto: flash only where it pays. Measured on v5e at the SD-1.x
        # shapes (BASELINE.md round-4 SD table): with head_dim 40/80 the
        # kernel pads the lane dimension to 128 and every QK/AV matmul
        # wastes 1.6-3.2x of the MXU — einsum logits (bf16 in, fp32 MXU
        # accumulate) beat it at every batch size that fits (9.9 vs 6.7
        # img/s at bs1x16). Flash only wins when heads fill the 128-lane
        # tile, so auto requires dim_head % 128 == 0; pass
        # attention_impl="flash" to force the O(N)-memory kernel anyway.
        return (compatible and n_q >= 512 and self.dim_head % 128 == 0
                and jax.default_backend() == "tpu")

    @nn.compact
    def __call__(self, x: jax.Array, context: Optional[jax.Array] = None) -> jax.Array:
        is_self = context is None
        context = x if context is None else context
        inner = self.heads * self.dim_head
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(context)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(context)
        B, Nq, _ = q.shape
        Nk = k.shape[1]

        def split(a, n):
            return a.reshape(B, n, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = split(q, Nq), split(k, Nk), split(v, Nk)
        scale = 1.0 / math.sqrt(self.dim_head)
        if self._use_flash(is_self, Nq):
            from jax.experimental.pallas.ops.tpu.flash_attention import flash_attention

            out = flash_attention(q, k, v, sm_scale=scale)
        else:
            def core(q, k, v):
                attn = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
                attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
                return jnp.einsum("bhqk,bhkd->bhqd", attn, v)

            if self.impl == "einsum_remat" and is_self and Nq >= 1024:
                # Surgical remat of just the QK→softmax→AV core: save the
                # O(N·d) bf16 q/k/v instead of the O(N²) fp32 softmax
                # residuals (512 MB/layer at 64×64 latents), recompute the
                # logits in backward. Unlike blanket block remat this keeps
                # every resnet/dense activation saved — only the two
                # attention einsums re-run. Applied at the 4096/1024-token
                # self-attention levels where the logits dominate; the
                # 77-token cross-attention and 256-token sites stay saved.
                core = jax.checkpoint(core)
            out = core(q, k, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, Nq, inner)
        return nn.Dense(self.query_dim, dtype=self.dtype, name="to_out")(out)


class GEGLUFeedForward(nn.Module):
    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        inner = self.dim * self.mult
        h = nn.Dense(inner * 2, dtype=self.dtype, name="geglu_proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * nn.gelu(gate, approximate=False)  # diffusers GEGLU uses exact erf gelu
        return nn.Dense(self.dim, dtype=self.dtype, name="out_proj")(h)


class BasicTransformerBlock(nn.Module):
    dim: int
    heads: int
    dim_head: int
    context_dim: int
    dtype: jnp.dtype = jnp.float32
    attention_impl: str = "auto"
    ff_impl: str = "saved"  # "saved" | "remat" — see UNet2DConditionConfig.ff_impl

    @nn.compact
    def __call__(self, x: jax.Array, context: jax.Array) -> jax.Array:
        if self.ff_impl not in ("saved", "remat"):
            raise ValueError(f"Unknown ff impl {self.ff_impl!r}; expected 'saved' or 'remat'")
        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        x = x + CrossAttention(self.dim, self.heads, self.dim_head, dtype=self.dtype,
                               impl=self.attention_impl, name="attn1")(h)
        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        x = x + CrossAttention(self.dim, self.heads, self.dim_head, self.context_dim,
                               dtype=self.dtype, impl=self.attention_impl, name="attn2")(h, context)
        h = nn.LayerNorm(dtype=self.dtype, name="norm3")(x)
        FF = (nn.remat(GEGLUFeedForward, prevent_cse=False)
              if self.ff_impl == "remat" else GEGLUFeedForward)
        x = x + FF(self.dim, dtype=self.dtype, name="ff")(h)
        return x


class Transformer2D(nn.Module):
    """GroupNorm → 1×1 proj_in → transformer block(s) → 1×1 proj_out + skip."""

    channels: int
    heads: int
    context_dim: int
    depth: int = 1
    groups: int = 32
    dtype: jnp.dtype = jnp.float32
    attention_impl: str = "auto"
    ff_impl: str = "saved"

    @nn.compact
    def __call__(self, x: jax.Array, context: jax.Array) -> jax.Array:
        B, H, W, C = x.shape
        residual = x
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        h = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="proj_in")(h)
        h = h.reshape(B, H * W, self.channels)
        for d in range(self.depth):
            h = BasicTransformerBlock(
                self.channels, self.heads, self.channels // self.heads, self.context_dim,
                dtype=self.dtype, attention_impl=self.attention_impl,
                ff_impl=self.ff_impl,
                name=f"transformer_blocks_{d}",
            )(h, context)
        h = h.reshape(B, H, W, self.channels)
        h = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="proj_out")(h)
        return h + residual


class UNet2DCondition(nn.Module):
    """Call: ``model.apply({'params': p}, latents_nhwc, t, encoder_hidden_states)``."""

    config: UNet2DConditionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sample: jax.Array, timesteps: jax.Array,
                 encoder_hidden_states: jax.Array) -> jax.Array:
        cfg = self.config
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))
        context = encoder_hidden_states.astype(self.dtype)

        t_emb = get_timestep_embedding(
            timesteps, cfg.block_out_channels[0],
            flip_sin_to_cos=cfg.flip_sin_to_cos,
            downscale_freq_shift=float(cfg.freq_shift),
        ).astype(self.dtype)
        emb = TimestepEmbedding(cfg.block_out_channels[0] * 4, dtype=self.dtype, name="time_embedding")(t_emb)

        if cfg.gradient_checkpointing:
            policy = None
            if cfg.remat_policy == "dots":
                policy = jax.checkpoint_policies.checkpoint_dots
            elif cfg.remat_policy == "dots_no_batch":
                policy = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
            elif cfg.remat_policy is not None:
                raise ValueError(f"unknown remat_policy {cfg.remat_policy!r}")
            Res = nn.remat(ResnetBlock2D, prevent_cse=False, policy=policy)
            Trans = (nn.remat(Transformer2D, prevent_cse=False, policy=policy)
                     if cfg.remat_attention else Transformer2D)
        else:
            Res, Trans = ResnetBlock2D, Transformer2D

        h = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv_in")(sample.astype(self.dtype))

        skips = [h]
        for i, block_type in enumerate(cfg.down_block_types):
            out_ch = cfg.block_out_channels[i]
            is_final = i == len(cfg.block_out_channels) - 1
            with_attn = block_type == "CrossAttnDownBlock2D"
            for j in range(cfg.layers_per_block):
                h = Res(
                    out_ch, groups=cfg.norm_num_groups, eps=cfg.norm_eps,
                    dtype=self.dtype, name=f"down_blocks_{i}_resnets_{j}",
                )(h, emb)
                if with_attn:
                    h = Trans(
                        out_ch, cfg.num_attention_heads, cfg.cross_attention_dim,
                        groups=cfg.norm_num_groups, dtype=self.dtype,
                        attention_impl=cfg.attention_impl, ff_impl=cfg.ff_impl,
                        name=f"down_blocks_{i}_attentions_{j}",
                    )(h, context)
                skips.append(h)
            if not is_final:
                h = Downsample2D(out_ch, padding=1, dtype=self.dtype,
                                 name=f"down_blocks_{i}_downsamplers_0")(h)
                skips.append(h)

        mid_ch = cfg.block_out_channels[-1]
        h = Res(mid_ch, groups=cfg.norm_num_groups, eps=cfg.norm_eps,
                dtype=self.dtype, name="mid_block_resnets_0")(h, emb)
        h = Trans(mid_ch, cfg.num_attention_heads, cfg.cross_attention_dim,
                  groups=cfg.norm_num_groups, dtype=self.dtype,
                  attention_impl=cfg.attention_impl, ff_impl=cfg.ff_impl,
                  name="mid_block_attentions_0")(h, context)
        h = Res(mid_ch, groups=cfg.norm_num_groups, eps=cfg.norm_eps,
                dtype=self.dtype, name="mid_block_resnets_1")(h, emb)

        reversed_channels = tuple(reversed(cfg.block_out_channels))
        for i, block_type in enumerate(cfg.up_block_types):
            out_ch = reversed_channels[i]
            is_final = i == len(cfg.block_out_channels) - 1
            with_attn = block_type == "CrossAttnUpBlock2D"
            for j in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = Res(
                    out_ch, groups=cfg.norm_num_groups, eps=cfg.norm_eps,
                    dtype=self.dtype, name=f"up_blocks_{i}_resnets_{j}",
                )(h, emb)
                if with_attn:
                    h = Trans(
                        out_ch, cfg.num_attention_heads, cfg.cross_attention_dim,
                        groups=cfg.norm_num_groups, dtype=self.dtype,
                        attention_impl=cfg.attention_impl, ff_impl=cfg.ff_impl,
                        name=f"up_blocks_{i}_attentions_{j}",
                    )(h, context)
            if not is_final:
                h = Upsample2D(out_ch, dtype=self.dtype, name=f"up_blocks_{i}_upsamplers_0")(h)

        h = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=cfg.norm_eps,
                         dtype=self.dtype, name="conv_norm_out")(h)
        h = nn.silu(h)
        h = nn.Conv(cfg.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv_out")(h)
        return h.astype(jnp.float32)

    def init_params(self, key: jax.Array, batch_size: int = 1, context_len: int = 77):
        cfg = self.config
        x = jnp.zeros((batch_size, cfg.sample_size, cfg.sample_size, cfg.in_channels), self.dtype)
        t = jnp.zeros((batch_size,), jnp.int32)
        ctx = jnp.zeros((batch_size, context_len, cfg.cross_attention_dim), self.dtype)
        return self.init(key, x, t, ctx)["params"]
