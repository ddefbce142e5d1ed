"""Unconditional 2D UNet (epsilon model) — flax.linen, NHWC, bf16-ready.

Architecture-compatible with diffusers ``UNet2DModel`` (the reference's
substrate for the MNIST t-shirt model, ``config/train_tshirt_mnist.yaml:25-41``,
and the ``google/ddpm-celebahq-256`` pipeline, ``delete_celeb.py:181-186``)
so HF checkpoints convert weight-for-weight, but written TPU-first: NHWC
layout, static shapes, attention as MXU-shaped einsums, and a ``dtype``
knob for bf16 activations with fp32 params.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from siss_tpu.models.layers import (
    Downsample2D,
    ResnetBlock2D,
    SpatialAttention,
    TimestepEmbedding,
    Upsample2D,
    get_timestep_embedding,
)


@dataclasses.dataclass(frozen=True)
class UNet2DConfig:
    """Static architecture description (mirrors the diffusers config keys the
    reference uses, with TPU-native defaults)."""

    sample_size: int = 28
    in_channels: int = 1
    out_channels: int = 1
    block_out_channels: Tuple[int, ...] = (64, 128, 256)
    down_block_types: Tuple[str, ...] = ("DownBlock2D", "AttnDownBlock2D", "DownBlock2D")
    up_block_types: Tuple[str, ...] = ("UpBlock2D", "AttnUpBlock2D", "UpBlock2D")
    layers_per_block: int = 2
    attention_head_dim: Optional[int] = 8  # None → single head over all channels
    norm_num_groups: int = 32
    norm_eps: float = 1e-6
    dropout: float = 0.0
    flip_sin_to_cos: bool = True
    freq_shift: int = 0
    downsample_padding: int = 1
    mid_block_scale_factor: float = 1.0
    add_mid_attention: bool = True

    @classmethod
    def mnist_tshirt(cls) -> "UNet2DConfig":
        """Tiny MNIST UNet (``config/train_tshirt_mnist.yaml:25-41``)."""
        return cls()

    @classmethod
    def celebahq_256(cls) -> "UNet2DConfig":
        """google/ddpm-celebahq-256 architecture (the flagship unlearning
        model, loaded at ``delete_celeb.py:181-186``)."""
        return cls(
            sample_size=256,
            in_channels=3,
            out_channels=3,
            block_out_channels=(128, 128, 256, 256, 512, 512),
            down_block_types=(
                "DownBlock2D", "DownBlock2D", "DownBlock2D",
                "DownBlock2D", "AttnDownBlock2D", "DownBlock2D",
            ),
            up_block_types=(
                "UpBlock2D", "AttnUpBlock2D", "UpBlock2D",
                "UpBlock2D", "UpBlock2D", "UpBlock2D",
            ),
            attention_head_dim=None,
            flip_sin_to_cos=False,
            freq_shift=1,
            downsample_padding=0,
        )


def _num_heads(channels: int, head_dim: Optional[int]) -> int:
    if head_dim is None:
        return 1
    return max(channels // head_dim, 1)


class UNet2D(nn.Module):
    """ε-prediction UNet. Call: ``model.apply({'params': p}, x_nhwc, t) -> eps``."""

    config: UNet2DConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sample: jax.Array, timesteps: jax.Array, deterministic: bool = True) -> jax.Array:
        cfg = self.config
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))

        # Time embedding.
        t_emb = get_timestep_embedding(
            timesteps, cfg.block_out_channels[0],
            flip_sin_to_cos=cfg.flip_sin_to_cos,
            downscale_freq_shift=float(cfg.freq_shift),
        ).astype(self.dtype)
        emb = TimestepEmbedding(cfg.block_out_channels[0] * 4, dtype=self.dtype, name="time_embedding")(t_emb)

        # Input conv.
        h = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv_in")(sample.astype(self.dtype))

        # Down path.
        skips = [h]
        for i, block_type in enumerate(cfg.down_block_types):
            out_ch = cfg.block_out_channels[i]
            is_final = i == len(cfg.block_out_channels) - 1
            with_attn = block_type == "AttnDownBlock2D"
            for j in range(cfg.layers_per_block):
                h = ResnetBlock2D(
                    out_ch, dropout=cfg.dropout, groups=cfg.norm_num_groups, eps=cfg.norm_eps,
                    dtype=self.dtype, name=f"down_blocks_{i}_resnets_{j}",
                )(h, emb, deterministic)
                if with_attn:
                    h = SpatialAttention(
                        out_ch, num_heads=_num_heads(out_ch, cfg.attention_head_dim),
                        groups=cfg.norm_num_groups, eps=cfg.norm_eps,
                        dtype=self.dtype, name=f"down_blocks_{i}_attentions_{j}",
                    )(h)
                skips.append(h)
            if not is_final:
                h = Downsample2D(out_ch, padding=cfg.downsample_padding, dtype=self.dtype, name=f"down_blocks_{i}_downsamplers_0")(h)
                skips.append(h)

        # Mid block: resnet → attention → resnet.
        mid_ch = cfg.block_out_channels[-1]
        h = ResnetBlock2D(
            mid_ch, dropout=cfg.dropout, groups=cfg.norm_num_groups, eps=cfg.norm_eps,
            output_scale_factor=cfg.mid_block_scale_factor, dtype=self.dtype, name="mid_block_resnets_0",
        )(h, emb, deterministic)
        if cfg.add_mid_attention:
            h = SpatialAttention(
                mid_ch, num_heads=_num_heads(mid_ch, cfg.attention_head_dim),
                groups=cfg.norm_num_groups, eps=cfg.norm_eps,
                rescale_output_factor=cfg.mid_block_scale_factor,
                dtype=self.dtype, name="mid_block_attentions_0",
            )(h)
        h = ResnetBlock2D(
            mid_ch, dropout=cfg.dropout, groups=cfg.norm_num_groups, eps=cfg.norm_eps,
            output_scale_factor=cfg.mid_block_scale_factor, dtype=self.dtype, name="mid_block_resnets_1",
        )(h, emb, deterministic)

        # Up path (skip-concat order [current, skip] matches the conversion
        # map in utils/hf_convert.py).
        reversed_channels = tuple(reversed(cfg.block_out_channels))
        for i, block_type in enumerate(cfg.up_block_types):
            out_ch = reversed_channels[i]
            is_final = i == len(cfg.block_out_channels) - 1
            with_attn = block_type == "AttnUpBlock2D"
            for j in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = ResnetBlock2D(
                    out_ch, dropout=cfg.dropout, groups=cfg.norm_num_groups, eps=cfg.norm_eps,
                    dtype=self.dtype, name=f"up_blocks_{i}_resnets_{j}",
                )(h, emb, deterministic)
                if with_attn:
                    h = SpatialAttention(
                        out_ch, num_heads=_num_heads(out_ch, cfg.attention_head_dim),
                        groups=cfg.norm_num_groups, eps=cfg.norm_eps,
                        dtype=self.dtype, name=f"up_blocks_{i}_attentions_{j}",
                    )(h)
            if not is_final:
                h = Upsample2D(out_ch, dtype=self.dtype, name=f"up_blocks_{i}_upsamplers_0")(h)

        # Output head.
        h = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=cfg.norm_eps, dtype=self.dtype, name="conv_norm_out")(h)
        h = nn.silu(h)
        h = nn.Conv(cfg.out_channels, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv_out")(h)
        return h.astype(jnp.float32)

    def init_params(self, key: jax.Array, batch_size: int = 1):
        cfg = self.config
        x = jnp.zeros((batch_size, cfg.sample_size, cfg.sample_size, cfg.in_channels), self.dtype)
        t = jnp.zeros((batch_size,), jnp.int32)
        return self.init(key, x, t)["params"]
