"""AutoencoderKL (Stable Diffusion VAE) — flax.linen, NHWC.

The frozen latent codec of the reference's SD task: encode with
``latent_dist.sample() × scaling_factor`` on both keep/forget batches
(``delete_sd.py:879-888``), decode for validation sampling. Architecture-
compatible with diffusers ``AutoencoderKL`` (SD v1 config) for weight
import. The encoder returns the diagonal-Gaussian moments; sampling is a
pure function over an explicit PRNG key.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from siss_tpu.models.layers import ResnetBlock2D, SpatialAttention, Upsample2D


@dataclasses.dataclass(frozen=True)
class AutoencoderKLConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215

    @classmethod
    def sd_v1(cls) -> "AutoencoderKLConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "AutoencoderKLConfig":
        return cls(block_out_channels=(16, 32), layers_per_block=1, norm_num_groups=8,
                   latent_channels=4)


class Encoder(nn.Module):
    config: AutoencoderKLConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.config
        h = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv_in")(x.astype(self.dtype))
        for i, out_ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                h = ResnetBlock2D(out_ch, groups=cfg.norm_num_groups,
                                  dtype=self.dtype, name=f"down_blocks_{i}_resnets_{j}")(h, None)
            if i < len(cfg.block_out_channels) - 1:
                # diffusers VAE Downsample2D uses asymmetric (0,1,0,1) pad
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(out_ch, (3, 3), strides=(2, 2), padding="VALID",
                            dtype=self.dtype, name=f"down_blocks_{i}_downsamplers_0_conv")(h)
        mid = cfg.block_out_channels[-1]
        h = ResnetBlock2D(mid, groups=cfg.norm_num_groups, dtype=self.dtype, name="mid_block_resnets_0")(h, None)
        h = SpatialAttention(mid, num_heads=1, groups=cfg.norm_num_groups,
                             dtype=self.dtype, name="mid_block_attentions_0")(h)
        h = ResnetBlock2D(mid, groups=cfg.norm_num_groups, dtype=self.dtype, name="mid_block_resnets_1")(h, None)
        h = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-6, dtype=self.dtype, name="conv_norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(2 * cfg.latent_channels, (3, 3), padding=((1, 1), (1, 1)),
                       dtype=self.dtype, name="conv_out")(h)


class Decoder(nn.Module):
    config: AutoencoderKLConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        cfg = self.config
        reversed_ch = tuple(reversed(cfg.block_out_channels))
        mid = reversed_ch[0]
        h = nn.Conv(mid, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv_in")(z.astype(self.dtype))
        h = ResnetBlock2D(mid, groups=cfg.norm_num_groups, dtype=self.dtype, name="mid_block_resnets_0")(h, None)
        h = SpatialAttention(mid, num_heads=1, groups=cfg.norm_num_groups,
                             dtype=self.dtype, name="mid_block_attentions_0")(h)
        h = ResnetBlock2D(mid, groups=cfg.norm_num_groups, dtype=self.dtype, name="mid_block_resnets_1")(h, None)
        for i, out_ch in enumerate(reversed_ch):
            for j in range(cfg.layers_per_block + 1):
                h = ResnetBlock2D(out_ch, groups=cfg.norm_num_groups,
                                  dtype=self.dtype, name=f"up_blocks_{i}_resnets_{j}")(h, None)
            if i < len(reversed_ch) - 1:
                h = Upsample2D(out_ch, dtype=self.dtype, name=f"up_blocks_{i}_upsamplers_0")(h)
        h = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-6, dtype=self.dtype, name="conv_norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(cfg.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                       dtype=self.dtype, name="conv_out")(h)


class AutoencoderKL(nn.Module):
    config: AutoencoderKLConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.config, self.dtype)
        self.decoder = Decoder(self.config, self.dtype)
        self.quant_conv = nn.Conv(2 * self.config.latent_channels, (1, 1), dtype=self.dtype)
        self.post_quant_conv = nn.Conv(self.config.latent_channels, (1, 1), dtype=self.dtype)

    def encode_moments(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """→ (mean, logvar) of the diagonal Gaussian latent posterior."""
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def encode_sample(self, x: jax.Array, key: jax.Array) -> jax.Array:
        """``latent_dist.sample() × scaling_factor`` (``delete_sd.py:879-888``)."""
        mean, logvar = self.encode_moments(x)
        z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(key, mean.shape, dtype=mean.dtype)
        return z * self.config.scaling_factor

    def decode(self, z: jax.Array) -> jax.Array:
        z = z / self.config.scaling_factor
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x: jax.Array, key: jax.Array) -> jax.Array:
        return self.decode(self.encode_sample(x, key))

    def init_params(self, key: jax.Array, image_size: int = 64):
        x = jnp.zeros((1, image_size, image_size, self.config.in_channels), self.dtype)
        return self.init(key, x, jax.random.PRNGKey(0))["params"]
