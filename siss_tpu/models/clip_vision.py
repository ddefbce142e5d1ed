"""CLIP vision tower (ViT) — flax.linen, for CLIP-IQA and CLIP-score
style metrics. HF-layout compatible (openai/clip-vit-large-patch14
vision_model + visual_projection) for weight import.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import linen as nn

from siss_tpu.models.clip_text import CLIPEncoderLayer, CLIPTextConfig


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    projection_dim: int = 768
    layer_norm_eps: float = 1e-5

    @classmethod
    def vit_l14(cls) -> "CLIPVisionConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "CLIPVisionConfig":
        return cls(image_size=32, patch_size=8, hidden_size=32, num_layers=2,
                   num_heads=4, intermediate_size=64, projection_dim=16)

    def as_text_cfg(self) -> CLIPTextConfig:
        n_pos = (self.image_size // self.patch_size) ** 2 + 1
        return CLIPTextConfig(
            vocab_size=1, hidden_size=self.hidden_size, num_layers=self.num_layers,
            num_heads=self.num_heads, intermediate_size=self.intermediate_size,
            max_position_embeddings=n_pos, layer_norm_eps=self.layer_norm_eps,
        )


class CLIPVisionModel(nn.Module):
    config: CLIPVisionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: jax.Array) -> jax.Array:
        """pixel_values: [B, H, W, 3] CLIP-normalized → projected pooled
        embedding [B, projection_dim]."""
        c = self.config
        B = pixel_values.shape[0]
        patches = nn.Conv(c.hidden_size, (c.patch_size, c.patch_size),
                          strides=(c.patch_size, c.patch_size), use_bias=False,
                          dtype=self.dtype, name="patch_embedding")(pixel_values.astype(self.dtype))
        patches = patches.reshape(B, -1, c.hidden_size)
        cls_tok = self.param("class_embedding", nn.initializers.normal(0.02), (c.hidden_size,))
        x = jnp.concatenate([jnp.broadcast_to(cls_tok, (B, 1, c.hidden_size)).astype(self.dtype), patches], axis=1)
        n_pos = x.shape[1]
        pos = nn.Embed(n_pos, c.hidden_size, dtype=self.dtype, name="position_embedding")(jnp.arange(n_pos)[None])
        x = x + pos
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="pre_layrnorm")(x)
        text_cfg = c.as_text_cfg()
        no_mask = jnp.zeros((1, 1, n_pos, n_pos), jnp.float32)
        for i in range(c.num_layers):
            x = CLIPEncoderLayer(text_cfg, dtype=self.dtype, name=f"layers_{i}")(x, no_mask)
        pooled = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="post_layernorm")(x[:, 0])
        return nn.Dense(c.projection_dim, use_bias=False, dtype=self.dtype, name="visual_projection")(pooled)

    def init_params(self, key: jax.Array):
        x = jnp.zeros((1, self.config.image_size, self.config.image_size, 3), self.dtype)
        return self.init(key, x)["params"]
