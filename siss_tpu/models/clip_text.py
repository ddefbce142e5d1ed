"""CLIP text encoder (ViT-L/14 text tower) — flax.linen.

The frozen conditioning model of the reference's SD task
(``delete_sd.py:444-457``: ``CLIPTextModel`` producing
``encoder_hidden_states`` for the UNet, ``:937-944``). HF-layout-compatible
(openai/clip-vit-large-patch14 text_model) for weight import: token +
position embeddings, pre-LN transformer with causal mask, quick-GELU MLP,
final LayerNorm. Tokenisation uses HF ``CLIPTokenizer`` when vocab files
are available locally; tasks also accept precomputed prompt embeddings
(the reference's token-optimized ``.pt`` prompts, ``delete_sd.py:937-944``).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 77
    layer_norm_eps: float = 1e-5

    @classmethod
    def sd_v1(cls) -> "CLIPTextConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "CLIPTextConfig":
        return cls(vocab_size=1000, hidden_size=32, num_layers=2, num_heads=4,
                   intermediate_size=64, max_position_embeddings=16)


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPAttention(nn.Module):
    cfg: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, causal_mask: jax.Array) -> jax.Array:
        c = self.cfg
        head_dim = c.hidden_size // c.num_heads
        B, N, _ = x.shape
        q = nn.Dense(c.hidden_size, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(c.hidden_size, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(c.hidden_size, dtype=self.dtype, name="v_proj")(x)

        def split(a):
            return a.reshape(B, N, c.num_heads, head_dim).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        attn = attn / math.sqrt(head_dim) + causal_mask
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, c.hidden_size)
        return nn.Dense(c.hidden_size, dtype=self.dtype, name="out_proj")(out)


class CLIPEncoderLayer(nn.Module):
    cfg: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, causal_mask: jax.Array) -> jax.Array:
        c = self.cfg
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="layer_norm1")(x)
        x = x + CLIPAttention(c, dtype=self.dtype, name="self_attn")(h, causal_mask)
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="layer_norm2")(x)
        h = nn.Dense(c.intermediate_size, dtype=self.dtype, name="mlp_fc1")(h)
        h = quick_gelu(h)
        h = nn.Dense(c.hidden_size, dtype=self.dtype, name="mlp_fc2")(h)
        return x + h


class CLIPTextModel(nn.Module):
    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jax.Array) -> jax.Array:
        c = self.config
        B, N = input_ids.shape
        tok = nn.Embed(c.vocab_size, c.hidden_size, dtype=self.dtype, name="token_embedding")(input_ids)
        pos = nn.Embed(c.max_position_embeddings, c.hidden_size, dtype=self.dtype,
                       name="position_embedding")(jnp.arange(N)[None, :])
        x = tok + pos
        causal = jnp.triu(jnp.full((N, N), -1e9, jnp.float32), k=1)[None, None]
        for i in range(c.num_layers):
            x = CLIPEncoderLayer(c, dtype=self.dtype, name=f"layers_{i}")(x, causal)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="final_layer_norm")(x)

    def init_params(self, key: jax.Array):
        ids = jnp.zeros((1, self.config.max_position_embeddings), jnp.int32)
        return self.init(key, ids)["params"]


def load_clip_tokenizer(path_or_name: Optional[str] = None):
    """Native byte-level BPE tokenizer when local ``vocab.json``/
    ``merges.txt`` exist (every SD checkpoint's ``tokenizer/`` folder ships
    them); HF CLIPTokenizer as a fallback for hub-cached names; else None
    (tasks then require precomputed prompt embeddings)."""
    import os

    path = path_or_name or "openai/clip-vit-large-patch14"
    if (os.path.isfile(os.path.join(path, "vocab.json"))
            and os.path.isfile(os.path.join(path, "merges.txt"))):
        try:
            from siss_tpu.models.clip_bpe import load_native_clip_tokenizer

            return load_native_clip_tokenizer(path)
        except Exception as e:
            # malformed vocab files or a missing optional dep (`regex`)
            # must degrade to the HF / embeddings-only path, not abort the
            # task at startup (ADVICE r3)
            print(f"[clip] native tokenizer load failed ({e}); falling back")
    try:
        from transformers import CLIPTokenizer

        return CLIPTokenizer.from_pretrained(path, local_files_only=True)
    except Exception:
        return None
