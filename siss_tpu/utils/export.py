"""Flax params → HF-diffusers-format checkpoint export (inverse converters).

The reference's training bundles carry diffusers-loadable ``unet/``
(+``unet_ema/``) subfolders (``delete_celeb.py:137-147``,
``delete_sd.py:502-536``) so downstream torch tooling — sampling notebooks,
serving stacks, the diffusers pipelines themselves — can load an unlearned
model directly. siss_tpu's native artifact is an orbax pytree; this module
closes the interop loop in the other direction: export any trained flax
UNet/VAE back to a diffusers model directory
(``diffusion_pytorch_model.safetensors`` + ``config.json``) using modern
(≥0.18) parameter names.

The key map is the exact inverse of ``hf_convert``/``sd_convert`` (which
are golden-tested against torch implementations at full model size), so
``convert_*(export_diffusers_state_dict(p), template) == p`` bitwise —
pinned by ``tests/test_export_diffusers.py``.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict

import numpy as np

from siss_tpu.utils.sd_convert import _SUFFIX, _expand_block_names, _fix_ff


def export_diffusers_state_dict(params: Any) -> Dict[str, np.ndarray]:
    """Flax param pytree → diffusers-named numpy state dict.

    Covers both UNet families (UNet2D / UNet2DCondition) and the VAE: block
    paths are expanded with the same rules the importers use, GEGLU
    feed-forward leaves map back to ``ff.net.{0.proj,2}``, attention output
    projections to ``to_out.0``. Kernel layouts are transposed back to
    torch conventions (HWIO → OIHW convs, IO → OI linears); bfloat16 leaves
    are promoted to float32 (numpy/safetensors have no bf16).
    """
    import jax

    sd: Dict[str, np.ndarray] = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        names = tuple(str(getattr(p, "key", getattr(p, "name", None))) for p in path)
        parts = _expand_block_names(_fix_ff(names)[:-1])
        if parts and parts[-1] == "to_out":
            parts = parts + ["0"]
        key = ".".join(parts + [_SUFFIX[names[-1]]])
        arr = np.asarray(jax.device_get(leaf))
        if arr.dtype not in (np.float32, np.float16, np.float64):
            arr = arr.astype(np.float32)
        if names[-1] == "kernel":
            if arr.ndim == 4:      # HWIO → OIHW
                arr = arr.transpose(3, 2, 0, 1)
            elif arr.ndim == 2:    # IO → OI
                arr = arr.transpose(1, 0)
        if key in sd:
            raise ValueError(f"export key collision: {key} (from {'/'.join(names)})")
        # safetensors serializes the raw buffer: transposed views must be
        # materialized in C order or the stored values are scrambled.
        sd[key] = np.ascontiguousarray(arr)
    return sd


def unet2d_config_json(cfg) -> Dict[str, Any]:
    """``UNet2DConfig`` → the diffusers ``UNet2DModel`` config.json dict
    (field names per diffusers 0.27, the version the reference pins)."""
    return {
        "_class_name": "UNet2DModel",
        "_diffusers_version": "0.27.2",
        "sample_size": cfg.sample_size,
        "in_channels": cfg.in_channels,
        "out_channels": cfg.out_channels,
        "center_input_sample": False,
        "time_embedding_type": "positional",
        "freq_shift": cfg.freq_shift,
        "flip_sin_to_cos": cfg.flip_sin_to_cos,
        "down_block_types": list(cfg.down_block_types),
        "up_block_types": list(cfg.up_block_types),
        "block_out_channels": list(cfg.block_out_channels),
        "layers_per_block": cfg.layers_per_block,
        "mid_block_scale_factor": cfg.mid_block_scale_factor,
        "downsample_padding": cfg.downsample_padding,
        "downsample_type": "conv",
        "upsample_type": "conv",
        "dropout": cfg.dropout,
        "act_fn": "silu",
        "attention_head_dim": cfg.attention_head_dim,
        "norm_num_groups": cfg.norm_num_groups,
        "norm_eps": cfg.norm_eps,
        "resnet_time_scale_shift": "default",
        "add_attention": cfg.add_mid_attention,
    }


def sd_unet_config_json(cfg) -> Dict[str, Any]:
    """``UNet2DConditionConfig`` → the diffusers ``UNet2DConditionModel``
    config.json dict. Note diffusers' SD-v1 configs call the per-block head
    COUNT ``attention_head_dim`` (the historical naming quirk); our
    ``num_attention_heads`` maps onto it."""
    return {
        "_class_name": "UNet2DConditionModel",
        "_diffusers_version": "0.27.2",
        "sample_size": cfg.sample_size,
        "in_channels": cfg.in_channels,
        "out_channels": cfg.out_channels,
        "center_input_sample": False,
        "flip_sin_to_cos": cfg.flip_sin_to_cos,
        "freq_shift": cfg.freq_shift,
        "down_block_types": list(cfg.down_block_types),
        "mid_block_type": "UNetMidBlock2DCrossAttn",
        "up_block_types": list(cfg.up_block_types),
        "only_cross_attention": False,
        "block_out_channels": list(cfg.block_out_channels),
        "layers_per_block": cfg.layers_per_block,
        "downsample_padding": 1,
        "mid_block_scale_factor": 1,
        "act_fn": "silu",
        "norm_num_groups": cfg.norm_num_groups,
        "norm_eps": cfg.norm_eps,
        "cross_attention_dim": cfg.cross_attention_dim,
        "attention_head_dim": cfg.num_attention_heads,
        "use_linear_projection": False,
    }


def diffusers_config_for(ucfg) -> Dict[str, Any]:
    """Dispatch on the architecture dataclass type."""
    name = type(ucfg).__name__
    if name == "UNet2DConfig":
        return unet2d_config_json(ucfg)
    if name == "UNet2DConditionConfig":
        return sd_unet_config_json(ucfg)
    raise TypeError(f"No diffusers config emitter for {name}; "
                    "pass an explicit config dict to save_diffusers_model_dir")


def save_diffusers_model_dir(params: Any, config: Any, out_dir: str) -> str:
    """Write a diffusers model directory: ``config.json`` +
    ``diffusion_pytorch_model.safetensors``. ``config`` may be an
    architecture dataclass (UNet2DConfig / UNet2DConditionConfig) or a
    ready config dict."""
    from safetensors.numpy import save_file

    cfg_dict = config if isinstance(config, dict) else diffusers_config_for(config)
    os.makedirs(out_dir, exist_ok=True)
    sd = export_diffusers_state_dict(params)
    save_file(sd, os.path.join(out_dir, "diffusion_pytorch_model.safetensors"))
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(cfg_dict, f, indent=2, sort_keys=True)
    return out_dir


def export_bundle_to_diffusers(checkpoint_dir: str, model, out_dir: str,
                               items: tuple = ("unet", "unet_ema")) -> Dict[str, str]:
    """Orbax bundle (``checkpoint-N/``) → diffusers model dirs, one per
    saved UNet item present (``unet``, ``unet_ema``). ``model`` is the flax
    module whose ``init_params`` builds the restore template and whose
    ``.cfg`` provides the architecture for config.json."""
    import jax
    import orbax.checkpoint as ocp

    written = {}
    # Abstract template: shapes/dtypes only — no full-size init forward.
    # orbax needs a concrete sharding on abstract leaves to deserialize.
    shard = jax.sharding.SingleDeviceSharding(jax.devices()[0])
    template = jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=shard),
        jax.eval_shape(lambda: model.init_params(jax.random.PRNGKey(0))))
    with ocp.StandardCheckpointer() as ckptr:
        for item in items:
            sub = os.path.join(os.path.abspath(checkpoint_dir), item)
            if not os.path.isdir(sub):
                continue
            params = ckptr.restore(sub, template)
            written[item] = save_diffusers_model_dir(
                params, model.config, os.path.join(out_dir, item))
    if not written:
        raise FileNotFoundError(
            f"None of {items} found under {checkpoint_dir}")
    return written
