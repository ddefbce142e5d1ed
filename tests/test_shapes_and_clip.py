"""Coverage: ShapesDataset filtering and the CLIP-vision weight converter."""

import os

import jax
import numpy as np
import pytest
from PIL import Image

from siss_tpu.data.shapes import ShapesDataset
from siss_tpu.models.clip_vision import CLIPVisionConfig, CLIPVisionModel


def _make_shapes(root):
    for cfg_name in ["red_cube", "blue_sphere"]:
        d = os.path.join(root, cfg_name)
        os.makedirs(d)
        for i in range(3):
            arr = np.random.default_rng(i).integers(0, 255, (8, 8, 3), dtype=np.uint8)
            Image.fromarray(arr).save(os.path.join(d, f"{i}.png"))


def test_shapes_dataset_config_filters(tmp_path):
    _make_shapes(str(tmp_path))
    full = ShapesDataset(str(tmp_path))
    assert len(full) == 6 and set(full.configs) == {"red_cube", "blue_sphere"}
    only = ShapesDataset(str(tmp_path), include_configs=["red_cube"])
    assert len(only) == 3 and only.config_of(0) == "red_cube"
    excl = ShapesDataset(str(tmp_path), exclude_configs=["red_cube"])
    assert len(excl) == 3 and excl.config_of(0) == "blue_sphere"
    img = full[0]
    assert img.shape == (8, 8, 3) and -1 <= img.min() and img.max() <= 1


def test_clip_vision_converter_roundtrip():
    """Export tiny CLIP-vision params with HF naming, convert back →
    bit-identity (name map + transposes mutually consistent)."""
    from siss_tpu.utils.sd_convert import _SUFFIX, _expand_block_names, convert_clip_vision

    model = CLIPVisionModel(CLIPVisionConfig.tiny())
    params = model.init_params(jax.random.PRNGKey(0))

    sd = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        names = tuple(p.key for p in path)
        arr = np.asarray(leaf)
        if names[-1] == "class_embedding":
            sd["vision_model.embeddings.class_embedding"] = arr
            continue
        parts = _expand_block_names([str(n) for n in names[:-1]])
        parts = [{"mlp_fc1": "mlp.fc1", "mlp_fc2": "mlp.fc2"}.get(p, p) for p in parts]
        flat = []
        for p in parts:
            flat += p.split(".")
        key = ".".join(flat + [_SUFFIX[str(names[-1])]])
        if flat[0] in ("patch_embedding", "position_embedding"):
            key = "vision_model.embeddings." + key
        elif flat[0] == "layers":
            key = "vision_model.encoder." + key
        elif flat[0] in ("pre_layrnorm", "post_layernorm"):
            key = "vision_model." + key
        if names[-1] == "kernel":
            arr = arr.transpose(3, 2, 0, 1) if arr.ndim == 4 else arr.transpose(1, 0)
        sd[key] = arr
    assert "vision_model.embeddings.patch_embedding.weight" in sd
    assert "visual_projection.weight" in sd

    back = convert_clip_vision(sd, params)
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
