"""InceptionV3 feature extractor for FID/IS (flax, NHWC).

The reference computes FID through torchmetrics' InceptionV3-pool3-2048
features (``metrics/fid.py:10-69``). This module provides:

* a faithful torchvision-layout InceptionV3 in flax (so the standard
  ``pt_inception`` / torchvision weights import via the hf_convert torch
  loader when a weights file is available locally), feature layer = 2048-d
  avgpool, with the conventional 299×299 bilinear resize;
* ``build_fid_evaluator`` which wires it (or, in weight-less offline
  environments, a deterministic random-projection CNN embedder — "FID-rand",
  clearly labelled) into the generic ``FIDEvaluator``.

FID numbers are only comparable when computed with the same embedder;
``make_inception_feature_fn`` returns which one was wired and the evaluator
exposes it as ``FIDEvaluator.embedder`` / ``metric_key`` (``metrics/fid``
for real InceptionV3, ``metrics/fid_rand`` for the fallback).
"""

from __future__ import annotations

import os
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class BasicConv2d(nn.Module):
    out_channels: int
    kernel: tuple
    strides: tuple = (1, 1)
    padding: Any = ((0, 0), (0, 0))

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out_channels, self.kernel, strides=self.strides,
                    padding=self.padding, use_bias=False, name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3, name="bn")(x)
        return nn.relu(x)


def _pad(k):
    return ((k[0] // 2, k[0] // 2), (k[1] // 2, k[1] // 2))


def _avg_pool_3x3(x, count_include_pad: bool):
    """3×3 stride-1 pad-1 average pool. ``count_include_pad=False`` divides
    by the number of VALID window elements (the pytorch-fid / torchmetrics
    inception patch); True divides by 9 everywhere (torchvision)."""
    if count_include_pad:
        return nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))
    summed = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
                                   ((0, 0), (1, 1), (1, 1), (0, 0)))
    ones = jnp.ones(x.shape[1:3], x.dtype)[None, :, :, None]
    counts = jax.lax.reduce_window(ones, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
                                   ((0, 0), (1, 1), (1, 1), (0, 0)))
    return summed / counts


class InceptionA(nn.Module):
    pool_features: int
    fid_pool: bool = False

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=_pad((5, 5)), name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=_pad((3, 3)), name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=_pad((3, 3)), name="branch3x3dbl_3")(b3)
        bp = _avg_pool_3x3(x, count_include_pad=not self.fid_pool)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), strides=(2, 2), name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=_pad((3, 3)), name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), strides=(2, 2), name="branch3x3dbl_3")(bd)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    fid_pool: bool = False

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=_pad((1, 7)), name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=_pad((7, 1)), name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=_pad((7, 1)), name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=_pad((1, 7)), name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=_pad((7, 1)), name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=_pad((1, 7)), name="branch7x7dbl_5")(bd)
        bp = _avg_pool_3x3(x, count_include_pad=not self.fid_pool)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), strides=(2, 2), name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=_pad((1, 7)), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=_pad((7, 1)), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), strides=(2, 2), name="branch7x7x3_4")(b7)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool_mode: str = "avg"  # torchvision; FID variant: 7b="avg_nocount", 7c="max"

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3a = BasicConv2d(384, (1, 3), padding=_pad((1, 3)), name="branch3x3_2a")(b3)
        b3b = BasicConv2d(384, (3, 1), padding=_pad((3, 1)), name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=_pad((3, 3)), name="branch3x3dbl_2")(bd)
        bda = BasicConv2d(384, (1, 3), padding=_pad((1, 3)), name="branch3x3dbl_3a")(bd)
        bdb = BasicConv2d(384, (3, 1), padding=_pad((3, 1)), name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.pool_mode == "max":
            bp = nn.max_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))
        else:
            bp = _avg_pool_3x3(x, count_include_pad=self.pool_mode == "avg")
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Features(nn.Module):
    """InceptionV3 trunk up to the 2048-d avgpool (no fc), torchvision
    parameter layout. ``variant="torchvision"`` reproduces torchvision
    ``inception_v3`` pooling exactly; ``variant="fid"`` reproduces the
    pytorch-fid / torchmetrics patched blocks (``count_include_pad=False``
    average pools in A/C/7b, max pool in 7c's branch_pool) that the
    reference's FID metric actually runs (``metrics/fid.py:10-69`` →
    torchmetrics ``FrechetInceptionDistance`` → pt_inception weights)."""

    variant: str = "fid"

    @nn.compact
    def __call__(self, x):
        fid = self.variant == "fid"
        # x: [N,299,299,3] in [-1,1] (FID normalization)
        x = BasicConv2d(32, (3, 3), strides=(2, 2), name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=_pad((3, 3)), name="Conv2d_2b_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = InceptionA(32, fid_pool=fid, name="Mixed_5b")(x)
        x = InceptionA(64, fid_pool=fid, name="Mixed_5c")(x)
        x = InceptionA(64, fid_pool=fid, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, fid_pool=fid, name="Mixed_6b")(x)
        x = InceptionC(160, fid_pool=fid, name="Mixed_6c")(x)
        x = InceptionC(160, fid_pool=fid, name="Mixed_6d")(x)
        x = InceptionC(192, fid_pool=fid, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(pool_mode="avg_nocount" if fid else "avg", name="Mixed_7b")(x)
        x = InceptionE(pool_mode="max" if fid else "avg", name="Mixed_7c")(x)
        return x.mean(axis=(1, 2))  # [N, 2048]


class RandomEmbedder(nn.Module):
    """Deterministic random-projection CNN for FID-rand in weight-less
    environments (documented fallback; numbers not comparable with
    InceptionV3 FID)."""

    features: int = 512

    @nn.compact
    def __call__(self, x):
        for ch in (32, 64, 128):
            x = nn.Conv(ch, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))(x)
            x = nn.relu(x)
        x = x.mean(axis=(1, 2))
        return nn.Dense(self.features)(x)


def make_inception_feature_fn(weights_path: Optional[str] = None,
                              batch_input_range: str = "01",
                              variant: str = "fid"):
    """Returns ``(feature_fn, embedder_name)`` where ``feature_fn(imgs_nhwc)
    -> [N, D]`` and ``embedder_name`` is ``"inception_v3"`` or ``"rand"``.

    ``weights_path``: a pt_inception / torchvision ``inception_v3``
    state-dict (.pth/.bin/.safetensors). When None/missing →
    RandomEmbedder (FID-rand). ``variant``: "fid" (torchmetrics/pytorch-fid
    pooling — paper-comparable) or "torchvision".
    """
    if weights_path and os.path.exists(weights_path):
        from siss_tpu.utils.hf_convert import load_torch_state_dict

        model = InceptionV3Features(variant=variant)
        template = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3)))
        sd = load_torch_state_dict(weights_path)
        sd = {k: v for k, v in sd.items()
              if not k.startswith(("fc.", "AuxLogits."))}
        # torchvision BN: weight/bias/running_mean/running_var
        variables = _convert_inception(sd, template)
        mdl, var, name = model, variables, "inception_v3"
    else:
        mdl = RandomEmbedder()
        var = mdl.init(jax.random.PRNGKey(42), jnp.zeros((1, 299, 299, 3)))
        name = "rand"

    @jax.jit
    def feature_fn(imgs):
        imgs = jnp.asarray(imgs, jnp.float32)
        if imgs.shape[-1] == 1:
            imgs = jnp.repeat(imgs, 3, axis=-1)
        imgs = jax.image.resize(imgs, (imgs.shape[0], 299, 299, 3), method="bilinear")
        if batch_input_range == "01":
            imgs = imgs * 2.0 - 1.0
        return mdl.apply(var, imgs)

    return feature_fn, name


def _convert_inception(sd, template):
    """torchvision inception_v3 state dict → flax variables (params +
    batch_stats)."""
    params, stats = {}, {}

    def put(tree, names, arr):
        cur = tree
        for n in names[:-1]:
            cur = cur.setdefault(n, {})
        cur[names[-1]] = arr

    flat_p = jax.tree_util.tree_flatten_with_path(template["params"])[0]
    for path, leaf in flat_p:
        names = tuple(p.key for p in path)
        torch_key = ".".join(names).replace(".conv.kernel", ".conv.weight") \
            .replace(".bn.scale", ".bn.weight").replace(".bn.bias", ".bn.bias")
        torch_key = torch_key.replace("/", ".")
        t = np.asarray(sd[torch_key])
        if names[-1] == "kernel" and t.ndim == 4:
            t = t.transpose(2, 3, 1, 0)
        put(params, names, jnp.asarray(t))
    flat_s = jax.tree_util.tree_flatten_with_path(template["batch_stats"])[0]
    for path, leaf in flat_s:
        names = tuple(p.key for p in path)
        torch_key = ".".join(names).replace(".bn.mean", ".bn.running_mean") \
            .replace(".bn.var", ".bn.running_var")
        put(stats, names, jnp.asarray(np.asarray(sd[torch_key])))
    return {"params": params, "batch_stats": stats}


def build_fid_evaluator(fid_cfg: dict, real_dataset, max_real: int = 2048):
    """Wire an FIDEvaluator from config + a dataset of real images
    (the reference caches real stats once, ``metrics/fid.py:23-41``)."""
    from siss_tpu.metrics.fid import FIDEvaluator

    feature_fn, embedder = make_inception_feature_fn(
        fid_cfg.get("inception_weights"),
        variant=str(fid_cfg.get("inception_variant", "fid")))
    n = min(len(real_dataset), max_real)
    real = np.stack([(np.asarray(real_dataset[i]) + 1.0) / 2.0 for i in range(n)])
    return FIDEvaluator(feature_fn, real_images=real,
                        inception_batch_size=int(fid_cfg.get("inception_batch_size", 64)),
                        embedder=embedder)
