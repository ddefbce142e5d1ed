"""Classifier ResNets for the metrics layer (flax.linen, NHWC).

Equivalents of the reference's metric classifiers: the grayscale-capable
ResNet-18 MNIST digit classifier (``metrics/mnist_resnet.py:61-133``) and
the thin CIFAR ResNet-20/32/56 family (``metrics/cifar_resnet.py:86-141``).
Used by InceptionScore / class-frequency metrics; trainable with the small
utilities in ``siss_tpu.tasks.train_classifier``.
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class BasicBlock(nn.Module):
    filters: int
    strides: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.filters, (3, 3), strides=(self.strides, self.strides),
                    padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn2")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.filters, (1, 1), strides=(self.strides, self.strides),
                               use_bias=False, dtype=self.dtype, name="downsample_conv")(residual)
            residual = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                                    name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """torchvision-style ResNet with BasicBlocks (18/34 layouts)."""

    stage_sizes: Sequence[int]
    num_classes: int = 10
    num_filters: int = 64
    grayscale: bool = False
    small_input: bool = True  # 3x3 stem, no maxpool (MNIST/CIFAR style)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.small_input:
            x = nn.Conv(self.num_filters, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                        dtype=self.dtype, name="conv_stem")(x)
            x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn_stem")(x)
            x = nn.relu(x)
        else:
            x = nn.Conv(self.num_filters, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                        use_bias=False, dtype=self.dtype, name="conv_stem")(x)
            x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn_stem")(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for i, n_blocks in enumerate(self.stage_sizes):
            for j in range(n_blocks):
                strides = 2 if i > 0 and j == 0 else 1
                x = BasicBlock(self.num_filters * 2**i, strides, dtype=self.dtype,
                               name=f"stage{i}_block{j}")(x, train)
        x = x.mean(axis=(1, 2))
        return nn.Dense(self.num_classes, dtype=self.dtype, name="fc")(x)


def resnet18(num_classes: int = 10, grayscale: bool = True, **kw) -> ResNet:
    """MNIST metric classifier arch (``metrics/mnist_resnet.py:61-133``)."""
    return ResNet(stage_sizes=(2, 2, 2, 2), num_classes=num_classes, grayscale=grayscale, **kw)


def cifar_resnet(depth: int = 20, num_classes: int = 10, **kw) -> ResNet:
    """Thin CIFAR ResNet family (``metrics/cifar_resnet.py``): depth = 6n+2."""
    assert (depth - 2) % 6 == 0
    n = (depth - 2) // 6
    return ResNet(stage_sizes=(n, n, n), num_classes=num_classes, num_filters=16, **kw)


def load_torch_resnet(path_or_state: "str | dict", model: ResNet):
    """Import a torchvision-naming ResNet state dict (the reference's
    ``checkpoints/classifiers/mnist.pt``, arch ``metrics/mnist_resnet.py``:
    7×7 stem + maxpool → use ``small_input=False``) into flax variables.

    Returns ``{"params": ..., "batch_stats": ...}`` for ``model.apply``.
    """
    import re

    import numpy as np

    if isinstance(path_or_state, str):
        from siss_tpu.utils.hf_convert import load_torch_state_dict

        sd = load_torch_state_dict(path_or_state)
    else:
        sd = {k: np.asarray(v) for k, v in path_or_state.items()}

    def torch_key(names, suffix):
        mods = []
        for p in names:
            m = re.match(r"^stage(\d+)_block(\d+)$", p)
            if m:
                mods.append(f"layer{int(m.group(1)) + 1}.{m.group(2)}")
            elif p == "conv_stem":
                mods.append("conv1")
            elif p == "bn_stem":
                mods.append("bn1")
            elif p == "downsample_conv":
                mods.append("downsample.0")
            elif p == "downsample_bn":
                mods.append("downsample.1")
            else:
                mods.append(p)
        return ".".join(mods) + "." + suffix

    import jax

    template = model.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 28, 28, 1 if model.grayscale else 3)))
    out = {"params": {}, "batch_stats": {}}

    def put(col, names, arr):
        cur = out[col]
        for n in names[:-1]:
            cur = cur.setdefault(n, {})
        cur[names[-1]] = jnp.asarray(arr)

    suffix_map = {"kernel": "weight", "scale": "weight", "bias": "bias",
                  "mean": "running_mean", "var": "running_var"}
    for col in ("params", "batch_stats"):
        for path, leaf in jax.tree_util.tree_flatten_with_path(template[col])[0]:
            names = tuple(p.key for p in path)
            key = torch_key(names[:-1], suffix_map[str(names[-1])])
            t = np.asarray(sd[key])
            if names[-1] == "kernel":
                t = t.transpose(2, 3, 1, 0) if t.ndim == 4 else t.transpose(1, 0)
            if tuple(t.shape) != tuple(leaf.shape):
                raise ValueError(f"{key}: torch {t.shape} vs flax {leaf.shape}")
            put(col, names, t)
    return out


def make_classifier_apply(model: ResNet, variables) -> Tuple[Callable, dict]:
    """Returns (apply_fn(params, imgs) -> logits, params) for the metrics
    ``Classifier`` wrapper; folds batch stats in for eval."""
    def apply_fn(params, imgs):
        return model.apply(params, imgs, train=False)

    return apply_fn, variables
