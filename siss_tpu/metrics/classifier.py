"""Generic classifier wrapper for metric computation.

JAX port of ``metrics/classifier.py:8-55``: wraps any flax classifier
(module + params), batched jit-compiled ``compute_logits`` (default batch
2048) and ``compute_class_frequency``. Checkpoints load from orbax dirs or
torch ``.pt`` state dicts via the converter in ``utils/torch_import``.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


class Classifier:
    def __init__(self, apply_fn: Callable, params: Any,
                 transform: Optional[Callable] = None, batch_size: int = 2048):
        """``apply_fn(params, imgs_nhwc) -> logits``."""
        self.apply_fn = apply_fn
        self.params = params
        self.transform = transform
        self.batch_size = batch_size
        self._jit = jax.jit(apply_fn)

    def compute_logits(self, imgs, batch_size: Optional[int] = None) -> np.ndarray:
        """imgs: [N,H,W,C] float in [0,1] → logits [N, num_classes]."""
        bs = batch_size or self.batch_size
        imgs = np.asarray(imgs)
        if self.transform is not None:
            imgs = np.asarray(self.transform(imgs))
        outs = []
        for i in range(0, len(imgs), bs):
            outs.append(np.asarray(self._jit(self.params, jnp.asarray(imgs[i:i + bs]))))
        return np.concatenate(outs, axis=0)

    def compute_class_frequency(self, imgs, img_class: int) -> float:
        logits = self.compute_logits(imgs)
        preds = logits.argmax(-1)
        return float((preds == img_class).mean())
