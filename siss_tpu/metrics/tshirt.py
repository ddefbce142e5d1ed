"""Static L2-threshold t-shirt detector (``metrics/tshirt.py:3-28``)."""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np


class TShirtClassifier:
    @staticmethod
    def get_tshirt_frequency(imgs, tshirt_img, threshold: float = 10.0) -> Tuple[float, np.ndarray]:
        """imgs: [N,H,W,C] in [0,1]; tshirt_img: [H,W,C] same range.
        Returns (match frequency, boolean match mask)."""
        imgs = jnp.asarray(imgs)
        target = jnp.asarray(tshirt_img).reshape(-1)
        flat = imgs.reshape(imgs.shape[0], -1)
        dists = jnp.sqrt(jnp.sum((flat - target[None, :]) ** 2, axis=1))
        matches = dists < threshold
        return float(matches.mean()), np.asarray(matches)
