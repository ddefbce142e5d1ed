"""kmeans memorization classifier (``delete_sd.py:225,269-275``).

The reference predicts with a joblib'd sklearn KMeans over flattened
255-scaled pixels; ``fraction`` = mean predicted label (label 1 =
memorized cluster). Loads the same joblib artifact, or an ``.npz`` of
cluster centers for sklearn-free deployments; prediction itself is a
single jitted distance argmin.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class KMeansMemClassifier:
    def __init__(self, centers: np.ndarray):
        self.centers = jnp.asarray(centers, jnp.float32)  # [k, D]

        @jax.jit
        def predict(flat):
            d = jnp.sum((flat[:, None, :] - self.centers[None]) ** 2, axis=-1)
            return jnp.argmin(d, axis=-1)

        self._predict = predict

    @classmethod
    def load(cls, path: str) -> "KMeansMemClassifier":
        if path.endswith(".npz"):
            return cls(np.load(path)["centers"])
        import joblib

        km = joblib.load(path)
        return cls(np.asarray(km.cluster_centers_))

    def predict(self, imgs01: np.ndarray) -> np.ndarray:
        """imgs01: [N,H,W,C] in [0,1] → cluster ids (255-scaled flatten,
        reference SCALE_FACTOR=255)."""
        flat = jnp.asarray(np.asarray(imgs01, np.float32).reshape(len(imgs01), -1) * 255.0)
        return np.asarray(self._predict(flat))

    def fraction(self, imgs01: np.ndarray) -> float:
        """Mean predicted label == fraction memorized (labels are 0/1)."""
        return float(self.predict(imgs01).mean())
