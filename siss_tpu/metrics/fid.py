"""Fréchet Inception Distance with a pluggable feature extractor.

Port of ``metrics/fid.py:10-69`` (torchmetrics FID with
``reset_real_features=False``): real-set statistics are computed once and
cached; fake batches stream through ``update``; ``compute`` does the exact
Fréchet distance. The feature extractor is injected — the canonical
InceptionV3-2048 (weights via the torch importer when available) or any
flax embedder (tests use a stub CNN; SSCD/CLIP embeddings reuse the same
machinery). Optional classifier-based removal of a class from either set
mirrors the reference's ``remove_class`` path.
"""

from __future__ import annotations

import time
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.linalg


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """‖μ₁−μ₂‖² + Tr(Σ₁+Σ₂−2√(Σ₁Σ₂)), torchmetrics-compatible."""
    mu1, mu2 = np.asarray(mu1, np.float64), np.asarray(mu2, np.float64)
    sigma1, sigma2 = np.asarray(sigma1, np.float64), np.asarray(sigma2, np.float64)
    diff = mu1 - mu2
    covmean = scipy.linalg.sqrtm(sigma1 @ sigma2)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = scipy.linalg.sqrtm((sigma1 + offset) @ (sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean))


def _stats(features: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    mu = features.mean(axis=0)
    sigma = np.cov(features, rowvar=False)
    return mu, sigma


class FIDEvaluator:
    def __init__(self, feature_fn: Callable, real_images: Optional[np.ndarray] = None,
                 inception_batch_size: int = 64,
                 remove_class_classifier=None, remove_class: Optional[int] = None,
                 embedder: str = "inception_v3"):
        """``feature_fn(imgs_nhwc_in_01) -> [N, D] features`` (jittable or
        host fn). ``real_images`` in [0,1]; stats cached
        (= ``reset_real_features=False``).

        ``embedder`` names the feature extractor; ``metric_key`` is
        ``metrics/fid`` only for the canonical inception_v3 — any other
        embedder logs under ``metrics/fid_<name>`` so FID-rand curves can
        never be mistaken for paper-comparable FID."""
        self.feature_fn = feature_fn
        self.embedder = embedder
        self.metric_key = ("metrics/fid" if embedder == "inception_v3"
                           else f"metrics/fid_{embedder}")
        self.batch_size = inception_batch_size
        self.remove_class_classifier = remove_class_classifier
        self.remove_class = remove_class
        self._fake_feats = []
        self._real_stats = None
        if real_images is not None:
            self.set_real_images(real_images)

    def _filter(self, imgs: np.ndarray) -> np.ndarray:
        if self.remove_class_classifier is None or self.remove_class is None:
            return imgs
        logits = self.remove_class_classifier.compute_logits(imgs)
        return imgs[logits.argmax(-1) != self.remove_class]

    def _features(self, imgs: np.ndarray) -> np.ndarray:
        outs = []
        for i in range(0, len(imgs), self.batch_size):
            outs.append(np.asarray(self.feature_fn(jnp.asarray(imgs[i:i + self.batch_size]))))
        return np.concatenate(outs, axis=0)

    def set_real_images(self, real_images: np.ndarray):
        feats = self._features(self._filter(np.asarray(real_images)))
        self._real_stats = _stats(feats)

    def update(self, fake_images: np.ndarray):
        self._fake_feats.append(self._features(self._filter(np.asarray(fake_images))))

    def compute(self) -> Tuple[float, float]:
        """Returns (fid, compute_seconds) like the reference's timed compute
        (``metrics/fid.py:57-65``)."""
        assert self._real_stats is not None, "call set_real_images first"
        start = time.time()
        fake = np.concatenate(self._fake_feats, axis=0)
        mu_f, sig_f = _stats(fake)
        fid = frechet_distance(*self._real_stats, mu_f, sig_f)
        self._fake_feats = []
        return fid, time.time() - start
