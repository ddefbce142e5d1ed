"""SSCD copy-detection similarity (``delete_sd.py:227-228,277-283``).

The reference embeds images with the external ``sscd_disc_mixup``
TorchScript model (a ResNet-50 trunk) and scores cosine similarity via a
matmul against the memorized image's embedding. We load the same
TorchScript artifact with torch-CPU when present (embeddings are tiny;
the matmul scoring runs in JAX), with ImageNet normalization per the
reference transform config (``config/delete_sd.yaml:44-50``).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class SSCDEvaluator:
    def __init__(self, ts_model):
        self.model = ts_model

    @classmethod
    def load(cls, path: str) -> Optional["SSCDEvaluator"]:
        try:
            import torch

            return cls(torch.jit.load(path, map_location="cpu").eval())
        except Exception as e:
            print(f"[sscd] unavailable ({e}); metric disabled")
            return None

    def embed(self, imgs01: np.ndarray) -> np.ndarray:
        """imgs01: [N,H,W,3] in [0,1] → raw model embeddings (the reference
        scores the TorchScript model's output directly, without an extra L2
        normalization — ``delete_sd.py:277-284``)."""
        import torch

        x = (np.asarray(imgs01, np.float32) - _IMAGENET_MEAN) / _IMAGENET_STD
        x = torch.from_numpy(x.transpose(0, 3, 1, 2))
        with torch.no_grad():
            e = self.model(x).numpy()
        return e

    def similarities(self, imgs01: np.ndarray, mem_img01: np.ndarray) -> np.ndarray:
        mem = self.embed(mem_img01[None])
        em = self.embed(imgs01)
        return (mem @ em.T).squeeze(0)

    def mean_similarity(self, imgs01, mem_img01) -> float:
        return float(self.similarities(imgs01, mem_img01).mean())

    def max_similarity(self, imgs01, mem_img01) -> float:
        return float(self.similarities(imgs01, mem_img01).max())
