"""Deterministic synthetic weights for the external-model tower goldens
(VERDICT r4 next #7).

Real InceptionV3 / CLIP weights are unreachable in this zero-egress
environment, so the converter paths are pinned the next-best way: every
torch state-dict tensor is synthesized as a pure function of its KEY NAME
(sha256 → numpy Generator) and shape, a torch model filled with those
values was forward-run ONCE (``scripts/make_tower_goldens.py``) and its
output features committed to ``tests/goldens/*.npz``. The fast-tier tests
regenerate the same state dict here — no torch, no torch RNG, no
downloads — push it through the flax converter, and require the recorded
activations. This checks weight routing, transposition, BN running-stat
handling, and the numerical path against a frozen reference output, not
merely against whatever torch happens to compute at test time.

Distributions mirror the randomized-parity tests (small weights, BN/LN
scales near 1, non-trivial running stats) so deep towers stay numerically
sane.
"""

from __future__ import annotations

import hashlib
import json

import numpy as np


def synth_tensor(key: str, shape) -> np.ndarray:
    """Value of one state-dict tensor as a pure function of (key, shape)."""
    seed = np.frombuffer(hashlib.sha256(key.encode()).digest()[:8], np.uint64)[0]
    rng = np.random.default_rng(seed)
    shape = tuple(int(s) for s in shape)
    if key.endswith("running_var"):
        return rng.uniform(0.5, 2.0, shape).astype(np.float32)
    if key.endswith("running_mean"):
        return rng.normal(0.0, 0.2, shape).astype(np.float32)
    if key.endswith(".bias"):
        return rng.normal(0.0, 0.1, shape).astype(np.float32)
    if key.endswith(".weight") and len(shape) == 1:
        # BatchNorm / LayerNorm affine scale: keep near 1
        return rng.uniform(0.5, 1.5, shape).astype(np.float32)
    return rng.normal(0.0, 0.05, shape).astype(np.float32)


def synth_state_dict(meta: dict) -> dict:
    return {k: synth_tensor(k, shp) for k, shp in meta.items()}


def load_golden(path):
    """Returns (meta {key: shape}, input array, recorded features)."""
    with np.load(path) as z:
        meta = json.loads(str(z["meta"]))
        return meta, z["inputs"], z["features"]


def save_golden(path, meta: dict, inputs: np.ndarray, features: np.ndarray) -> None:
    np.savez_compressed(
        path,
        meta=np.asarray(json.dumps({k: list(v) for k, v in meta.items()})),
        inputs=inputs.astype(np.float32),
        features=features.astype(np.float32),
    )
