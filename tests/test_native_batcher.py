"""Native C++ batcher: parity with the Python path (skipped when the
extension isn't built — run scripts/build_native.py)."""

import numpy as np
import pytest

from siss_tpu.data import ArrayDataset, BatchLoader, InfiniteSampler

batcher = pytest.importorskip("siss_tpu._siss_batcher")


def test_assemble_matches_numpy():
    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, (50, 8, 8, 3), dtype=np.uint8)
    idx = rng.integers(0, 50, 16).astype(np.int64)
    out = batcher.assemble(images, idx, True)
    expected = images[idx].astype(np.float32) / 255.0 * 2 - 1
    np.testing.assert_allclose(out, expected, atol=1e-6)


def test_loader_native_path_parity():
    rng = np.random.default_rng(1)
    images = rng.integers(0, 255, (40, 8, 8, 1), dtype=np.uint8)
    ds = ArrayDataset(images, normalize=True)
    native = BatchLoader(ds, InfiniteSampler(len(ds), seed=3), 8, prefetch=0)
    assert native._native_images is not None  # fast path engaged
    # identical sampler stream → identical batches vs the python path
    python = BatchLoader(ds, InfiniteSampler(len(ds), seed=3), 8, prefetch=0,
                         collate=lambda items: np.stack(items))
    assert python._native_images is None
    for _, (a, b) in zip(range(3), zip(iter(native), iter(python))):
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_bounds_checked():
    images = np.zeros((4, 2, 2, 1), np.uint8)
    with pytest.raises(IndexError):
        batcher.assemble(images, np.array([4], np.int64), True)
