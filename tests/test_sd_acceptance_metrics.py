"""Unit tests for the two SD acceptance metrics (VERDICT r4 missing #3).

The reference's SD experiments are judged by ``metrics/sscd_i`` decaying
and ``metrics/deletion_fraction_i`` reaching 0
(``/root/reference/delete_sd.py:269-284``); these are their goldens.
"""

import numpy as np
import pytest

from siss_tpu.metrics.kmeans_mem import KMeansMemClassifier
from siss_tpu.metrics.sscd import SSCDEvaluator

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class _StubEmbedder:
    """Stands in for the TorchScript SSCD model: maps each image to a fixed
    row of `table` keyed by the image's (pre-normalization) constant pixel
    value, and records inputs so the transform can be checked."""

    def __init__(self, table):
        self.table = {k: np.asarray(v, np.float32) for k, v in table.items()}
        self.calls = []

    def __call__(self, x):
        import torch

        self.calls.append(x.numpy().copy())
        # invert the ImageNet normalization to recover the constant pixel
        raw = x.numpy() * _IMAGENET_STD.reshape(1, 3, 1, 1) + _IMAGENET_MEAN.reshape(1, 3, 1, 1)
        keys = np.round(raw[:, 0, 0, 0], 3)
        return torch.from_numpy(np.stack([self.table[float(k)] for k in keys]))


def _const_imgs(values, hw=4):
    return np.stack([np.full((hw, hw, 3), v, np.float32) for v in values])


def test_sscd_similarities_known_cosine_table():
    """Score math: similarities = mem_embedding @ embeddings.T on RAW model
    output (no extra L2 normalization — reference `delete_sd.py:281`), so a
    hand-built embedding table gives exact expected dot products."""
    table = {
        1.0: [1.0, 0.0, 0.0],        # the memorized image
        0.0: [1.0, 0.0, 0.0],        # identical direction  -> sim 1.0
        0.25: [0.0, 1.0, 0.0],       # orthogonal           -> sim 0.0
        0.5: [-1.0, 0.0, 0.0],       # opposite             -> sim -1.0
        0.75: [2.0, 0.0, 0.0],       # UN-normalized        -> sim 2.0 (raw dot)
    }
    ev = SSCDEvaluator(_StubEmbedder(table))
    imgs = _const_imgs([0.0, 0.25, 0.5, 0.75])
    mem = np.full((4, 4, 3), 1.0, np.float32)

    sims = ev.similarities(imgs, mem)
    np.testing.assert_allclose(sims, [1.0, 0.0, -1.0, 2.0], atol=1e-6)
    # the task logs the MEAN under metrics/sscd_{i} (reference parity) and
    # the max under metrics/sscd_max_{i}
    assert ev.mean_similarity(imgs, mem) == pytest.approx(0.5)
    assert ev.max_similarity(imgs, mem) == pytest.approx(2.0)


def test_sscd_applies_imagenet_normalization_nchw():
    """The embedder must see ImageNet-normalized NCHW input (the reference's
    sscd data_transforms, ``config/delete_sd.yaml:44-50``)."""
    stub = _StubEmbedder({0.5: [1.0], 1.0: [1.0]})
    ev = SSCDEvaluator(stub)
    ev.similarities(_const_imgs([0.5]), np.full((4, 4, 3), 1.0, np.float32))
    assert len(stub.calls) == 2
    x = stub.calls[-1]  # the batch call (mem embedded first)
    assert x.shape == (1, 3, 4, 4)
    expected = (0.5 - _IMAGENET_MEAN) / _IMAGENET_STD
    np.testing.assert_allclose(x[0, :, 0, 0], expected, rtol=1e-5)


def test_sscd_load_missing_artifact_returns_none(tmp_path, capsys):
    assert SSCDEvaluator.load(str(tmp_path / "nope.torchscript.pt")) is None
    assert "unavailable" in capsys.readouterr().out


def test_kmeans_hand_computable_argmin():
    """Two centers in 255-scaled flat pixel space: all-black images land on
    center 0, all-white on center 1; fraction = mean label (reference
    ``delete_sd.py:269-275``, SCALE_FACTOR=255)."""
    d = 2 * 2 * 3
    centers = np.stack([np.zeros(d), np.full(d, 255.0)]).astype(np.float32)
    clf = KMeansMemClassifier(centers)
    imgs = _const_imgs([0.0, 0.0, 1.0, 0.9], hw=2)
    np.testing.assert_array_equal(clf.predict(imgs), [0, 0, 1, 1])
    assert clf.fraction(imgs) == pytest.approx(0.5)
    # mid-grey 0.4*255=102 is nearer 0 than 255
    assert clf.predict(_const_imgs([0.4], hw=2))[0] == 0


def test_kmeans_load_npz_and_joblib(tmp_path):
    """Both artifact formats load to identical predictions: the reference's
    sklearn joblib (`delete_sd.py:225`) and our sklearn-free .npz."""
    rng = np.random.default_rng(0)
    data = np.concatenate([rng.normal(0.1, 0.02, (20, 2 * 2 * 3)),
                           rng.normal(0.9, 0.02, (20, 2 * 2 * 3))]) * 255.0
    from sklearn.cluster import KMeans

    km = KMeans(n_clusters=2, n_init=3, random_state=0).fit(data.astype(np.float32))
    import joblib

    jpath = tmp_path / "km.joblib"
    joblib.dump(km, jpath)
    npath = tmp_path / "km.npz"
    np.savez(npath, centers=km.cluster_centers_)

    clf_j = KMeansMemClassifier.load(str(jpath))
    clf_n = KMeansMemClassifier.load(str(npath))
    imgs = rng.uniform(0, 1, (8, 2, 2, 3)).astype(np.float32)
    np.testing.assert_array_equal(clf_j.predict(imgs), clf_n.predict(imgs))
    # and both agree with sklearn itself on the 255-scaled flattening
    sk = km.predict((imgs.reshape(8, -1) * 255.0).astype(np.float32))
    np.testing.assert_array_equal(clf_j.predict(imgs), sk)
