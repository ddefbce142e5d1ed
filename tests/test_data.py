import numpy as np
import pytest

from siss_tpu.data import (
    ArrayDataset,
    BatchLoader,
    InfiniteSampler,
    LabeledImageDataset,
    RepeatedSampler,
    dual_stream,
    make_synthetic_mnist_tshirt,
    normalize_to_unit_range,
)


def test_normalize():
    img = np.asarray([[0, 128, 255]], np.uint8)
    out = normalize_to_unit_range(img)
    np.testing.assert_allclose(out, [[-1, 128 / 255 * 2 - 1, 1]], atol=1e-6)
    # floats are taken as [0,1]
    np.testing.assert_allclose(normalize_to_unit_range(np.asarray([[0.0, 0.5, 1.0]], np.float32)),
                               [[-1, 0, 1]], atol=1e-6)
    # dtype-based: a near-black uint8 image must NOT be value-rescaled
    dark = np.zeros((2, 2), np.uint8)
    dark[0, 0] = 1
    out = normalize_to_unit_range(dark)
    np.testing.assert_allclose(out.max(), 1 / 255 * 2 - 1, atol=1e-6)


def test_synthetic_dataset_structure():
    images, labels = make_synthetic_mnist_tshirt(n_per_class=4)
    assert images.shape == (44, 28, 28, 1)
    assert images.dtype == np.uint8
    assert set(labels.tolist()) == set(range(11))
    # deterministic in seed
    i2, l2 = make_synthetic_mnist_tshirt(n_per_class=4)
    np.testing.assert_array_equal(images, i2)
    # t-shirts are distinctive: mean intensity differs from digits
    tshirt = images[labels == 10].mean()
    digits = images[labels != 10].mean()
    assert abs(tshirt - digits) > 5


def test_labeled_dataset_filters():
    images, labels = make_synthetic_mnist_tshirt(n_per_class=4)
    full = LabeledImageDataset("all", images, labels, normalize=True)
    dele = LabeledImageDataset("deletion", images, labels, class_to_remove=10)
    nond = LabeledImageDataset("nondeletion", images, labels, class_to_remove=10)
    assert len(full) == 44 and len(dele) == 4 and len(nond) == 40
    assert np.all(dele.labels == 10)
    assert np.all(nond.labels != 10)
    img = full[0]
    assert img.shape == (28, 28, 1) and img.min() >= -1 and img.max() <= 1
    with pytest.raises(ValueError):
        LabeledImageDataset("deletion", images, labels)  # missing class
    with pytest.raises(ValueError):
        LabeledImageDataset("bogus", images, labels)


def test_infinite_sampler_covers_dataset():
    s = InfiniteSampler(10, shuffle=True, seed=0)
    it = iter(s)
    seen = {next(it) for _ in range(100)}
    assert seen == set(range(10))


def test_infinite_sampler_rank_partition():
    """Across ranks, the first k yields partition the round-robin stream."""
    n = 8
    streams = []
    for rank in range(2):
        it = iter(InfiniteSampler(n, rank=rank, num_replicas=2, shuffle=False))
        streams.append([next(it) for _ in range(4)])
    assert streams[0] == [0, 2, 4, 6]
    assert streams[1] == [1, 3, 5, 7]


def test_repeated_sampler():
    s = RepeatedSampler(3, num_repeats=2)
    assert list(iter(s)) == [0, 0, 1, 1, 2, 2]
    assert len(s) == 6


def test_batch_loader_shapes():
    images, labels = make_synthetic_mnist_tshirt(n_per_class=4)
    ds = ArrayDataset(images, normalize=True)
    loader = BatchLoader(ds, InfiniteSampler(len(ds), seed=1), batch_size=8, prefetch=2)
    it = iter(loader)
    b = next(it)
    assert b.shape == (8, 28, 28, 1)
    assert b.dtype == np.float32


def test_dual_stream_microbatching():
    images, labels = make_synthetic_mnist_tshirt(n_per_class=4)
    keep = ArrayDataset(images[labels != 10], normalize=True)
    forget = ArrayDataset(images[labels == 10], normalize=True)
    ki = iter(BatchLoader(keep, InfiniteSampler(len(keep)), 4, prefetch=0))
    fi = iter(BatchLoader(forget, InfiniteSampler(len(forget)), 4, prefetch=0))
    step_input = next(dual_stream(ki, fi, accum_steps=3))
    assert step_input["all"].shape == (3, 4, 28, 28, 1)
    assert step_input["deletion"].shape == (3, 4, 28, 28, 1)
