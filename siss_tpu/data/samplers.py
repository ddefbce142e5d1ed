"""Index samplers, re-implemented as plain Python/numpy generators.

Capabilities mirror the reference's torch samplers
(``data/utils/infinite_sampler.py``, ``data/utils/repeat_sampler.py``):
an endless locally-shuffled index stream with bounded staleness and
rank/num_replicas striding, and an in-order repeat sampler that keeps the
single forget image constant across every batch. The infinite stream here
is an original design — a uniform shuffle *buffer* fed by fresh per-epoch
permutations — rather than the reference's sliding-window swap chain; the
two are statistically equivalent (uniform coverage, ~one visit per epoch
stretch, staleness bounded by the window size) and a statistical
equivalence test pins those properties (tests/test_data.py).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np


class InfiniteSampler:
    """Endless shuffled index stream with a bounded reshuffle window.

    Each "epoch" is a fresh uniform permutation of ``range(dataset_len)``;
    consecutive epochs are concatenated and passed through a shuffle buffer
    of ``round(dataset_len * window_size)`` slots (the tf.data idiom): every
    draw takes a uniformly random slot from the buffer and refills it from
    the epoch stream. This gives the same guarantees the reference's
    StyleGAN-style sampler provides — every index appears exactly once per
    epoch's worth of feed, local order is randomized within the window, and
    an index can never go more than ``2*dataset_len + window`` draws between
    visits.

    With ``num_replicas > 1`` the stream is generated identically on every
    rank and rank r keeps positions ``r, r+R, r+2R, ...`` — so the union of
    all ranks' outputs is exactly the single-rank stream (the reference's
    DDP contract).
    """

    def __init__(self, dataset_len: int, rank: int = 0, num_replicas: int = 1,
                 shuffle: bool = True, seed: int = 0, window_size: float = 0.5):
        assert dataset_len > 0
        assert num_replicas > 0
        assert 0 <= rank < num_replicas
        assert 0 <= window_size <= 1
        self.dataset_len = dataset_len
        self.rank = rank
        self.num_replicas = num_replicas
        self.shuffle = shuffle
        self.seed = seed
        self.window_size = window_size

    def _feed(self, rng: np.random.Generator) -> Iterator[np.ndarray]:
        """Infinite sequence of epoch index blocks."""
        if not self.shuffle:
            block = np.arange(self.dataset_len)
            while True:
                yield block
        # A degenerate window (< 2 slots) disables local reshuffling; the
        # reference then replays one fixed permutation forever — match that.
        if self._buffer_len() < 2:
            block = rng.permutation(self.dataset_len)
            while True:
                yield block
        while True:
            yield rng.permutation(self.dataset_len)

    def _buffer_len(self) -> int:
        return int(np.rint(self.dataset_len * self.window_size))

    def __iter__(self) -> Iterator[int]:
        rng = np.random.default_rng(self.seed)
        blocks = self._feed(rng)
        epoch_stream = (int(i) for block in blocks for i in block)

        buf_len = self._buffer_len() if self.shuffle else 0
        buffer = [next(epoch_stream) for _ in range(max(buf_len, 1))]

        pos = 0
        while True:
            slot = int(rng.integers(len(buffer))) if buf_len >= 2 else 0
            out = buffer[slot]
            buffer[slot] = next(epoch_stream)
            if pos % self.num_replicas == self.rank:
                yield out
            pos += 1


class RepeatedSampler:
    def __init__(self, dataset_len: int, num_repeats: int):
        self.dataset_len = dataset_len
        self.num_repeats = num_repeats

    def __len__(self) -> int:
        return self.dataset_len * self.num_repeats

    def __iter__(self) -> Iterator[int]:
        for i in range(self.dataset_len):
            for _ in range(self.num_repeats):
                yield i
