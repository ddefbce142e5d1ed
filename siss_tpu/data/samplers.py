"""Index samplers, re-implemented as plain Python/numpy generators.

Semantics mirror the reference's torch samplers:
``data/utils/infinite_sampler.py`` (StyleGAN-style endless shuffled stream
with sliding-window reshuffle, rank/num_replicas aware) and
``data/utils/repeat_sampler.py`` (each index repeated ``num_repeats`` times,
in order — keeps the single forget image constant across every batch).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np


class InfiniteSampler:
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

    def __iter__(self) -> Iterator[int]:
        order = np.arange(self.dataset_len)
        rnd = None
        window = 0
        if self.shuffle:
            rnd = np.random.RandomState(self.seed)
            rnd.shuffle(order)
            window = int(np.rint(order.size * self.window_size))

        idx = 0
        while True:
            i = idx % order.size
            if idx % self.num_replicas == self.rank:
                yield int(order[i])
            if window >= 2:
                j = (i - rnd.randint(window)) % order.size
                order[i], order[j] = order[j], order[i]
            idx += 1


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
