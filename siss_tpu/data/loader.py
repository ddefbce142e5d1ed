"""Host-side batching with background prefetch.

The reference uses torch ``DataLoader`` with 0 workers (synchronous); here
batches are assembled on the host by a small thread that stays one-or-more
steps ahead, so H2D transfer and input assembly overlap TPU compute.
Batches are NHWC float32 numpy; device placement (with mesh sharding) is the
trainer's job via ``siss_tpu.parallel.shard_batch``.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterator, Optional

import numpy as np


try:  # native C++ batch assembly (csrc/batcher.cpp); numpy fallback below
    from siss_tpu import _siss_batcher
except ImportError:  # pragma: no cover - environment without the extension
    _siss_batcher = None


class BatchLoader:
    """dataset + index-sampler → infinite iterator of stacked batches.

    When the dataset is backed by an in-memory uint8 array (ArrayDataset
    with ``normalize=True``) and the native extension is built, batches are
    assembled by the multi-threaded C++ path (gather + [-1,1] float32
    conversion, GIL released)."""

    def __init__(self, dataset, sampler, batch_size: int, prefetch: int = 2,
                 collate: Optional[Callable] = None, drop_last: bool = True,
                 skip_batches: int = 0):
        self.dataset = dataset
        self.sampler = sampler
        self.batch_size = batch_size
        self.collate = collate or _default_collate
        self.prefetch = prefetch
        self.drop_last = drop_last
        # resume fast-forward: consume this many leading batches at the
        # SAMPLER level (indices only — no dataset reads / image decodes),
        # so resume cost is O(1) per skipped step, not linear in data volume.
        # May also be set after construction, before the first next().
        self.skip_batches = skip_batches
        self._native_images = None
        if (
            _siss_batcher is not None
            and collate is None
            and getattr(dataset, "normalize", False)
            and getattr(dataset, "images", None) is not None
            and isinstance(dataset.images, np.ndarray)
            and dataset.images.dtype == np.uint8
            and dataset.images.ndim == 4
            and dataset.images.flags["C_CONTIGUOUS"]
        ):
            self._native_images = dataset.images

    def _batches(self) -> Iterator[Any]:
        buf = []
        to_skip = int(self.skip_batches) * self.batch_size
        for idx in self.sampler:
            if to_skip > 0:
                to_skip -= 1
                continue
            buf.append(idx if self._native_images is not None else self.dataset[idx])
            if len(buf) == self.batch_size:
                if self._native_images is not None:
                    yield _siss_batcher.assemble(
                        self._native_images, np.asarray(buf, np.int64), True)
                else:
                    yield self.collate(buf)
                buf = []
        # finite sampler tail (RepeatedSampler is finite)
        if buf and not self.drop_last:
            if self._native_images is not None:
                yield _siss_batcher.assemble(self._native_images, np.asarray(buf, np.int64), True)
            else:
                yield self.collate(buf)

    def __iter__(self) -> Iterator[Any]:
        if self.prefetch <= 0:
            yield from self._batches()
            return
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        _SENTINEL = object()
        stop = threading.Event()

        def put(item) -> bool:
            # bounded put that re-checks stop so an abandoned iterator
            # can't leave the worker blocked forever on a full queue
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for b in self._batches():
                    if not put(b):
                        return
                put(_SENTINEL)
            except BaseException as e:  # surface dataset errors to the consumer
                put((_SENTINEL, e))

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                b = q.get()
                if b is _SENTINEL:
                    return
                if isinstance(b, tuple) and len(b) == 2 and b[0] is _SENTINEL:
                    raise RuntimeError("BatchLoader worker failed") from b[1]
                yield b
        finally:
            stop.set()
            # unblock a worker waiting on a full queue
            while not q.empty():
                try:
                    q.get_nowait()
                except queue.Empty:
                    break


def _default_collate(items):
    first = items[0]
    if isinstance(first, tuple):
        return tuple(np.stack([it[i] for it in items]) for i in range(len(first)))
    return np.stack(items)


def dual_stream(keep_iter: Iterator, forget_iter: Iterator, accum_steps: int) -> Iterator[dict]:
    """Zip the keep/forget loaders into [A, mb, ...] microbatched step inputs
    (the reference's dual infinite dataloaders, ``delete_tshirt.py:272-288``,
    folded into the scan axis of the jitted step)."""
    while True:
        keep = np.stack([next(keep_iter) for _ in range(accum_steps)])
        forget = np.stack([next(forget_iter) for _ in range(accum_steps)])
        yield {"all": keep, "deletion": forget}
