#!/usr/bin/env python
"""Measure the native C++ batch assembler against the numpy path.

Two questions (BASELINE.md / VERDICT r2 weak #7):
1. Host batch-assembly latency: gather bs images from a uint8 array and
   convert to [-1,1] float32 — native (multi-threaded, GIL released) vs
   numpy (fancy-index + arithmetic).
2. Does assembly overlap a busy Python main thread (the trainer's dispatch
   loop)? Measured as main-thread Python op throughput while a background
   thread assembles continuously — the GIL-release benefit that lets the
   prefetch thread work while the trainer drives the TPU.

    python scripts/bench_batcher.py [--batch-size 64] [--size 256]
"""

import argparse
import json
import threading
import time

import numpy as np


def numpy_assemble(images, idx):
    return images[idx].astype(np.float32) / 127.5 - 1.0


def bench_latency(fn, images, idx, iters=30):
    fn(images, idx)  # warmup
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn(images, idx)
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def bench_gil_overlap(fn, images, idx, duration=2.0):
    """Python-ops/sec on the main thread while a worker assembles in a loop
    (higher = assembly interferes less with the dispatch thread)."""
    stop = threading.Event()

    def worker():
        while not stop.is_set():
            fn(images, idx)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    count, t0 = 0, time.perf_counter()
    while time.perf_counter() - t0 < duration:
        count += 1  # pure-Python op; rate collapses if the GIL is held
    stop.set()
    t.join()
    return count / duration


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--n-images", type=int, default=512)
    args = p.parse_args()

    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, (args.n_images, args.size, args.size, 3), dtype=np.uint8)
    idx = rng.integers(0, args.n_images, args.batch_size).astype(np.int64)

    try:
        from siss_tpu import _siss_batcher

        native = lambda im, ix: _siss_batcher.assemble(im, ix, True)  # noqa: E731
    except ImportError:
        raise SystemExit("native extension not built; run scripts/build_native.py")

    # parity first — a fast wrong answer is worthless
    np.testing.assert_allclose(native(images, idx), numpy_assemble(images, idx), atol=1e-6)

    lat_native = bench_latency(native, images, idx)
    lat_numpy = bench_latency(numpy_assemble, images, idx)

    base_rate = bench_gil_overlap(lambda im, ix: None, images, idx)  # idle worker
    rate_native = bench_gil_overlap(native, images, idx)
    rate_numpy = bench_gil_overlap(numpy_assemble, images, idx)

    print(json.dumps({
        "batch": f"{args.batch_size}x{args.size}x{args.size}x3",
        "assemble_ms_native": round(lat_native * 1e3, 3),
        "assemble_ms_numpy": round(lat_numpy * 1e3, 3),
        "speedup": round(lat_numpy / lat_native, 2),
        "mainthread_ops_frac_native": round(rate_native / base_rate, 3),
        "mainthread_ops_frac_numpy": round(rate_numpy / base_rate, 3),
    }, indent=2))


if __name__ == "__main__":
    main()
