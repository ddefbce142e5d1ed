#!/usr/bin/env python
"""Build the MNIST+t-shirt dataset npz (classes 0-9 digits + class 10
t-shirt) — script equivalent of the reference's
``notebooks/tshirtdataset.ipynb`` which assembles
``claserken/mnist-with-tshirt`` from MNIST + FashionMNIST.

Sources, in order of preference:
1. ``--hf claserken/mnist-with-tshirt`` via HF datasets (needs a local cache
   in offline environments),
2. local MNIST/FashionMNIST idx files (``--mnist-dir``),
3. synthetic glyphs (zero-egress default; structurally equivalent).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _read_idx(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        data = f.read()
    magic = int.from_bytes(data[:4], "big")
    ndim = magic & 0xFF
    dims = [int.from_bytes(data[4 + 4 * i:8 + 4 * i], "big") for i in range(ndim)]
    return np.frombuffer(data, np.uint8, offset=4 + 4 * ndim).reshape(dims)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="data/datasets/mnist_with_tshirt.npz")
    p.add_argument("--hf", default=None, help="HF dataset name (e.g. claserken/mnist-with-tshirt)")
    p.add_argument("--mnist-dir", default=None, help="dir with MNIST+FashionMNIST idx files")
    p.add_argument("--n-per-class", type=int, default=512, help="synthetic fallback size")
    args = p.parse_args()

    images = labels = None
    if args.hf:
        import datasets as hfds

        ds = hfds.load_dataset(args.hf, split="train")
        images = np.stack([np.asarray(x)[..., None] for x in ds["image"]])
        labels = np.asarray(ds["label"])
    elif args.mnist_dir:
        mi = _read_idx(os.path.join(args.mnist_dir, "train-images-idx3-ubyte"))
        ml = _read_idx(os.path.join(args.mnist_dir, "train-labels-idx1-ubyte"))
        fi = _read_idx(os.path.join(args.mnist_dir, "fashion-train-images-idx3-ubyte"))
        fl = _read_idx(os.path.join(args.mnist_dir, "fashion-train-labels-idx1-ubyte"))
        tshirts = fi[fl == 0]  # FashionMNIST class 0 = t-shirt/top
        images = np.concatenate([mi, tshirts])[..., None]
        labels = np.concatenate([ml.astype(np.int64), np.full(len(tshirts), 10)])
    else:
        from siss_tpu.data import make_synthetic_mnist_tshirt

        images, labels = make_synthetic_mnist_tshirt(n_per_class=args.n_per_class)
        print("NOTE: synthetic glyph dataset (no MNIST source available)")

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    np.savez_compressed(args.out, images=images, labels=labels)
    # also emit the canonical tshirt.png used by the L2 detector
    # (reference ``config/delete_tshirt.yaml: metrics.classifier.tshirt_path``)
    from PIL import Image

    tshirt = images[labels == 10][0][..., 0]
    Image.fromarray(tshirt).save(os.path.join(os.path.dirname(args.out), "tshirt.png"))
    print(f"wrote {args.out}: images {images.shape}, classes {sorted(set(labels.tolist()))}")


if __name__ == "__main__":
    main()
