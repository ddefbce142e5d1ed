#!/usr/bin/env python
"""SSCD copy-detection scoring — script equivalent of
``notebooks/sscd.ipynb``: cosine similarity of generated images against a
memorized target image using the external SSCD TorchScript model.

  python examples/sscd_score.py --model sscd_disc_mixup.torchscript.pt \
      --target mem.png --images gen1.png gen2.png
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True)
    p.add_argument("--target", required=True)
    p.add_argument("--images", nargs="+", required=True)
    args = p.parse_args()

    from PIL import Image

    from siss_tpu.metrics.sscd import SSCDEvaluator

    sscd = SSCDEvaluator.load(args.model)
    if sscd is None:
        raise SystemExit(1)

    def load(path):
        return np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0

    target = load(args.target)
    imgs = np.stack([load(p) for p in args.images])
    sims = sscd.similarities(imgs, target)
    for path, s in zip(args.images, np.atleast_1d(sims)):
        print(f"{path}: sscd={s:.4f}")


if __name__ == "__main__":
    main()
