#!/usr/bin/env python
"""Exact NLL (bits/dim) of images under a diffusion checkpoint via the
probability-flow ODE — script equivalent of ``notebooks/likelihood.ipynb``,
but fully on-device (no scipy host round-trips).

  python examples/likelihood_eval.py --checkpoint ... --images img1.jpg img2.jpg
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--subfolder", default="unet")
    p.add_argument("--images", nargs="+", required=True)
    p.add_argument("--arch", default="celebahq_256", choices=["celebahq_256", "mnist_tshirt"])
    p.add_argument("--method", default="rk45", choices=["rk45", "rk4"])
    args = p.parse_args()

    from PIL import Image

    from siss_tpu.diffusion import NoiseSchedule, VPSDE
    from siss_tpu.metrics.likelihood import LikelihoodEvaluator
    from siss_tpu.models import UNet2D, UNet2DConfig
    from siss_tpu.utils import CheckpointManager

    ucfg = getattr(UNet2DConfig, args.arch)()
    model = UNet2D(ucfg)
    params = model.init_params(jax.random.PRNGKey(0))
    mgr = CheckpointManager(os.path.dirname(args.checkpoint) or ".")
    params = mgr.restore_item(args.checkpoint, args.subfolder, params)

    imgs = []
    for path in args.images:
        a = np.asarray(Image.open(path), np.float32) / 255.0 * 2 - 1
        if a.ndim == 2:
            a = a[..., None]
        imgs.append(a)
    batch = jnp.asarray(np.stack(imgs))

    schedule = NoiseSchedule.create(1000, "linear")

    def eps_apply(p_, x, t, cond):
        return model.apply({"params": p_}, x, t)

    ev = LikelihoodEvaluator(eps_apply, VPSDE(), schedule=schedule, method=args.method)
    bpd, z, nfe = ev.evaluate_likelihood(params, batch)
    for path, b in zip(args.images, np.asarray(bpd)):
        print(f"{path}: {b:.4f} bits/dim  (nfe={int(nfe)})")


if __name__ == "__main__":
    main()
