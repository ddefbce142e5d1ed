#!/usr/bin/env python
"""Sample grids from a (possibly unlearned) CelebA-HQ checkpoint — script
equivalent of ``notebooks/celeb_sampler.ipynb`` / ``celebrity.ipynb``.

  python examples/celeb_sampler.py --checkpoint checkpoints/celeb/base \
      --n 16 --steps 50 --out samples.png
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True, help="orbax params dir or checkpoint bundle")
    p.add_argument("--subfolder", default="unet")
    p.add_argument("--n", type=int, default=16)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="celeb_samples.png")
    args = p.parse_args()

    from siss_tpu.diffusion import NoiseSchedule
    from siss_tpu.evaluate import Evaluator
    from siss_tpu.models import UNet2D, UNet2DConfig
    from siss_tpu.utils import CheckpointManager

    import jax.numpy as jnp

    model = UNet2D(UNet2DConfig.celebahq_256(), dtype=jnp.bfloat16)
    params = model.init_params(jax.random.PRNGKey(0))
    if os.path.isdir(os.path.join(args.checkpoint, args.subfolder)):
        mgr = CheckpointManager(os.path.dirname(args.checkpoint) or ".")
        params = mgr.restore_item(args.checkpoint, args.subfolder, params)
    else:
        import orbax.checkpoint as ocp

        with ocp.StandardCheckpointer() as ckptr:
            params = ckptr.restore(os.path.abspath(args.checkpoint), params)

    schedule = NoiseSchedule.create(1000, "linear")

    def eps_apply(p, x, t, cond):
        return model.apply({"params": p}, x, t)

    ev = Evaluator(eps_apply, schedule, (256, 256, 3), num_inference_steps=args.steps,
                   random_seed=args.seed)
    imgs = ev.sample_images(params, args.n, set_generator=True)
    grid = Evaluator.make_grid_from_images(imgs)
    from PIL import Image

    Image.fromarray((np.clip(grid, 0, 1) * 255).astype(np.uint8)).save(args.out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
