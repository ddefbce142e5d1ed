#!/usr/bin/env python
"""Membership-loss-vs-timestep curve — the reference's
``metrics.membership_loss.plot_params`` path (``delete_celeb.py:443-462``):
plot the keep-set membership loss across timesteps to find the
"Goldilocks zone" golden timestep.

  python examples/membership_curve.py --checkpoint ... --npz data.npz --out curve.png
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--subfolder", default="unet")
    p.add_argument("--npz", required=True, help="mnist_with_tshirt.npz")
    p.add_argument("--class-label", type=int, default=10)
    p.add_argument("--time-frequency", type=int, default=50)
    p.add_argument("--num-images", type=int, default=32)
    p.add_argument("--num-noises", type=int, default=16)
    p.add_argument("--out", default="membership_curve.png")
    args = p.parse_args()

    from siss_tpu.data import LabeledImageDataset
    from siss_tpu.diffusion import NoiseSchedule
    from siss_tpu.metrics import MembershipLoss
    from siss_tpu.models import UNet2D, UNet2DConfig
    from siss_tpu.utils import CheckpointManager

    ds_all = LabeledImageDataset.from_npz("nondeletion", args.npz, class_to_remove=args.class_label)
    ds_del = LabeledImageDataset.from_npz("deletion", args.npz, class_to_remove=args.class_label)

    model = UNet2D(UNet2DConfig.mnist_tshirt())
    params = model.init_params(jax.random.PRNGKey(0))
    mgr = CheckpointManager(os.path.dirname(args.checkpoint) or ".")
    params = mgr.restore_item(args.checkpoint, args.subfolder, params)

    schedule = NoiseSchedule.create(1000, "linear")

    def eps_apply(p_, x, t, cond):
        return model.apply({"params": p_}, x, t)

    ml = MembershipLoss(eps_apply, schedule, ds_all, ds_del,
                        args.num_images, args.num_noises, eval_batch_size=512)
    ml.sample_images()
    ml.sample_noises()
    timesteps = list(range(0, 1000, args.time_frequency))
    losses = ml.compute_membership_losses(params, timesteps)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots()
    ax.plot(timesteps, [l[0] for l in losses], label="all")
    ax.plot(timesteps, [l[1] for l in losses], label="deletion")
    ax.set_xlabel("Timestep")
    ax.set_ylabel("Membership loss")
    ax.set_title("Loss over time")
    ax.legend()
    plt.savefig(args.out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
