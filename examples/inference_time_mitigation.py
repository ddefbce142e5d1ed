#!/usr/bin/env python
"""Wen et al. inference-time memorization mitigation — script equivalent of
``notebooks/inference_time_mitigation.ipynb``: inspect per-token text-cond
gradients, then optimize an augmented prompt embedding and save it for use
as ``validation_prompts[0]`` in delete_sd (the reference's ``aug_prompt.pt``
artifacts).

  python examples/inference_time_mitigation.py --model checkpoints/sd14 \
      --prompt "memorized caption ..." --iters 10 --out aug_prompt.npz
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from examples.sd_inference import build_pipeline


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True)
    p.add_argument("--prompt", required=True)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--lr", type=float, default=0.1)
    p.add_argument("--target-steps", type=int, nargs="+", default=[0])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="aug_prompt.npz")
    args = p.parse_args()

    pipe = build_pipeline(args.model)
    pe = pipe.encode_prompt(args.prompt)
    ue = pipe.encode_prompt("")

    token_grads = pipe.get_text_cond_grad(pe, ue, jax.random.PRNGKey(args.seed),
                                          target_steps=args.target_steps)
    print("per-token ∥∂‖ε_text−ε_uncond‖/∂embeds∥:", np.round(token_grads, 3).tolist())

    aug = pipe.aug_prompt(pe, ue, jax.random.PRNGKey(args.seed),
                          target_steps=args.target_steps, lr=args.lr,
                          optim_iters=args.iters)
    np.savez(args.out, embeds=np.asarray(aug))
    print(f"wrote {args.out} (shape {aug.shape})")


if __name__ == "__main__":
    main()
