#!/usr/bin/env python
"""SD text-to-image inference with memorization diagnostics — script
equivalent of ``notebooks/sd-inference.ipynb`` / ``sd-reg-inference.ipynb``
/ ``sd-aug-inference.ipynb``: sample with a regular prompt or an augmented
prompt-embedding file, tracking per-step noise norms.

  python examples/sd_inference.py --model checkpoints/sd14 \
      --prompt "a photo of ..." --n 4 --out sd.png
  python examples/sd_inference.py --model checkpoints/sd14 \
      --prompt-embeds aug_prompt.npz --out sd_aug.png
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def build_pipeline(model_dir: str):
    import orbax.checkpoint as ocp

    from siss_tpu.diffusion.sd_pipeline import StableDiffusionPipeline
    from siss_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel, load_clip_tokenizer
    from siss_tpu.models.unet2d_cond import UNet2DCondition, UNet2DConditionConfig
    from siss_tpu.models.vae import AutoencoderKL, AutoencoderKLConfig

    unet = UNet2DCondition(UNet2DConditionConfig.sd_v1(), dtype=jnp.bfloat16)
    vae = AutoencoderKL(AutoencoderKLConfig.sd_v1(), dtype=jnp.bfloat16)
    text = CLIPTextModel(CLIPTextConfig.sd_v1())
    with ocp.StandardCheckpointer() as ck:
        unet_params = ck.restore(os.path.abspath(os.path.join(model_dir, "unet")),
                                 unet.init_params(jax.random.PRNGKey(0)))
        vae_params = ck.restore(os.path.abspath(os.path.join(model_dir, "vae")),
                                vae.init_params(jax.random.PRNGKey(1), image_size=64))
        text_params = ck.restore(os.path.abspath(os.path.join(model_dir, "text_encoder")),
                                 text.init_params(jax.random.PRNGKey(2)))
    return StableDiffusionPipeline(
        unet_apply=lambda p, x, t, c: unet.apply({"params": p}, x, t, c),
        unet_params=unet_params,
        vae_decode=lambda p, z: vae.apply({"params": p}, z, method=vae.decode),
        vae_params=vae_params,
        text_apply=lambda p, ids: text.apply({"params": p}, ids),
        text_params=text_params,
        tokenizer=load_clip_tokenizer(),
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True, help="converted SD dir (unet/vae/text_encoder)")
    p.add_argument("--prompt", default=None)
    p.add_argument("--prompt-embeds", default=None, help=".npz/.pt augmented prompt embeddings")
    p.add_argument("--n", type=int, default=4)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--guidance", type=float, default=7.5)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="sd_samples.png")
    args = p.parse_args()

    pipe = build_pipeline(args.model)
    if args.prompt_embeds:
        pe = pipe.load_prompt_embeds(args.prompt_embeds)
    elif args.prompt:
        pe = pipe.encode_prompt(args.prompt)
    else:
        raise SystemExit("need --prompt or --prompt-embeds")
    pe = jnp.broadcast_to(pe.reshape(1, *pe.shape[-2:]), (args.n, *pe.shape[-2:]))
    ue = jnp.broadcast_to(pipe.encode_prompt(""), pe.shape)

    imgs, norms = pipe(pe, ue, jax.random.PRNGKey(args.seed),
                       num_inference_steps=args.steps, guidance_scale=args.guidance,
                       track_noise_norm=True)
    from siss_tpu.evaluate import Evaluator
    from PIL import Image

    grid = Evaluator.make_grid_from_images(imgs)
    Image.fromarray((np.clip(grid, 0, 1) * 255).astype(np.uint8)).save(args.out)
    print(f"wrote {args.out}")
    print("text-cond noise norms per step:", np.round(norms["text_norm"].mean(axis=1), 2).tolist())


if __name__ == "__main__":
    main()
