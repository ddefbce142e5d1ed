#!/usr/bin/env python
"""Convert HF diffusers checkpoints to siss_tpu orbax params.

Usage:
  # google/ddpm-celebahq-256 (downloaded snapshot dir with unet/ subfolder)
  python scripts/convert_hf_checkpoint.py --model celeb \
      --src /path/to/ddpm-celebahq-256 --dst checkpoints/celeb/base

  # Stable Diffusion 1.x snapshot (unet/ vae/ text_encoder/ subfolders)
  python scripts/convert_hf_checkpoint.py --model sd \
      --src /path/to/stable-diffusion-v1-4 --dst checkpoints/sd14

The reference loads these via ``from_pretrained`` at runtime
(``delete_celeb.py:181``, ``delete_sd.py:411-468``); we convert once,
offline, into orbax trees the tasks restore directly.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def convert_celeb(src: str, dst: str):
    import jax
    import orbax.checkpoint as ocp

    from siss_tpu.models import UNet2D, UNet2DConfig
    from siss_tpu.utils.hf_convert import import_hf_unet

    model = UNet2D(UNet2DConfig.celebahq_256())
    template = model.init_params(jax.random.PRNGKey(0))
    unet_dir = os.path.join(src, "unet") if os.path.isdir(os.path.join(src, "unet")) else src
    params = import_hf_unet(unet_dir, template)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(dst), params)
    print(f"saved celeb UNet params → {dst}")


def convert_sd(src: str, dst: str):
    import jax
    import orbax.checkpoint as ocp

    from siss_tpu.models.unet2d_cond import UNet2DCondition, UNet2DConditionConfig
    from siss_tpu.models.vae import AutoencoderKL, AutoencoderKLConfig
    from siss_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
    from siss_tpu.utils.hf_convert import import_hf_unet, load_torch_state_dict
    from siss_tpu.utils.sd_convert import convert_sd_unet, convert_vae, convert_clip_text

    with ocp.StandardCheckpointer() as ckptr:
        unet = UNet2DCondition(UNet2DConditionConfig.sd_v1())
        template = unet.init_params(jax.random.PRNGKey(0))
        params = convert_sd_unet(load_torch_state_dict(os.path.join(src, "unet")), template)
        ckptr.save(os.path.abspath(os.path.join(dst, "unet")), params)

        vae = AutoencoderKL(AutoencoderKLConfig.sd_v1())
        template = vae.init_params(jax.random.PRNGKey(0))
        params = convert_vae(load_torch_state_dict(os.path.join(src, "vae")), template)
        ckptr.save(os.path.abspath(os.path.join(dst, "vae")), params)

        text = CLIPTextModel(CLIPTextConfig.sd_v1())
        template = text.init_params(jax.random.PRNGKey(0))
        params = convert_clip_text(load_torch_state_dict(os.path.join(src, "text_encoder")), template)
        ckptr.save(os.path.abspath(os.path.join(dst, "text_encoder")), params)
    print(f"saved SD unet/vae/text_encoder params → {dst}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", choices=["celeb", "sd"], required=True)
    p.add_argument("--src", required=True)
    p.add_argument("--dst", required=True)
    args = p.parse_args()
    if args.model == "celeb":
        convert_celeb(args.src, args.dst)
    else:
        convert_sd(args.src, args.dst)


if __name__ == "__main__":
    main()
