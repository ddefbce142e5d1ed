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


def convert_celeb(src: str, dst: str, config=None):
    """``config`` (a ``UNet2DConfig``) overrides the default
    google/ddpm-celebahq-256 architecture — used by the snapshot-pipeline
    tests to drive the identical disk→orbax path at tiny size."""
    import jax
    import orbax.checkpoint as ocp

    from siss_tpu.models import UNet2D, UNet2DConfig
    from siss_tpu.utils.hf_convert import import_hf_unet

    model = UNet2D(config or UNet2DConfig.celebahq_256())
    template = model.init_params(jax.random.PRNGKey(0))
    unet_dir = os.path.join(src, "unet") if os.path.isdir(os.path.join(src, "unet")) else src
    params = import_hf_unet(unet_dir, template)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(dst), params)
    print(f"saved celeb UNet params → {dst}")


def convert_sd(src: str, dst: str, variant: str = "sd_v1"):
    """``variant``: "sd_v1" (real SD-1.x snapshot) or "tiny" (the test
    architectures — exercises the identical disk→orbax path)."""
    import jax
    import orbax.checkpoint as ocp

    from siss_tpu.models.unet2d_cond import UNet2DCondition, UNet2DConditionConfig
    from siss_tpu.models.vae import AutoencoderKL, AutoencoderKLConfig
    from siss_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
    from siss_tpu.utils.hf_convert import load_torch_state_dict
    from siss_tpu.utils.sd_convert import convert_sd_unet, convert_vae, convert_clip_text

    with ocp.StandardCheckpointer() as ckptr:
        unet = UNet2DCondition(getattr(UNet2DConditionConfig, variant)())
        template = unet.init_params(jax.random.PRNGKey(0))
        params = convert_sd_unet(load_torch_state_dict(os.path.join(src, "unet")), template)
        ckptr.save(os.path.abspath(os.path.join(dst, "unet")), params)

        vae = AutoencoderKL(getattr(AutoencoderKLConfig, variant)())
        template = vae.init_params(jax.random.PRNGKey(0))
        params = convert_vae(load_torch_state_dict(os.path.join(src, "vae")), template)
        ckptr.save(os.path.abspath(os.path.join(dst, "vae")), params)

        text = CLIPTextModel(getattr(CLIPTextConfig, variant)())
        template = text.init_params(jax.random.PRNGKey(0))
        params = convert_clip_text(load_torch_state_dict(os.path.join(src, "text_encoder")), template)
        ckptr.save(os.path.abspath(os.path.join(dst, "text_encoder")), params)
    print(f"saved SD unet/vae/text_encoder params → {dst}")


def convert_clip(src: str, dst: str):
    """openai/clip-vit-large-patch14 snapshot → vision+text orbax params +
    CLIP-IQA anchor embeddings ("Good photo."/"Bad photo.")."""
    import jax
    import numpy as np
    import orbax.checkpoint as ocp

    from siss_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
    from siss_tpu.models.clip_vision import CLIPVisionConfig, CLIPVisionModel
    from siss_tpu.utils.hf_convert import load_torch_state_dict
    from siss_tpu.utils.sd_convert import convert_clip_text, convert_clip_vision

    sd = load_torch_state_dict(src)
    with ocp.StandardCheckpointer() as ckptr:
        vision = CLIPVisionModel(CLIPVisionConfig.vit_l14())
        vparams = convert_clip_vision(sd, vision.init_params(jax.random.PRNGKey(0)))
        ckptr.save(os.path.abspath(os.path.join(dst, "vision")), vparams)

        text = CLIPTextModel(CLIPTextConfig.sd_v1())
        tparams = convert_clip_text(sd, text.init_params(jax.random.PRNGKey(1)))
        ckptr.save(os.path.abspath(os.path.join(dst, "text")), tparams)

    # anchors need text_projection + tokenizer (native BPE when the
    # snapshot ships vocab.json/merges.txt, which CLIP snapshots do)
    try:
        import jax.numpy as jnp

        from siss_tpu.models.clip_text import load_clip_tokenizer

        tok = load_clip_tokenizer(src)
        if tok is None:
            raise FileNotFoundError(f"no vocab.json/merges.txt under {src}")
        proj = np.asarray(sd["text_projection.weight"]).T  # [hidden, proj]

        def embed(prompt):
            ids = tok(prompt, padding="max_length", max_length=77,
                      truncation=True, return_tensors="np").input_ids
            h = text.apply({"params": tparams}, jnp.asarray(ids))
            eot = int(np.asarray(ids[0]).argmax())  # EOT has the highest id
            return np.asarray(h[0, eot]) @ proj

        np.savez(os.path.join(dst, "iqa_anchors.npz"),
                 good=embed("Good photo."), bad=embed("Bad photo."))
        print("wrote CLIP-IQA anchors")
    except Exception as e:
        print(f"anchors skipped ({e}); CLIP-IQA needs tokenizer+text_projection")
    print(f"saved CLIP vision/text params → {dst}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", choices=["celeb", "sd", "clip"], required=True)
    p.add_argument("--src", required=True)
    p.add_argument("--dst", required=True)
    p.add_argument("--variant", default=None,
                   help="SD architecture variant (sd_v1 [default] or tiny)")
    args = p.parse_args()
    if args.model == "celeb":
        convert_celeb(args.src, args.dst)
    elif args.model == "sd":
        convert_sd(args.src, args.dst, args.variant or "sd_v1")
    else:
        convert_clip(args.src, args.dst)


if __name__ == "__main__":
    main()
