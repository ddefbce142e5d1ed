#!/usr/bin/env python
"""Export a siss_tpu orbax checkpoint bundle back to HF-diffusers format.

The inverse of ``scripts/convert_hf_checkpoint.py``: takes a training
bundle (``checkpoint-N/`` with orbax ``unet``/``unet_ema`` items, as written
by every task) and writes diffusers model directories
(``config.json`` + ``diffusion_pytorch_model.safetensors``, modern ≥0.18
parameter names) that ``diffusers.UNet2DModel.from_pretrained`` /
``UNet2DConditionModel.from_pretrained`` load directly — the same artifact
contract as the reference's checkpoint hooks (``delete_celeb.py:137-147``).

Examples:
  # celeb-256 unlearning bundle → diffusers
  python scripts/export_diffusers_checkpoint.py \
      --checkpoint checkpoints/celeb/deletion/checkpoint-60 \
      --preset celebahq_256 --out exported/celeb60

  # SD bundle, tiny MNIST pretrain, or a custom arch from the run config
  python scripts/export_diffusers_checkpoint.py \
      --checkpoint runs/base/<run>/checkpoint-35 --preset sd_v1 --out exported/sd
  python scripts/export_diffusers_checkpoint.py \
      --checkpoint <bundle> --run-config runs/base/<run>/config.json --out exported/run
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_model(preset: str | None, run_config: str | None):
    from siss_tpu.models.unet2d import UNet2D, UNet2DConfig

    if run_config:
        with open(run_config) as f:
            cfg = json.load(f)
        node = dict(cfg.get("unet") or {})
        target = node.pop("_target_", "siss_tpu.models.unet2d.UNet2DConfig")
        from siss_tpu.config.core import get_object

        fn = get_object(target)
        for k in ("block_out_channels", "down_block_types", "up_block_types"):
            if k in node and isinstance(node[k], list):
                node[k] = tuple(node[k])
        ucfg = fn(**node)
        if type(ucfg).__name__ == "UNet2DConditionConfig":
            from siss_tpu.models.unet2d_cond import UNet2DCondition

            return UNet2DCondition(ucfg)
        return UNet2D(ucfg)

    if preset in ("celebahq_256", "mnist_tshirt"):
        return UNet2D(getattr(UNet2DConfig, preset)())
    if preset in ("sd_v1", "sd_tiny"):
        from siss_tpu.models.unet2d_cond import UNet2DCondition, UNet2DConditionConfig

        ucfg = (UNet2DConditionConfig.sd_v1() if preset == "sd_v1"
                else UNet2DConditionConfig.tiny())
        return UNet2DCondition(ucfg)
    raise SystemExit(f"Unknown --preset {preset!r}; pass --run-config for custom archs")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__,
                                 formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--checkpoint", required=True,
                    help="bundle dir (checkpoint-N) containing orbax unet/unet_ema items")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--preset", default=None,
                    choices=["celebahq_256", "mnist_tshirt", "sd_v1", "sd_tiny"],
                    help="architecture preset (or use --run-config)")
    ap.add_argument("--run-config", default=None,
                    help="a run's config.json; its unet node defines the architecture")
    ap.add_argument("--items", nargs="+", default=["unet", "unet_ema"],
                    help="bundle items to export (default: unet unet_ema)")
    args = ap.parse_args()
    if not args.preset and not args.run_config:
        ap.error("one of --preset / --run-config is required")

    from siss_tpu.utils.export import export_bundle_to_diffusers

    model = build_model(args.preset, args.run_config)
    written = export_bundle_to_diffusers(args.checkpoint, model, args.out,
                                         items=tuple(args.items))
    for item, path in written.items():
        print(f"[export] {item} -> {path}")


if __name__ == "__main__":
    main()
