#!/usr/bin/env python
"""Record activation goldens for the external-model converter towers
(VERDICT r4 next #7). Run ONCE with torch + transformers available:

    python scripts/make_tower_goldens.py

For each tower the torch model is filled with weights synthesized purely
from state-dict KEY NAMES (``tests/tower_goldens.synth_tensor``), a fixed
input is forward-run, and ``{meta, inputs, features}`` is committed to
``tests/goldens/``. The matching fast-tier tests
(``tests/test_tower_goldens.py``) regenerate the same weights WITHOUT
torch, push them through the flax converters, and require the recorded
features — pinning the converter paths against a frozen torch reference
instead of a same-process comparison.

Towers: torchvision-layout InceptionV3 trunk (both pooling variants —
the reference's FID input, ``/root/reference/metrics/fid.py:10-69``) and
the HF CLIP vision tower + projection (CLIP-IQA's embedder,
``/root/reference/delete_sd.py:222-223``). SSCD has no converter to pin:
the reference consumes an external TorchScript artifact directly
(``/root/reference/delete_sd.py:227-228``) and so does
``siss_tpu/metrics/sscd.py`` — with the artifact absent offline there is
no weight-routing path to golden-test (its scoring math is covered by
``tests/test_sd_acceptance_metrics.py``).
"""

from __future__ import annotations

import pathlib
import sys

import numpy as np
import torch

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from tests.tower_goldens import save_golden, synth_state_dict  # noqa: E402

OUT = REPO / "tests" / "goldens"


def make_inception():
    from tests.test_inception_parity import TorchInceptionTrunk

    rng = np.random.default_rng(0)
    imgs = rng.uniform(-1, 1, (2, 299, 299, 3)).astype(np.float32)
    for variant in ("torchvision", "fid"):
        model = TorchInceptionTrunk(fid=variant == "fid").eval()
        meta = {k: tuple(v.shape) for k, v in model.state_dict().items()
                if "num_batches_tracked" not in k}
        sd = synth_state_dict(meta)
        model.load_state_dict({k: torch.from_numpy(v) for k, v in sd.items()},
                              strict=False)
        with torch.no_grad():
            feats = model(torch.from_numpy(imgs.transpose(0, 3, 1, 2))).numpy()
        assert np.isfinite(feats).all()
        path = OUT / f"inception_{variant}_golden.npz"
        save_golden(path, meta, imgs, feats)
        print(f"wrote {path} ({path.stat().st_size} bytes), "
              f"feat range [{feats.min():.3g}, {feats.max():.3g}]")


def make_clip_vision():
    import transformers

    from siss_tpu.models.clip_vision import CLIPVisionConfig

    cfg = CLIPVisionConfig.tiny()
    hf_cfg = transformers.CLIPVisionConfig(
        image_size=cfg.image_size, patch_size=cfg.patch_size,
        hidden_size=cfg.hidden_size, num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads, intermediate_size=cfg.intermediate_size,
        projection_dim=cfg.projection_dim, hidden_act="quick_gelu",
    )
    model = transformers.CLIPVisionModelWithProjection(hf_cfg).eval()
    meta = {k: tuple(v.shape) for k, v in model.state_dict().items()}
    sd = synth_state_dict(meta)
    model.load_state_dict({k: torch.from_numpy(v) for k, v in sd.items()})
    rng = np.random.default_rng(0)
    imgs = rng.standard_normal((2, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    with torch.no_grad():
        feats = model(torch.from_numpy(imgs.transpose(0, 3, 1, 2))).image_embeds.numpy()
    assert np.isfinite(feats).all()
    path = OUT / "clip_vision_golden.npz"
    save_golden(path, meta, imgs, feats)
    print(f"wrote {path} ({path.stat().st_size} bytes), "
          f"feat range [{feats.min():.3g}, {feats.max():.3g}]")


if __name__ == "__main__":
    OUT.mkdir(exist_ok=True)
    make_inception()
    make_clip_vision()
