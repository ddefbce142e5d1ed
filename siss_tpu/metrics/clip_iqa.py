"""CLIP-IQA image quality score (``delete_sd.py:24,222-223,264-267``).

The reference instantiates torchmetrics' ``CLIPImageQualityAssessment``
(CLIP similarity against "Good photo."/"Bad photo." anchor prompts,
softmax'd). We compute the same score with our flax CLIP text tower plus a
CLIP vision tower when converted weights are available locally; otherwise
the metric reports unavailable (the reference config also ships it off,
``config/delete_sd.yaml:40``).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

_CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
_CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


class CLIPIQA:
    """score(imgs) = E softmax(cos(img, "Good photo."), cos(img, "Bad photo."))[good]."""

    def __init__(self, image_embed_fn, good_embed: np.ndarray, bad_embed: np.ndarray):
        self.image_embed_fn = image_embed_fn
        anchors = np.stack([good_embed, bad_embed])
        self.anchors = anchors / np.linalg.norm(anchors, axis=-1, keepdims=True)

    @classmethod
    def try_load(cls, model_dir: Optional[str] = None) -> Optional["CLIPIQA"]:
        """Needs a converted CLIP (vision tower + text tower + projections)
        under ``model_dir`` (orbax dirs 'vision', 'text', 'proj'). Returns
        None when absent — callers treat the metric as disabled."""
        model_dir = model_dir or os.environ.get("SISS_CLIP_DIR", "checkpoints/clip")
        if not os.path.isdir(model_dir):
            print(f"[clip_iqa] no CLIP weights under {model_dir}; metric disabled")
            return None
        try:
            import orbax.checkpoint as ocp

            from siss_tpu.models.clip_vision import CLIPVisionConfig, CLIPVisionModel

            vision = CLIPVisionModel(CLIPVisionConfig.vit_l14())
            with ocp.StandardCheckpointer() as ckptr:
                vparams = ckptr.restore(os.path.abspath(os.path.join(model_dir, "vision")),
                                        vision.init_params(jax.random.PRNGKey(0)))
                anchors = np.load(os.path.join(model_dir, "iqa_anchors.npz"))

            @jax.jit
            def embed(imgs):
                x = (imgs - _CLIP_MEAN) / _CLIP_STD
                x = jax.image.resize(x, (x.shape[0], 224, 224, 3), "bilinear")
                e = vision.apply({"params": vparams}, x)
                return e / jnp.linalg.norm(e, axis=-1, keepdims=True)

            return cls(embed, anchors["good"], anchors["bad"])
        except Exception as e:
            print(f"[clip_iqa] unavailable ({e}); metric disabled")
            return None

    def score(self, imgs01: np.ndarray) -> float:
        e = np.asarray(self.image_embed_fn(jnp.asarray(imgs01, jnp.float32)))
        logits = 100.0 * e @ self.anchors.T  # CLIP logit scale
        probs = jax.nn.softmax(jnp.asarray(logits), axis=-1)
        return float(np.asarray(probs)[:, 0].mean())
