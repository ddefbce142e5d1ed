"""Experiment tracking with the reference's wandb metric surface.

The reference logs through wandb/tensorboard via Accelerate trackers plus
direct ``wandb.log`` calls (``delete_celeb.py:112-114,663,748``; namespaces
documented in SURVEY.md §5). This tracker keeps the exact key schema
(``loss_x/mean``, ``gradient/scaling_factor``, ``metrics/fid``, image
panels, summary keys like ``deletion_steps``) and writes to:

* wandb, when installed and requested (drop-in),
* always: a JSONL stream (``metrics.jsonl``) + PNG image panels under
  ``output_dir`` — so runs are comparable in offline/TPU-pod environments.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional

import numpy as np


def _to_scalar(v):
    if isinstance(v, (int, float, str, bool)) or v is None:
        return v
    arr = np.asarray(v)
    if arr.size == 1:
        return arr.item()
    return arr.tolist()


class Tracker:
    def __init__(self, project_name: str, output_dir: str, logger: str = "jsonl",
                 config: Optional[Dict[str, Any]] = None, main_process: bool = True):
        self.project_name = project_name
        self.output_dir = output_dir
        self.main_process = main_process
        self.summary: Dict[str, Any] = {}
        self._wandb = None
        self._jsonl = None
        if not main_process:
            return
        os.makedirs(output_dir, exist_ok=True)
        self._jsonl = open(os.path.join(output_dir, "metrics.jsonl"), "a", buffering=1)
        if logger == "wandb":
            try:
                import wandb

                self._wandb = wandb.init(project=project_name, dir=output_dir, config=config or {})
            except Exception:
                self._wandb = None  # offline envs fall back to jsonl silently
        if config is not None:
            with open(os.path.join(output_dir, "config.json"), "w") as f:
                json.dump(config, f, indent=2, default=str)

    def log(self, metrics: Dict[str, Any], step: Optional[int] = None):
        if not self.main_process:
            return
        record = {k: _to_scalar(v) for k, v in metrics.items()}
        record["_step"] = step
        record["_time"] = time.time()
        self._jsonl.write(json.dumps(record) + "\n")
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def log_images(self, name: str, images: np.ndarray, step: Optional[int] = None,
                   captions=None):
        """images: [N,H,W,C] float [0,1] or a single grid [H,W,C]."""
        if not self.main_process:
            return
        from PIL import Image

        safe = name.replace("/", "_").replace(" ", "_")
        img_dir = os.path.join(self.output_dir, "images")
        os.makedirs(img_dir, exist_ok=True)
        arr = np.asarray(images)
        if arr.ndim == 3:
            arr = arr[None]
        paths = []
        for i, im in enumerate(arr):
            im8 = (np.clip(im, 0, 1) * 255).astype(np.uint8)
            if im8.shape[-1] == 1:
                im8 = im8[..., 0]
            p = os.path.join(img_dir, f"{safe}_step{step}_{i}.png")
            Image.fromarray(im8).save(p)
            paths.append(p)
        self.log({f"{name}/files": paths}, step=step)
        if self._wandb is not None:
            import wandb

            self._wandb.log({name: [wandb.Image(p, caption=(captions[i] if captions else None))
                                    for i, p in enumerate(paths)]}, step=step)

    def log_line_series(self, name: str, xs, ys, keys=None, title: str = "",
                        xname: str = "x", step: Optional[int] = None):
        """wandb ``plot.line_series`` panel (the reference's per-timestep
        noise-norm curves, ``delete_sd.py:292-298``); always mirrored into
        the JSONL stream so offline runs keep the full curves."""
        if not self.main_process:
            return
        record = {
            "_panel": "line_series", "_name": name, "_title": title,
            "_xname": xname, "xs": [_to_scalar(x) for x in xs],
            "ys": [[_to_scalar(y) for y in series] for series in ys],
            "keys": list(keys) if keys is not None else None,
            "_step": step, "_time": time.time(),
        }
        self._jsonl.write(json.dumps(record) + "\n")
        if self._wandb is not None:
            import wandb

            self._wandb.log(
                {name: wandb.plot.line_series(xs=list(xs), ys=[list(s) for s in ys],
                                              keys=keys, title=title, xname=xname)},
                step=step)

    def log_summary(self, key: str, value: Any):
        """wandb run.summary equivalent (``delete_celeb.py:496``)."""
        if not self.main_process:
            return
        self.summary[key] = _to_scalar(value)
        with open(os.path.join(self.output_dir, "summary.json"), "w") as f:
            json.dump(self.summary, f, indent=2)
        if self._wandb is not None:
            self._wandb.summary[key] = value

    def finish(self):
        if not self.main_process:
            return
        if self._jsonl:
            self._jsonl.close()
        if self._wandb is not None:
            self._wandb.finish()
