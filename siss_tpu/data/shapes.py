"""CLEVR-style shapes dataset (legacy experiment parity).

Equivalent of the reference's ``data/src/shapes_dataset.py:14-83``: globs
rendered shape images by (shape, color, size) configuration directories,
with include/exclude filtering of configurations. Unused by the shipped
configs (as in the reference) but kept for experiment parity.
"""

from __future__ import annotations

import glob
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

from siss_tpu.data.datasets import normalize_to_unit_range, _to_nhwc


class ShapesDataset:
    def __init__(self, data_path: str, include_configs: Optional[Sequence[str]] = None,
                 exclude_configs: Optional[Sequence[str]] = None, normalize: bool = True):
        """``data_path/<config>/<image files>`` where config names encode
        shape attributes (e.g. ``red_cube_large``)."""
        configs = sorted(
            d for d in os.listdir(data_path) if os.path.isdir(os.path.join(data_path, d))
        )
        if include_configs is not None:
            configs = [c for c in configs if c in set(include_configs)]
        if exclude_configs is not None:
            configs = [c for c in configs if c not in set(exclude_configs)]
        self.files: List[Tuple[str, str]] = []
        for c in configs:
            for f in sorted(glob.glob(os.path.join(data_path, c, "*"))):
                if f.lower().endswith((".png", ".jpg", ".jpeg")):
                    self.files.append((f, c))
        self.configs = configs
        self.normalize = normalize

    def __len__(self) -> int:
        return len(self.files)

    def __getitem__(self, idx: int) -> np.ndarray:
        from PIL import Image

        path, _ = self.files[idx]
        img = _to_nhwc(np.asarray(Image.open(path)))
        return normalize_to_unit_range(img) if self.normalize else np.asarray(img, np.float32)

    def config_of(self, idx: int) -> str:
        return self.files[idx][1]
