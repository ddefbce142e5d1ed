"""Datasets with keep/forget filtering — numpy/NHWC, torch-free.

Re-designs of the reference's dataset trio with identical 3-way
``filter ∈ {all, deletion, nondeletion}`` semantics:

* ``ImageFolderDataset``  ← ``data/src/celeb_dataset.py`` (folder of JPEGs,
  filter against ``remove_img_names``)
* ``LabeledImageDataset`` ← ``data/src/hf_dataset.py`` (integer-labelled
  images, filter on ``label == class_to_remove``); backed by in-memory
  arrays or an ``.npz`` file, with an optional HF-datasets loader
* ``SDData``              ← ``data/src/sd_dataset.py`` (image dir + JSON
  kmeans label file, returns ``(image, label)``)

All images come back as float32 NHWC; ``normalize_to_unit_range`` maps
uint8 [0,255] → [-1,1] (the reference's ToTensor+Normalize(0.5,0.5)).
"""

from __future__ import annotations

import json
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np


def normalize_to_unit_range(img: np.ndarray) -> np.ndarray:
    """uint8 [0,255] or float [0,1] → float32 [-1,1] (ToTensor +
    Normalize(0.5, 0.5)). Integer inputs are 255-scaled by dtype — never by
    value, which would corrupt near-black images."""
    arr = np.asarray(img)
    if np.issubdtype(arr.dtype, np.integer):
        out = arr.astype(np.float32) / 255.0
    else:
        out = arr.astype(np.float32)
    return out * 2.0 - 1.0


def _to_nhwc(img: np.ndarray) -> np.ndarray:
    if img.ndim == 2:
        return img[..., None]
    return img


class ImageFolderDataset:
    """Folder-of-images dataset (CelebA-HQ style; ``celeb_dataset.py:5-35``)."""

    def __init__(self, filter: str, data_path: str, remove_img_names: Optional[Sequence[str]] = None,
                 normalize: bool = True, extensions: Tuple[str, ...] = (".jpg", ".jpeg", ".png")):
        self.data_path = data_path
        files = sorted(f for f in os.listdir(data_path) if f.lower().endswith(extensions))
        if filter == "all":
            self.image_files = files
        elif filter == "deletion":
            if remove_img_names is None:
                raise ValueError("Deletion filter requires removal class to be specified.")
            self.image_files = list(remove_img_names)
        elif filter == "nondeletion":
            if remove_img_names is None:
                raise ValueError("Nondeletion filter requires removal class to be specified.")
            remove = set(remove_img_names)
            self.image_files = [f for f in files if f not in remove]
        else:
            raise ValueError("Invalid filter.")
        self.normalize = normalize

    def __len__(self) -> int:
        return len(self.image_files)

    def __getitem__(self, idx: int) -> np.ndarray:
        from PIL import Image

        path = os.path.join(self.data_path, self.image_files[idx])
        img = _to_nhwc(np.asarray(Image.open(path)))
        return normalize_to_unit_range(img) if self.normalize else np.asarray(img, np.float32)


class ArrayDataset:
    """In-memory images (+ optional labels)."""

    def __init__(self, images: np.ndarray, labels: Optional[np.ndarray] = None, normalize: bool = False):
        self.images = images
        self.labels = labels
        self.normalize = normalize

    def __len__(self) -> int:
        return len(self.images)

    def __getitem__(self, idx: int) -> np.ndarray:
        img = _to_nhwc(np.asarray(self.images[idx]))
        return normalize_to_unit_range(img) if self.normalize else np.asarray(img, np.float32)


class LabeledImageDataset(ArrayDataset):
    """Integer-labelled image set with deletion-class filtering
    (``hf_dataset.py:4-31``). Load from arrays, an ``.npz`` with
    ``images``/``labels``, or (if a local cache exists) HF datasets."""

    def __init__(self, filter: str, images: np.ndarray, labels: np.ndarray,
                 class_to_remove: Optional[int] = None, normalize: bool = True):
        labels = np.asarray(labels)
        if filter == "all":
            keep = np.arange(len(labels))
        elif filter == "deletion":
            if class_to_remove is None:
                raise ValueError("Deletion filter requires removal class to be specified.")
            keep = np.where(labels == class_to_remove)[0]
        elif filter == "nondeletion":
            if class_to_remove is None:
                raise ValueError("Nondeletion filter requires removal class to be specified.")
            keep = np.where(labels != class_to_remove)[0]
        else:
            raise ValueError("Invalid filter.")
        super().__init__(images[keep], labels[keep], normalize=normalize)

    @classmethod
    def from_npz(cls, filter: str, path: str, class_to_remove: Optional[int] = None,
                 normalize: bool = True) -> "LabeledImageDataset":
        data = np.load(path)
        return cls(filter, data["images"], data["labels"], class_to_remove, normalize)

    @classmethod
    def from_hf(cls, filter: str, name: str, split: str = "train", image_key: str = "image",
                class_to_remove: Optional[int] = None, normalize: bool = True) -> "LabeledImageDataset":
        """Load via HF `datasets` (requires a local cache in offline envs)."""
        import datasets as hfds

        ds = hfds.load_dataset(name, split=split)
        images = np.stack([_to_nhwc(np.asarray(x)) for x in ds[image_key]])
        labels = np.asarray(ds["label"])
        return cls(filter, images, labels, class_to_remove, normalize)


class SDData:
    """Image dir + JSON label file (kmeans memorized=1/not=0 labels);
    returns ``(image, label)`` (``sd_dataset.py:8-42``). ``resolution``
    resizes on load (the reference datasets ship pre-sized; this covers
    mixed-size folders)."""

    def __init__(self, filter: str, img_dir: str, labels_fpath: str, normalize: bool = True,
                 resolution: Optional[int] = None):
        with open(labels_fpath, "r") as f:
            labels = json.load(f)
        all_names = list(labels.keys())
        all_labels = np.asarray(list(labels.values()))
        if filter == "all":
            idx = np.arange(all_labels.shape[0])
        elif filter == "deletion":
            idx = np.where(all_labels == 1)[0]
        elif filter == "nondeletion":
            idx = np.where(all_labels == 0)[0]
        else:
            raise ValueError("Invalid filter.")
        self.img_dir = img_dir
        self.img_names: List[str] = [all_names[i] for i in idx]
        self.img_labels = all_labels[idx]
        self.normalize = normalize
        self.resolution = resolution

    def __len__(self) -> int:
        return len(self.img_names)

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, int]:
        from PIL import Image

        pil = Image.open(os.path.join(self.img_dir, self.img_names[idx]))
        if self.resolution and pil.size != (self.resolution, self.resolution):
            pil = pil.resize((self.resolution, self.resolution), Image.BILINEAR)
        img = _to_nhwc(np.asarray(pil))
        if self.normalize:
            img = normalize_to_unit_range(img)
        else:
            img = np.asarray(img, np.float32)
        return img, int(self.img_labels[idx])
