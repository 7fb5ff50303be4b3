"""Oxford-IIIT Pet segmentation dataset (smp demo surface).

Rebuild of the reference's example dataset (reference:
src/segmentation_models/datasets/oxford_pet.py:11-126): trimap masks mapped
to binary foreground, train/valid split from the annotation list files.
This environment is zero-egress, so `download` raises with instructions
instead of fetching.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
from PIL import Image


class OxfordPetDataset:
    def __init__(self, root: str, mode: str = "train", transform=None):
        assert mode in ("train", "valid", "test")
        self.root = root
        self.mode = mode
        self.transform = transform
        self.images_dir = os.path.join(root, "images")
        self.masks_dir = os.path.join(root, "annotations", "trimaps")
        self.filenames = self._read_split()

    def __len__(self):
        return len(self.filenames)

    def _read_split(self):
        name = "test.txt" if self.mode == "test" else "trainval.txt"
        path = os.path.join(self.root, "annotations", name)
        with open(path) as f:
            rows = [ln.strip().split(" ")[0] for ln in f if ln.strip()]
        if self.mode == "train":
            return [x for i, x in enumerate(rows) if i % 10 != 0]
        if self.mode == "valid":
            return [x for i, x in enumerate(rows) if i % 10 == 0]
        return rows

    def __getitem__(self, idx: int):
        name = self.filenames[idx]
        image = np.asarray(
            Image.open(os.path.join(self.images_dir, name + ".jpg")).convert("RGB")
        )
        trimap = np.asarray(
            Image.open(os.path.join(self.masks_dir, name + ".png"))
        )
        mask = self._preprocess_mask(trimap)
        sample = dict(image=image, mask=mask, trimap=trimap)
        if self.transform is not None:
            sample = self.transform(**sample)
        return sample

    @staticmethod
    def _preprocess_mask(trimap: np.ndarray) -> np.ndarray:
        mask = trimap.astype(np.float32)
        mask[mask == 2.0] = 0.0
        mask[(mask == 1.0) | (mask == 3.0)] = 1.0
        return mask

    @staticmethod
    def download(root: str):
        raise RuntimeError(
            "zero-egress environment: place the Oxford-IIIT Pet archive "
            "contents under <root>/images and <root>/annotations manually"
        )


class SimpleOxfordPetDataset(OxfordPetDataset):
    """Fixed 256x256 resize variant (reference: oxford_pet.py Simple*)."""

    def __getitem__(self, idx: int):
        sample = super().__getitem__(idx)
        image = np.asarray(
            Image.fromarray(sample["image"]).resize((256, 256), Image.BILINEAR)
        )
        mask = np.asarray(
            Image.fromarray(sample["mask"]).resize((256, 256), Image.NEAREST)
        )
        trimap = np.asarray(
            Image.fromarray(sample["trimap"]).resize((256, 256), Image.NEAREST)
        )
        return dict(image=image, mask=mask, trimap=trimap)
