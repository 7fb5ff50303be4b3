"""Dataset file discovery and sample loading (LLVIP / FLIR / KAIST).

Rebuild of the reference datasets (reference: src/dataloader/dataloader.py:
77-276): LLVIP visible|infrared/train|test/*.jpg globs, FLIR align txt lists
with JPEGImages/RGB<->PreviewData remapping, KAIST txt lists. The reference
hardcodes a 1,030-entry KAIST keep-index list of frames with annotations
(dataloader.py:106); here the equivalent filter is computed from the
annotations at init (keep frames whose parsed bbox list is non-empty).

Samples are numpy NHWC; padding/batching happens in data.loader.
"""

from __future__ import annotations

import glob
import os
from typing import Dict, List, Optional, Tuple

import numpy as np
from PIL import Image

from hallucidet_tpu.data.annotations import get_bbox
from hallucidet_tpu.data.transforms import to_tensor_ir, to_tensor_rgb


def open_txt_file(path: str, base: str) -> List[str]:
    """Reference Utils.open_txt_file: read a list file of image paths
    relative to `base` (reference: src/utils/utils.py)."""
    with open(path) as f:
        lines = [ln.strip() for ln in f if ln.strip()]
    return [os.path.join(base, ln) for ln in lines]


class SingleModalDetectionDataset:
    """Discovers per-modality file lists; __getitem__ -> (image HWC float32
    [0,1] (HW1 for ir), {'boxes': [N,4], 'labels': [N]})."""

    def __init__(
        self,
        dataset: str,
        path_images: str,
        modality: Optional[str] = None,
        transforms=None,
        ext: str = ".png",
        train: bool = True,
        rng: Optional[np.random.Generator] = None,
    ):
        self.dataset = dataset
        self.path_images = path_images
        self.modality = modality
        self.transforms = transforms
        self.ext = ext
        self.train = train
        self.rng = rng or np.random.default_rng(0)
        self.indices: Optional[List[int]] = None
        self.list_names = self._discover(modality)
        if dataset == "kaist" and train:
            # dynamic equivalent of the reference's hardcoded keep list
            self.indices = [
                i
                for i, n in enumerate(self.list_names)
                if len(get_bbox(n + ".xml", dataset, train)["bboxes"]) > 0
            ]

    def _discover(self, modality) -> List[str]:
        d, p, train = self.dataset, self.path_images, self.train
        rgb_like = modality in ("rgb", "both")
        if d == "kaist":
            name = ("train-all-20" if train else "test-all-20") + (
                "-rgb.txt" if rgb_like else "-ir.txt"
            )
            return sorted(open_txt_file(os.path.join(p, name), p))
        if d == "llvip":
            sub = "visible" if rgb_like else "infrared"
            split = "train" if train else "test"
            return [
                x.split(".jpg")[0]
                for x in sorted(glob.glob(os.path.join(p, sub, split, "*.jpg")))
            ]
        if d == "flir":
            name = "align_train.txt" if train else "align_validation.txt"
            names = sorted(open_txt_file(os.path.join(p, name), p))
            out = []
            for x in names:
                rel = x.split(p)[-1]
                if modality != "infrared" and rgb_like:
                    rel = rel.split("PreviewData")[0] + "RGB"
                out.append(os.path.join(p, "JPEGImages", rel.lstrip("/")))
            return out
        raise ValueError(f"unknown dataset {d}")

    def __len__(self) -> int:
        return len(self.indices) if self.indices is not None else len(self.list_names)

    # Fixed-frame datasets (LLVIP is uniformly 1024x1280) use the native
    # threaded libjpeg loader once the frame size is known; other datasets
    # or non-JPEG inputs fall back to PIL. Opt out with
    # HALLUCIDET_NATIVE_LOADER=0.
    _native_hw = None

    def _native_ok(self, path: str) -> bool:
        import os as _os

        if _os.environ.get("HALLUCIDET_NATIVE_LOADER", "1") == "0":
            return False
        if self.dataset != "llvip":
            return False
        return path.endswith((".jpg", ".jpeg"))

    def _load_image(self, path: str, modality: str) -> np.ndarray:
        gray = modality != "rgb"
        if self._native_ok(path) and self._native_hw is not None:
            from hallucidet_tpu.data import native

            out = native.load_image(path, gray=gray, hw=self._native_hw)
            if out is not None:
                return out
        if gray:
            img = to_tensor_ir(np.asarray(Image.open(path).convert("L")))
        else:
            img = to_tensor_rgb(np.asarray(Image.open(path).convert("RGB")))
        if self._native_hw is None:
            self._native_hw = img.shape[:2]
        return img

    def __getitem__(self, index: int):
        if self.indices is not None:
            index = self.indices[index]
        name = self.list_names[index]
        path = name + self.ext
        if self.transforms is None:
            img = self._load_image(path, self.modality)
        else:
            raw = np.asarray(
                Image.open(path).convert("RGB" if self.modality == "rgb" else "L")
            )
            raw = self.transforms(raw, self.rng)
            img = to_tensor_rgb(raw) if self.modality == "rgb" else to_tensor_ir(raw)
            if self._native_hw is None:
                self._native_hw = img.shape[:2]
        annot = get_bbox(name + ".xml", self.dataset, self.train)
        target = {
            "boxes": annot["bboxes"].reshape(-1, 4).astype(np.float32),
            "labels": annot["labels"].reshape(-1).astype(np.int32),
            "path_image": path,
        }
        return img, target


class MultiModalDetectionDataset(SingleModalDetectionDataset):
    """Paired RGB + IR loading (reference: dataloader.py:190-276). Returns
    (img_rgb, target_rgb, img_ir, target_ir)."""

    def __init__(
        self,
        dataset: str,
        path_images_rgb: str,
        path_images_ir: str,
        modality: str = "both",
        transforms_rgb=None,
        transforms_ir=None,
        ext: str = ".png",
        train: bool = True,
        rng: Optional[np.random.Generator] = None,
    ):
        super().__init__(
            dataset=dataset, path_images=path_images_rgb, modality=modality,
            transforms=None, ext=ext, train=train, rng=rng,
        )
        self.list_names_rgb = self.list_names
        d = dataset
        if d == "kaist":
            name = "train-all-20-ir.txt" if train else "test-all-20-ir.txt"
            self.list_names_ir = sorted(
                open_txt_file(os.path.join(path_images_ir, name), path_images_ir)
            )
        elif d == "llvip":
            split = "train" if train else "test"
            self.list_names_ir = [
                x.split(".jpg")[0]
                for x in sorted(
                    glob.glob(os.path.join(self.path_images, "infrared", split, "*.jpg"))
                )
            ]
        elif d == "flir":
            names = sorted(
                open_txt_file(
                    os.path.join(
                        self.path_images,
                        "align_train.txt" if train else "align_validation.txt",
                    ),
                    self.path_images,
                )
            )
            self.list_names_ir = [
                os.path.join(
                    self.path_images, "JPEGImages", x.split(self.path_images)[-1].lstrip("/")
                )
                for x in names
            ]
        self.transforms_rgb = transforms_rgb
        self.transforms_ir = transforms_ir

    def __getitem__(self, index: int):
        if self.indices is not None:
            index = self.indices[index]
        name_rgb = self.list_names_rgb[index]
        name_ir = self.list_names_ir[index]
        ir_ext = ".jpeg" if self.dataset == "flir" else self.ext

        img_rgb = self._load_image(name_rgb + self.ext, "rgb")
        img_ir = self._load_image(name_ir + ir_ext, "ir")
        annot_rgb = get_bbox(
            (name_ir if self.dataset == "flir" else name_rgb) + ".xml",
            self.dataset, self.train,
        )
        annot_ir = get_bbox(name_ir + ".xml", self.dataset, self.train)
        t_rgb = {
            "boxes": annot_rgb["bboxes"].reshape(-1, 4).astype(np.float32),
            "labels": annot_rgb["labels"].reshape(-1).astype(np.int32),
        }
        t_ir = {
            "boxes": annot_ir["bboxes"].reshape(-1, 4).astype(np.float32),
            "labels": annot_ir["labels"].reshape(-1).astype(np.int32),
        }
        return img_rgb, t_rgb, img_ir, t_ir

    def get_name(self, index: int) -> Tuple[str, str]:
        return self.list_names_rgb[index], self.list_names_ir[index]
