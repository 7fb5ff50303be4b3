"""Shared utilities — the reference's Utils surface (reference:
src/utils/utils.py), adapted to the padded/NHWC design. cv2-based drawing is
replaced by PIL (cv2 is not a dependency of this build).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from hallucidet_tpu.data.loader import split_dataset  # noqa: F401 (re-export)
from hallucidet_tpu.data.datasets import open_txt_file  # noqa: F401 (re-export)
from hallucidet_tpu.detection.targets import Detections, Targets, pad_targets
from hallucidet_tpu.ops.image_ops import (
    expand_one_channel_to_three,
    minmax_normalize_image,
)
from hallucidet_tpu.train.optim import warmup_lr_schedule as warmup_lr_scheduler  # noqa: F401
from hallucidet_tpu.train.parallel import reduce_dict  # noqa: F401 (re-export)


class Utils:
    # ---- batching (reference: utils.py:12-47) ----

    @staticmethod
    def stack_images(imgs: Sequence[np.ndarray]) -> jnp.ndarray:
        return jnp.stack([jnp.asarray(i) for i in imgs], axis=0)

    @staticmethod
    def batch_images_for_encoder_decoder(imgs, device=None, ablation_flag=False):
        """List/array of HWC images -> NHWC device batch."""
        del device, ablation_flag
        if isinstance(imgs, (list, tuple)):
            return Utils.stack_images(imgs)
        return jnp.asarray(imgs)

    @staticmethod
    def batch_targets_for_detector(
        targets, device=None, detector_name: str = "fasterrcnn", capacity: int = 64
    ) -> Targets:
        """Ragged list of {'boxes','labels'} dicts -> padded Targets (the
        FCOS float-cast of the reference is irrelevant here: loss math is
        dtype-stable)."""
        del device, detector_name
        if isinstance(targets, Targets):
            return targets
        return pad_targets(
            [np.asarray(t["boxes"]) for t in targets],
            [np.asarray(t["labels"]) for t in targets],
            capacity,
        )

    @staticmethod
    def expand_one_channel_to_output_channels(img, output_channels: int = 3):
        """IR 1ch -> repeated channels (reference: utils.py:51-53); accepts
        [B,H,W,1] or [H,W,1]."""
        arr = jnp.asarray(img)
        if output_channels == 3 and arr.shape[-1] == 1:
            if arr.ndim == 3:
                return jnp.repeat(arr, 3, axis=-1)
            return expand_one_channel_to_three(arr)
        return jnp.repeat(arr, output_channels, axis=-1)

    # ---- bbox format conversions (reference: utils.py:70-133) ----

    @staticmethod
    def from_xyxy_to_xywh(boxes):
        from hallucidet_tpu.ops.boxes import xyxy_to_xywh

        return xyxy_to_xywh(jnp.asarray(boxes))

    @staticmethod
    def from_xywh_to_xyxy(boxes):
        from hallucidet_tpu.ops.boxes import xywh_to_xyxy

        return xywh_to_xyxy(jnp.asarray(boxes))

    @staticmethod
    def normalize_bbox(boxes, size_hw):
        h, w = size_hw
        return jnp.asarray(boxes) / jnp.asarray([w, h, w, h], jnp.float32)

    @staticmethod
    def unnormalize_bbox(boxes, size_hw):
        h, w = size_hw
        return jnp.asarray(boxes) * jnp.asarray([w, h, w, h], jnp.float32)

    # ---- plotting (reference: utils.py:137-297; PIL instead of cv2) ----

    @staticmethod
    def show_bbox(
        image: np.ndarray,
        boxes: np.ndarray,
        scores: Optional[np.ndarray] = None,
        labels: Optional[np.ndarray] = None,
        color=(255, 0, 0),
        threshold: float = 0.5,
    ) -> np.ndarray:
        """Draw boxes on an HWC [0,1] image -> HWC uint8."""
        from PIL import Image, ImageDraw

        img = Image.fromarray(
            np.clip(np.asarray(image) * 255.0, 0, 255).astype(np.uint8)
        )
        if img.mode != "RGB":
            img = img.convert("RGB")
        draw = ImageDraw.Draw(img)
        boxes = np.asarray(boxes).reshape(-1, 4)
        for i, b in enumerate(boxes):
            if scores is not None and float(scores[i]) < threshold:
                continue
            draw.rectangle([float(b[0]), float(b[1]), float(b[2]), float(b[3])],
                           outline=tuple(color), width=2)
            if scores is not None:
                draw.text((float(b[0]), max(0.0, float(b[1]) - 10)),
                          f"{float(scores[i]):.2f}", fill=tuple(color))
        return np.asarray(img)

    @staticmethod
    def plot_each_image(
        image: np.ndarray, detections: Dict, target: Optional[Dict] = None,
        threshold: float = 0.5,
    ) -> np.ndarray:
        """Detections red, ground truth green (reference: utils.py:257-297)."""
        out = Utils.show_bbox(
            image, detections["boxes"], detections.get("scores"),
            color=(255, 0, 0), threshold=threshold,
        )
        if target is not None:
            out = Utils.show_bbox(
                out.astype(np.float32) / 255.0, target["boxes"], None,
                color=(0, 255, 0),
            )
        return out

    # ---- normalization (reference: utils.py:237-254) ----

    @staticmethod
    def normalize_image(image):
        return minmax_normalize_image(jnp.asarray(image)[None])[0]

    @staticmethod
    def normalize_batch_images(images):
        return minmax_normalize_image(jnp.asarray(images))

    # ---- misc (reference: utils.py:300-338) ----

    @staticmethod
    def reduce_dict(metrics: Dict, average: bool = True) -> Dict:
        return reduce_dict(metrics)

    @staticmethod
    def filter_dictionary(d: Dict, keys: Sequence[str]) -> Dict:
        return {k: v for k, v in d.items() if k in keys}

    @staticmethod
    def collate_fn(batch):
        return tuple(zip(*batch))

    @staticmethod
    def split_dataset(train_dataset, split_ratio=0.8, seed=123):
        return split_dataset(train_dataset, split_ratio, seed)

    @staticmethod
    def open_txt_file(path, base):
        return open_txt_file(str(path), str(base))
