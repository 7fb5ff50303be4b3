"""Detector — the user-facing wrapper that selects/builds a detector and
dispatches loss computation.

Rebuild of the reference wrapper (reference: src/models/detector.py:24-141):
`select_detector` by name, fixed-size mean-0/std-1 transform
(change_generalized_transform, detector.py:94-101), 2-class re-heading
(FastRCNNPredictor re-init for frcnn :51-55; focal-bias cls_logits re-init for
retinanet/fcos :57-66), checkpoint loading, and `calculate_loss` dispatch to
the per-family forward (:105-118).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from hallucidet_tpu.detection.faster_rcnn import FasterRCNN, FasterRCNNConfig
from hallucidet_tpu.detection.fcos import FCOS, FCOSConfig
from hallucidet_tpu.detection.retinanet import RetinaNet, RetinaNetConfig
from hallucidet_tpu.detection.targets import Detections, Targets

DETECTOR_NAMES = ("fasterrcnn", "retinanet", "fcos")


def canonical_name(name: str) -> str:
    for key in DETECTOR_NAMES:
        if key in name:
            return key
    # reference falls back to fasterrcnn with a warning (detector.py:139-141)
    print("Model Name not found (Using fasterrcnn_resnet50_fpn)")
    return "fasterrcnn"


class Detector:
    """Builds the requested detector family at a fixed input size.

    `directly_coco=True` keeps the stock torchvision transform config
    (ImageNet mean/std, min 800/max 1333 — approximated here by a fixed
    800x800 frame since this build is static-shape) and the 91-class COCO
    head; otherwise the HalluciDet config applies: fixed (size, size),
    mean 0 / std 1, `n_classes` head.
    """

    def __init__(
        self,
        name: str = "fasterrcnn",
        pretrained: bool = True,
        n_classes: int = 2,
        size: int = 300,
        eval_path: Optional[str] = None,
        modality: Optional[str] = None,
        directly_coco: bool = False,
    ):
        self.name = canonical_name(name)
        self.n_classes = 91 if directly_coco else n_classes
        self.size = 800 if directly_coco else size
        self.directly_coco = directly_coco
        mean = (0.485, 0.456, 0.406) if directly_coco else (0.0,)
        std = (0.229, 0.224, 0.225) if directly_coco else (1.0,)
        image_size = (self.size, self.size)

        if self.name == "fasterrcnn":
            self.impl = FasterRCNN(
                FasterRCNNConfig(num_classes=self.n_classes),
                image_size, mean, std,
            )
        elif self.name == "retinanet":
            self.impl = RetinaNet(
                RetinaNetConfig(num_classes=self.n_classes), image_size, mean, std
            )
        else:
            self.impl = FCOS(
                FCOSConfig(num_classes=self.n_classes), image_size, mean, std
            )
        self.eval_path = eval_path
        self.pretrained = pretrained

    # ---- params ----

    def init(self, rng: jax.Array):
        """Random init. Re-headed classification layers use the focal prior
        bias -log((1-0.01)/0.01) for retinanet/fcos (reference:
        src/models/detector.py:57-66)."""
        variables = self.impl.init(rng)
        if self.name in ("retinanet", "fcos"):
            params = variables["params"]
            cls_bias_value = -math.log((1 - 0.01) / 0.01)
            cls = params["cls_logits"]
            cls["bias"] = jnp.full_like(cls["bias"], cls_bias_value)
        return variables

    def load(self, eval_path: str):
        """Load converted torch weights (.bin/.ckpt via interop, or a
        previously saved orbax dir)."""
        from hallucidet_tpu.interop.torch_loader import load_detector_variables

        return load_detector_variables(
            eval_path, detector_name=self.name, n_classes=self.n_classes
        )

    # ---- forward ----

    def calculate_loss(
        self,
        variables,
        images: jnp.ndarray,
        targets: Targets,
        train_det: bool = False,
        rng: Optional[jax.Array] = None,
        phase_form=False,
        half: bool = False,
    ) -> Tuple[Dict[str, jnp.ndarray], Detections]:
        """(losses, detections) — the reference's eval-mode loss forward
        contract (reference: src/models/detector.py:105-118). phase_form
        (bool | (fh, fw) tuple): `images` is the U-Net s2d tail's
        [B,H/fh,W/fw,fh*fw*C] phase output, consumed directly by the
        transform resize. half=True: bf16 feature path for every family
        (detection/transform.half_cast) — the product `--precision 16`
        config; the reference autocasts whichever detector is selected."""
        return self.impl.forward(
            variables, images, targets, train_det, rng, phase_form=phase_form,
            half=half,
        )

    def predict(self, variables, images: jnp.ndarray, rng=None,
                phase_form=False, fast: bool = False, half: bool = False):
        """Serving-only detections (no targets, no loss graph). fast=True
        uses the production-serving proposal pool (Faster R-CNN only —
        retinanet/fcos have no proposal stage); half=True the bf16 feature
        path (every family)."""
        kw = {}
        if phase_form:
            kw["phase_form"] = phase_form
        if fast and self.name == "fasterrcnn":
            kw["fast"] = True
        if half:
            kw["half"] = True
        return self.impl.infer(variables, images, rng, **kw)
