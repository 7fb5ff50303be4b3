"""On-device detection input transform (fixed-size resize + normalize) and
its inverse postprocess for boxes.

Rebuild of the reference's CustomGeneralizedRCNNTransform (reference:
src/models/custom_generalized_transform.py:103-304): fixed_size resize
(bilinear, half-pixel), configurable mean/std (the reference pins mean=0,
std=1, reference: src/models/detector.py change_generalized_transform),
size_divisible=1, and postprocess that rescales detection boxes back to the
original frame. Runs entirely on device inside the jitted graph — there is no
host round trip, and the resize is two MXU matmuls (ops/image_ops.py).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from hallucidet_tpu.detection.targets import Detections, Targets
from hallucidet_tpu.ops.boxes import resize_boxes
from hallucidet_tpu.ops.fused_upsample import phase_factors
from hallucidet_tpu.ops.image_ops import (
    normalize,
    resize_bilinear,
    resize_bilinear_from_phase,
)


def half_cast(variables, images_t, half: bool):
    """The bf16 detector feature path, shared by all three families: conv/
    matmul feature extraction (backbone, FPN, heads, RoIAlign) runs in
    bfloat16 while every box-math consumer (decode, matching, sampling, NMS,
    losses) stays float32 — each family's forward upcasts the head outputs at
    the boundary. Mirrors the reference's Lightning `--precision 16` run,
    where torch autocast wraps the WHOLE LitHalluciDet forward including the
    frozen detector and half-precisions whichever detector is selected
    (reference: train_hallucidet.py precision flag;
    src/models/detector.py:123-141 selects the family). The f32 path
    (half=False) is bit-identical to before; parity/golden tests pin it.
    FrozenBatchNorm folds its scale in f32 (nn/layers.py), Flax Group/
    LayerNorm compute statistics in f32 even for bf16 inputs (mirroring
    autocast's fp32 list for norms), and matmul accumulation is f32 either
    way on the MXU."""
    if not half:
        return variables, images_t
    cast = jax.tree_util.tree_map(
        lambda t: t.astype(jnp.bfloat16)
        if t.dtype == jnp.float32 else t, variables
    )
    return cast, images_t.astype(jnp.bfloat16)


@dataclasses.dataclass(frozen=True)
class DetectionTransform:
    size: Tuple[int, int] = (300, 300)  # (h, w) fixed detector input
    image_mean: Tuple[float, ...] = (0.0,)
    image_std: Tuple[float, ...] = (1.0,)

    def __call__(
        self,
        images: jnp.ndarray,
        targets: Optional[Targets] = None,
        phase_form: bool = False,
    ) -> Tuple[jnp.ndarray, Optional[Targets]]:
        """images NHWC in [0,1] at native resolution -> normalized fixed-size
        batch; target boxes rescaled into the fixed frame.

        phase_form: `images` is the U-Net s2d tail's space-to-depth output
        [B, H/fh, W/fw, fh*fw*C] (True = the legacy (2,2) form; an (fh, fw)
        tuple names the form); the resize consumes it directly (exact, no
        full-resolution materialization)."""
        if phase_form:
            fh, fw = phase_factors(phase_form)
            nph = fh * fw
            _, hp, wp, cf = images.shape
            h, w, c = fh * hp, fw * wp, cf // nph
            mean = self.image_mean * (c if len(self.image_mean) == 1 else 1)
            std = self.image_std * (c if len(self.image_std) == 1 else 1)
            # resize first, normalize after: bilinear interp rows sum to 1,
            # so normalize commutes with the resize (same result up to float
            # reassociation) — the normalize pass then runs on the small
            # fixed frame instead of the megapixel-equivalent phase tensor,
            # and the U-Net head output feeds the resize einsum directly
            out = resize_bilinear_from_phase(images, self.size, (fh, fw))
            out = normalize(out, mean, std)
        else:
            _, h, w, c = images.shape
            mean = self.image_mean * (c if len(self.image_mean) == 1 else 1)
            std = self.image_std * (c if len(self.image_std) == 1 else 1)
            out = normalize(images, mean, std)
            out = resize_bilinear(out, self.size)
        new_targets = None
        if targets is not None:
            boxes = resize_boxes(targets.boxes, (h, w), self.size)
            boxes = jnp.where(targets.valid[..., None], boxes, 0.0)
            new_targets = Targets(boxes, targets.labels, targets.valid)
        return out, new_targets

    def postprocess(
        self, detections: Detections, original_hw: Tuple[int, int]
    ) -> Detections:
        """Rescale detection boxes from the fixed frame back to the original
        image size (reference: custom_generalized_transform.py:276-296)."""
        boxes = resize_boxes(detections.boxes, self.size, original_hw)
        boxes = jnp.where(detections.valid[..., None], boxes, 0.0)
        return Detections(boxes, detections.scores, detections.labels, detections.valid)
