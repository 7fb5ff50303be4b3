"""FCOS (anchor-free, ResNet50-FPN + P6/P7) — TPU-native loss + detections.

Rebuild of the reference's FCOS path (reference: src/utils/eval_forward_fcos.py,
which delegates loss to the torchvision model): center-sampling assignment
(radius 1.5 x anchor size), per-level regress-range bucketing, GIoU box loss,
BCE centerness loss, sqrt(cls*ctr) scoring with per-level top-k postprocess.
The per-image assignment loops become one vmapped masked computation.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from hallucidet_tpu.detection.retinanet import topk_candidates_postprocess
from hallucidet_tpu.ops.fused_upsample import phase_native_hw
from hallucidet_tpu.detection.targets import Detections, Targets
from hallucidet_tpu.detection.transform import DetectionTransform, half_cast
from hallucidet_tpu.nn.fpn import FPN
from hallucidet_tpu.nn.layers import conv
from hallucidet_tpu.nn.resnet import ResNet
from hallucidet_tpu.ops.anchors import fcos_anchor_generator
from hallucidet_tpu.ops.boxes import box_area
from hallucidet_tpu.ops.losses import giou_loss, optax_sigmoid_ce, sigmoid_focal_loss


@dataclasses.dataclass(frozen=True)
class FCOSConfig:
    num_classes: int = 2
    backbone: str = "resnet50"
    score_thresh: float = 0.2
    nms_thresh: float = 0.6
    detections_per_img: int = 100
    topk_candidates: int = 1000
    center_sampling_radius: float = 1.5
    nms_candidate_cap: int = 4096


# ----- BoxLinearCoder (normalize_by_size=True) -----


def linear_encode(anchors: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """(l, t, r, b) distances from anchor centers, normalized by anchor size."""
    cx = 0.5 * (anchors[..., 0] + anchors[..., 2])
    cy = 0.5 * (anchors[..., 1] + anchors[..., 3])
    w = anchors[..., 2] - anchors[..., 0]
    h = anchors[..., 3] - anchors[..., 1]
    l = (cx - boxes[..., 0]) / w
    t = (cy - boxes[..., 1]) / h
    r = (boxes[..., 2] - cx) / w
    b = (boxes[..., 3] - cy) / h
    return jnp.stack([l, t, r, b], axis=-1)


def linear_decode(rel: jnp.ndarray, anchors: jnp.ndarray) -> jnp.ndarray:
    cx = 0.5 * (anchors[..., 0] + anchors[..., 2])
    cy = 0.5 * (anchors[..., 1] + anchors[..., 3])
    w = anchors[..., 2] - anchors[..., 0]
    h = anchors[..., 3] - anchors[..., 1]
    x1 = cx - rel[..., 0] * w
    y1 = cy - rel[..., 1] * h
    x2 = cx + rel[..., 2] * w
    y2 = cy + rel[..., 3] * h
    return jnp.stack([x1, y1, x2, y2], axis=-1)


class FCOSModule(nn.Module):
    """Trunk + FPN(P3-P7) + GroupNorm head towers."""

    config: FCOSConfig

    def setup(self):
        cfg = self.config
        self.body = ResNet(arch=cfg.backbone, frozen_bn=True)
        self.fpn = FPN(out_channels=256, extra="p6p7")
        self.cls_tower = [conv(256, 3, 1, 1, name=f"cls_tower_{i}") for i in range(4)]
        self.cls_norms = [
            nn.GroupNorm(num_groups=32, name=f"cls_gn_{i}") for i in range(4)
        ]
        self.cls_logits = conv(cfg.num_classes, 3, 1, 1, name="cls_logits")
        self.reg_tower = [conv(256, 3, 1, 1, name=f"reg_tower_{i}") for i in range(4)]
        self.reg_norms = [
            nn.GroupNorm(num_groups=32, name=f"reg_gn_{i}") for i in range(4)
        ]
        self.bbox_reg = conv(4, 3, 1, 1, name="bbox_reg")
        self.bbox_ctrness = conv(1, 3, 1, 1, name="bbox_ctrness")

    def features(self, images: jnp.ndarray) -> List[jnp.ndarray]:
        return self.fpn(self.body(images)[3:])

    def head(self, feats: Sequence[jnp.ndarray]):
        """Returns (cls_logits [B,A,C], bbox_reg [B,A,4], ctrness [B,A])."""
        cfg = self.config
        cls_out, reg_out, ctr_out = [], [], []
        for f in feats:
            t = f
            for layer, norm in zip(self.cls_tower, self.cls_norms):
                t = nn.relu(norm(layer(t)))
            c = self.cls_logits(t)
            b0 = c.shape[0]
            cls_out.append(c.reshape(b0, -1, cfg.num_classes))
            t = f
            for layer, norm in zip(self.reg_tower, self.reg_norms):
                t = nn.relu(norm(layer(t)))
            reg_out.append(nn.relu(self.bbox_reg(t)).reshape(b0, -1, 4))
            ctr_out.append(self.bbox_ctrness(t).reshape(b0, -1))
        return (
            jnp.concatenate(cls_out, 1),
            jnp.concatenate(reg_out, 1),
            jnp.concatenate(ctr_out, 1),
        )

    def __call__(self, images: jnp.ndarray):
        return self.head(self.features(images))


def _fcos_match(
    anchors: jnp.ndarray,  # [A, 4]
    level_lower: jnp.ndarray,  # [A]
    level_upper: jnp.ndarray,  # [A]
    gtb: jnp.ndarray,  # [G, 4]
    gtv: jnp.ndarray,  # [G]
    radius: float,
) -> jnp.ndarray:
    """torchvision FCOS assignment -> matched gt index or -1, [A]."""
    centers = 0.5 * (anchors[:, :2] + anchors[:, 2:])  # [A, 2]
    sizes = anchors[:, 2] - anchors[:, 0]  # [A]
    gt_centers = 0.5 * (gtb[:, :2] + gtb[:, 2:])  # [G, 2]

    # center sampling: |anchor_center - gt_center|_inf < radius * anchor_size
    d = jnp.abs(centers[:, None, :] - gt_centers[None, :, :]).max(axis=2)  # [A, G]
    match = d < radius * sizes[:, None]

    # anchor center inside gt box
    x = centers[:, 0:1]
    y = centers[:, 1:2]
    l = x - gtb[None, :, 0]
    t = y - gtb[None, :, 1]
    r = gtb[None, :, 2] - x
    b = gtb[None, :, 3] - y
    dist = jnp.stack([l, t, r, b], axis=2)  # [A, G, 4]
    match = match & (dist.min(axis=2) > 0)

    # per-level regression range on the max distance
    max_dist = dist.max(axis=2)  # [A, G]
    match = match & (max_dist > level_lower[:, None]) & (max_dist < level_upper[:, None])
    match = match & gtv[None, :]

    # choose smallest-area gt among matches
    gt_areas = box_area(gtb)
    quality = match.astype(jnp.float32) * (1e8 - gt_areas[None, :])
    best = jnp.max(quality, axis=1)
    idx = jnp.argmax(quality, axis=1).astype(jnp.int32)
    return jnp.where(best < 1e-5, -1, idx)


def _fcos_loss(
    anchors: jnp.ndarray,
    level_sizes: Sequence[int],
    cls_logits: jnp.ndarray,  # [B, A, C]
    bbox_reg: jnp.ndarray,  # [B, A, 4]
    ctrness: jnp.ndarray,  # [B, A]
    targets: Targets,
    cfg: FCOSConfig,
) -> Dict[str, jnp.ndarray]:
    num_classes = cls_logits.shape[-1]
    sizes = anchors[:, 2] - anchors[:, 0]
    lower = sizes * 4.0
    upper = sizes * 8.0
    # first level regresses from 0, last to infinity
    lower = lower.at[: level_sizes[0]].set(0.0)
    upper = upper.at[-level_sizes[-1] :].set(jnp.inf)

    def one(gtb, gtl, gtv, logits, reg, ctr):
        matched = _fcos_match(anchors, lower, upper, gtb, gtv, cfg.center_sampling_radius)
        fg = matched >= 0
        safe = jnp.clip(matched, 0)
        gt_cls = gtl[safe]
        gt_box = gtb[safe]

        onehot = jax.nn.one_hot(gt_cls, num_classes, dtype=logits.dtype) * fg[:, None]
        cls_l = sigmoid_focal_loss(logits, onehot)  # sum over ALL anchors

        pred_boxes = linear_decode(reg, anchors)
        reg_l = giou_loss(pred_boxes, gt_box, mask=fg)

        reg_t = linear_encode(anchors, gt_box)  # [A, 4] l,t,r,b normalized
        lr = reg_t[:, jnp.array([0, 2])]
        tb = reg_t[:, jnp.array([1, 3])]
        ctr_t = jnp.sqrt(
            jnp.clip(
                (lr.min(axis=1) / jnp.maximum(lr.max(axis=1), 1e-12))
                * (tb.min(axis=1) / jnp.maximum(tb.max(axis=1), 1e-12)),
                0.0,
            )
        )
        ctr_l = jnp.sum(jnp.where(fg, optax_sigmoid_ce(ctr, ctr_t), 0.0))
        return cls_l, reg_l, ctr_l, jnp.sum(fg)

    cls_l, reg_l, ctr_l, n_fg = jax.vmap(one)(
        targets.boxes, targets.labels, targets.valid, cls_logits, bbox_reg, ctrness
    )
    denom = jnp.maximum(1, jnp.sum(n_fg))
    return {
        "classification": jnp.sum(cls_l) / denom,
        "bbox_regression": jnp.sum(reg_l) / denom,
        "bbox_ctrness": jnp.sum(ctr_l) / denom,
    }


class FCOS:
    """End-to-end FCOS pipeline: forward -> ({classification, bbox_regression,
    bbox_ctrness}, Detections)."""

    def __init__(
        self,
        config: FCOSConfig = FCOSConfig(),
        image_size: Tuple[int, int] = (300, 300),
        image_mean: Tuple[float, ...] = (0.0,),
        image_std: Tuple[float, ...] = (1.0,),
    ):
        self.config = config
        self.module = FCOSModule(config)
        self.transform = DetectionTransform(image_size, image_mean, image_std)
        self.image_size = image_size
        self._anchor_gen = fcos_anchor_generator()
        self._level_hw: Optional[List[Tuple[int, int]]] = None

    def level_shapes(self) -> List[Tuple[int, int]]:
        if self._level_hw is None:
            h, w = self.image_size

            def run(img):
                return FCOSModule(self.config).init_with_output(
                    jax.random.PRNGKey(0), img, method="features"
                )[0]

            shapes = jax.eval_shape(
                run, jax.ShapeDtypeStruct((1, h, w, 3), jnp.float32)
            )
            self._level_hw = [tuple(s.shape[1:3]) for s in shapes]
        return self._level_hw

    def anchors(self) -> np.ndarray:
        return self._anchor_gen.anchors_concat(self.image_size, self.level_shapes())

    def level_sizes(self) -> List[int]:
        return [h * w for h, w in self.level_shapes()]

    def init(self, rng: jax.Array):
        h, w = self.image_size
        return self.module.init(rng, jnp.zeros((1, h, w, 3), jnp.float32))

    def forward(
        self,
        variables,
        images: jnp.ndarray,
        targets: Targets,
        train_det: bool = False,
        rng: Optional[jax.Array] = None,
        phase_form=False,  # bool | (fh, fw): images = U-Net s2d tail phase output
        half: bool = False,  # bf16 feature path (detection/transform.half_cast)
    ) -> Tuple[Dict[str, jnp.ndarray], Detections]:
        del train_det, rng
        cfg = self.config
        if phase_form:
            original_hw = phase_native_hw(images, phase_form)
        else:
            original_hw = images.shape[1:3]
        images_t, targets_t = self.transform(images, targets, phase_form=phase_form)
        variables, images_t = half_cast(variables, images_t, half)

        feats = self.module.apply(variables, images_t, method="features")
        cls_logits, bbox_reg, ctrness = self.module.apply(
            variables, feats, method="head"
        )
        cls_logits = cls_logits.astype(jnp.float32)
        bbox_reg = bbox_reg.astype(jnp.float32)
        ctrness = ctrness.astype(jnp.float32)

        anchors = self.anchors()
        losses = _fcos_loss(
            jnp.asarray(anchors), self.level_sizes(), cls_logits, bbox_reg,
            ctrness, targets_t, cfg,
        )

        # score = sqrt(sigmoid(cls) * sigmoid(ctrness)), broadcast per class
        ctr_prob = jax.nn.sigmoid(jax.lax.stop_gradient(ctrness))[..., None]
        scores = jnp.sqrt(
            jax.nn.sigmoid(jax.lax.stop_gradient(cls_logits)) * ctr_prob
        )

        dets = topk_candidates_postprocess(
            class_scores=scores,
            decode_fn=lambda reg, anch: linear_decode(
                jax.lax.stop_gradient(reg), anch
            ),
            bbox_reg=bbox_reg,
            anchors=anchors,
            level_sizes=self.level_sizes(),
            image_hw=self.image_size,
            score_thresh=cfg.score_thresh,
            topk=cfg.topk_candidates,
            nms_thresh=cfg.nms_thresh,
            detections_per_img=cfg.detections_per_img,
            candidate_cap=cfg.nms_candidate_cap,
        )
        dets = self.transform.postprocess(dets, original_hw)
        return losses, dets

    def infer(self, variables, images: jnp.ndarray, rng=None,
              phase_form=False, half: bool = False) -> Detections:
        """Serving path: detections only."""
        del rng
        cfg = self.config
        if phase_form:
            original_hw = phase_native_hw(images, phase_form)
        else:
            original_hw = images.shape[1:3]
        images_t, _ = self.transform(images, None, phase_form=phase_form)
        variables, images_t = half_cast(variables, images_t, half)
        feats = self.module.apply(variables, images_t, method="features")
        cls_logits, bbox_reg, ctrness = self.module.apply(
            variables, feats, method="head"
        )
        cls_logits = cls_logits.astype(jnp.float32)
        bbox_reg = bbox_reg.astype(jnp.float32)
        ctrness = ctrness.astype(jnp.float32)
        scores = jnp.sqrt(
            jax.nn.sigmoid(cls_logits) * jax.nn.sigmoid(ctrness)[..., None]
        )
        dets = topk_candidates_postprocess(
            class_scores=scores,
            decode_fn=linear_decode,
            bbox_reg=bbox_reg,
            anchors=self.anchors(),
            level_sizes=self.level_sizes(),
            image_hw=self.image_size,
            score_thresh=cfg.score_thresh,
            topk=cfg.topk_candidates,
            nms_thresh=cfg.nms_thresh,
            detections_per_img=cfg.detections_per_img,
            candidate_cap=cfg.nms_candidate_cap,
        )
        return self.transform.postprocess(dets, original_hw)
