"""RetinaNet (ResNet50-FPN + P6/P7) — TPU-native loss + detections.

Rebuild of the reference's RetinaNet path (reference:
src/utils/eval_forward_retinanet.py): focal classification loss normalized
per image by max(1, num_foreground) and averaged over the batch
(:182-211), smooth-L1 (beta=1.0) box regression on foreground anchors
(:53-80, :215-244), per-level top-k candidate postprocessing with class-aware
NMS. Matching: IoU matcher fg 0.5 / bg 0.4 with low-quality matches (:163-179).

Per-image Python loops in the reference become a vmap over the batch; ragged
foreground gathers become masked reductions.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from hallucidet_tpu.ops.fused_upsample import phase_native_hw
from hallucidet_tpu.detection.targets import Detections, Targets
from hallucidet_tpu.detection.transform import DetectionTransform, half_cast
from hallucidet_tpu.nn.fpn import FPN
from hallucidet_tpu.nn.layers import conv
from hallucidet_tpu.nn.resnet import ResNet
from hallucidet_tpu.ops.anchors import retinanet_anchor_generator
from hallucidet_tpu.ops.boxes import (
    clip_boxes_to_image,
    decode_boxes,
    encode_boxes,
)
from hallucidet_tpu.ops.losses import sigmoid_focal_loss, smooth_l1_loss
from hallucidet_tpu.ops.nms import batched_nms_padded
from hallucidet_tpu.ops.sampling import match_boxes


@dataclasses.dataclass(frozen=True)
class RetinaNetConfig:
    num_classes: int = 2
    backbone: str = "resnet50"
    fg_iou: float = 0.5
    bg_iou: float = 0.4
    score_thresh: float = 0.05
    nms_thresh: float = 0.5
    detections_per_img: int = 300
    topk_candidates: int = 1000
    num_anchors_per_loc: int = 9
    reg_loss: str = "smooth_l1"  # l1 | smooth_l1 | giou | diou | ciou
    smooth_l1_beta: float = 1.0
    nms_candidate_cap: int = 4096


class RetinaNetModule(nn.Module):
    """Trunk + FPN(P3-P7) + classification/regression towers."""

    config: RetinaNetConfig

    def setup(self):
        cfg = self.config
        self.body = ResNet(arch=cfg.backbone, frozen_bn=True)
        self.fpn = FPN(out_channels=256, extra="p6p7")
        a = cfg.num_anchors_per_loc
        self.cls_tower = [conv(256, 3, 1, 1, name=f"cls_tower_{i}") for i in range(4)]
        self.cls_logits = conv(a * cfg.num_classes, 3, 1, 1, name="cls_logits")
        self.reg_tower = [conv(256, 3, 1, 1, name=f"reg_tower_{i}") for i in range(4)]
        self.bbox_reg = conv(a * 4, 3, 1, 1, name="bbox_reg")

    def features(self, images: jnp.ndarray) -> List[jnp.ndarray]:
        c_feats = self.body(images)[3:]  # C3..C5
        return self.fpn(c_feats)  # P3..P5, P6, P7

    def head(self, feats: Sequence[jnp.ndarray]):
        """Returns (cls_logits [B, A_tot, C], bbox_reg [B, A_tot, 4]).

        NOTE (round 5): a separator-padded level-packed form of these
        shared-weight towers (one frame, 10 dispatches instead of 50, exact
        with a per-conv separator re-zero mask — golden-verified) measured
        8.80 -> 9.67 ms/step for infer b8@300 bf16: XLA already overlaps the
        per-level dispatches, and the packed frame's 1.57x position
        inflation across 8 tower convs costs more than the dispatch
        overheads it removes (same verdict as the Faster R-CNN RPN head,
        detection/faster_rcnn.py). Per-level stands."""
        cfg = self.config
        cls_out, reg_out = [], []
        for f in feats:
            t = f
            for layer in self.cls_tower:
                t = nn.relu(layer(t))
            c = self.cls_logits(t)
            b0, h, w, _ = c.shape
            cls_out.append(c.reshape(b0, -1, cfg.num_classes))
            t = f
            for layer in self.reg_tower:
                t = nn.relu(layer(t))
            r = self.bbox_reg(t)
            reg_out.append(r.reshape(b0, -1, 4))
        return jnp.concatenate(cls_out, 1), jnp.concatenate(reg_out, 1)

    def __call__(self, images: jnp.ndarray):
        feats = self.features(images)
        return self.head(feats)


def _retinanet_loss(
    anchors: jnp.ndarray,  # [A, 4]
    cls_logits: jnp.ndarray,  # [B, A, C]
    bbox_reg: jnp.ndarray,  # [B, A, 4]
    targets: Targets,
    cfg: RetinaNetConfig,
) -> Dict[str, jnp.ndarray]:
    num_classes = cls_logits.shape[-1]

    def one(gtb, gtl, gtv, logits, reg):
        m = match_boxes(
            gtb, gtv, anchors, cfg.fg_iou, cfg.bg_iou, allow_low_quality_matches=True
        )
        fg = m.matched_idx >= 0
        num_fg = jnp.sum(fg)
        matched = jnp.clip(m.matched_idx, 0)
        gt_cls = gtl[matched]  # [A]
        onehot = jax.nn.one_hot(gt_cls, num_classes, dtype=logits.dtype)
        onehot = onehot * fg[:, None]
        valid = (m.matched_idx != -2)[:, None]  # drop BETWEEN_THRESHOLDS rows
        cls_l = sigmoid_focal_loss(logits, onehot, mask=valid)
        cls_l = cls_l / jnp.maximum(1, num_fg)

        matched_gt = gtb[matched]
        if cfg.reg_loss in ("l1", "smooth_l1"):
            reg_t = encode_boxes(matched_gt, anchors)  # weights (1,1,1,1)
            beta = cfg.smooth_l1_beta if cfg.reg_loss == "smooth_l1" else 0.0
            reg_l = smooth_l1_loss(reg, reg_t, beta=beta, mask=fg[:, None])
        else:
            from hallucidet_tpu.ops.losses import ciou_loss, diou_loss, giou_loss

            pred_boxes = decode_boxes(reg, anchors)
            fn = {"giou": giou_loss, "diou": diou_loss, "ciou": ciou_loss}[
                cfg.reg_loss
            ]
            reg_l = fn(pred_boxes, matched_gt, mask=fg)
        reg_l = reg_l / jnp.maximum(1, num_fg)
        return cls_l, reg_l

    cls_l, reg_l = jax.vmap(one)(
        targets.boxes, targets.labels, targets.valid, cls_logits, bbox_reg
    )
    n = targets.batch_size
    return {
        "classification": jnp.sum(cls_l) / n,
        "bbox_regression": jnp.sum(reg_l) / n,
    }


def topk_candidates_postprocess(
    class_scores: jnp.ndarray,  # [B, A, C] final per-class scores
    decode_fn,
    bbox_reg: jnp.ndarray,  # [B, A, 4]
    anchors: np.ndarray,  # [A, 4]
    level_sizes: Sequence[int],  # anchors per level
    image_hw: Tuple[int, int],
    score_thresh: float,
    topk: int,
    nms_thresh: float,
    detections_per_img: int,
    candidate_cap: int,
) -> Detections:
    """Shared RetinaNet/FCOS postprocess: per level, flatten (anchor, class)
    scores, threshold, take top-k, decode those boxes; then class-aware NMS
    across levels. Static shapes: per-level k = min(topk, A_l*C)."""
    b, _, c = class_scores.shape
    anchors_j = jnp.asarray(anchors)

    parts_b, parts_s, parts_l, parts_v = [], [], [], []
    start = 0
    for a_l in level_sizes:
        reg_l = bbox_reg[:, start : start + a_l]
        anch_l = anchors_j[start : start + a_l]
        scores_l = class_scores[:, start : start + a_l].reshape(b, a_l * c)
        k = min(topk, a_l * c)
        top_scores, idx = jax.lax.top_k(scores_l, k)
        anchor_idx = idx // c
        label_idx = (idx % c).astype(jnp.int32)
        boxes_l = decode_fn(
            jnp.take_along_axis(reg_l, anchor_idx[..., None], axis=1),
            anch_l[anchor_idx],
        )
        boxes_l = clip_boxes_to_image(boxes_l, image_hw)
        parts_b.append(boxes_l)
        parts_s.append(top_scores)
        parts_l.append(label_idx)
        parts_v.append(top_scores > score_thresh)
        start += a_l

    boxes = jnp.concatenate(parts_b, axis=1)
    scores = jnp.concatenate(parts_s, axis=1)
    labels = jnp.concatenate(parts_l, axis=1)
    valid = jnp.concatenate(parts_v, axis=1)

    def one(bx, sc, lb, v):
        ob, os_, ov, oi = batched_nms_padded(
            bx, sc, lb, v, nms_thresh, detections_per_img, candidate_cap
        )
        return ob, os_, jnp.where(ov, lb[oi], 0), ov

    ob, os_, ol, ov = jax.vmap(one)(boxes, scores, labels, valid)
    return Detections(ob, os_, ol, ov)


class RetinaNet:
    """End-to-end RetinaNet pipeline (same contract as detection.FasterRCNN):
    forward -> ({classification, bbox_regression}, Detections)."""

    def __init__(
        self,
        config: RetinaNetConfig = RetinaNetConfig(),
        image_size: Tuple[int, int] = (300, 300),
        image_mean: Tuple[float, ...] = (0.0,),
        image_std: Tuple[float, ...] = (1.0,),
    ):
        self.config = config
        self.module = RetinaNetModule(config)
        self.transform = DetectionTransform(image_size, image_mean, image_std)
        self.image_size = image_size
        self._anchor_gen = retinanet_anchor_generator()
        self._level_hw: Optional[List[Tuple[int, int]]] = None

    def level_shapes(self) -> List[Tuple[int, int]]:
        if self._level_hw is None:
            h, w = self.image_size

            def run(img):
                return RetinaNetModule(self.config).init_with_output(
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
        a = self.config.num_anchors_per_loc
        return [h * w * a for h, w in self.level_shapes()]

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
        del train_det, rng  # retinanet has no sampling and no mode-dependent path
        cfg = self.config
        if phase_form:
            original_hw = phase_native_hw(images, phase_form)
        else:
            original_hw = images.shape[1:3]
        images_t, targets_t = self.transform(images, targets, phase_form=phase_form)
        variables, images_t = half_cast(variables, images_t, half)

        feats = self.module.apply(variables, images_t, method="features")
        cls_logits, bbox_reg = self.module.apply(variables, feats, method="head")
        cls_logits = cls_logits.astype(jnp.float32)
        bbox_reg = bbox_reg.astype(jnp.float32)

        anchors = self.anchors()
        losses = _retinanet_loss(
            jnp.asarray(anchors), cls_logits, bbox_reg, targets_t, cfg
        )

        dets = topk_candidates_postprocess(
            class_scores=jax.nn.sigmoid(jax.lax.stop_gradient(cls_logits)),
            decode_fn=lambda reg, anch: decode_boxes(
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
        """Serving path: detections only (loss path skipped entirely)."""
        del rng
        cfg = self.config
        if phase_form:
            original_hw = phase_native_hw(images, phase_form)
        else:
            original_hw = images.shape[1:3]
        images_t, _ = self.transform(images, None, phase_form=phase_form)
        variables, images_t = half_cast(variables, images_t, half)
        feats = self.module.apply(variables, images_t, method="features")
        cls_logits, bbox_reg = self.module.apply(variables, feats, method="head")
        cls_logits = cls_logits.astype(jnp.float32)
        bbox_reg = bbox_reg.astype(jnp.float32)
        dets = topk_candidates_postprocess(
            class_scores=jax.nn.sigmoid(cls_logits),
            decode_fn=decode_boxes,
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
