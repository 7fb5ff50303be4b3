"""Faster R-CNN (ResNet50-FPN) — TPU-native, loss + detections in one pure
function.

Rebuild of the reference's Faster R-CNN path (reference:
src/utils/eval_forward_fasterrcnn.py): the reference forks torchvision's
forward because torch couples train/eval mode to which outputs exist. Here the
pure-functional design gives both losses and detections from a single jitted
apply; `train_det` only switches proposal counts and (elsewhere) BN behavior.

Semantics intentionally preserved from the reference pipeline:
- RPN proposals are decoded from stop-gradient deltas (no backprop through
  proposal coordinates; eval_forward_fasterrcnn.py:86-88).
- The RoI stage ALWAYS runs `select_training_samples` (512 sampled proposals
  with GT boxes appended) before pooling — including at eval — because the
  reference's forwarder does (eval_forward_fasterrcnn.py:120), and the
  published AP numbers flow through that path.
- Loss normalizations match: RPN losses / total sampled across batch; box
  classification mean over sampled; box regression sum / total sampled.

Static shapes throughout: padded GT, fixed per-level pre-NMS top-k, fixed
post-NMS proposal capacity with validity masks, fixed 512-slot RoI sample.
"""

from __future__ import annotations

import dataclasses
import functools
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
from hallucidet_tpu.ops.anchors import rpn_anchor_generator
from hallucidet_tpu.ops.boxes import (
    clip_boxes_to_image,
    decode_boxes,
    encode_boxes,
    remove_small_boxes_mask,
)
from hallucidet_tpu.ops.losses import optax_sigmoid_ce, smooth_l1_loss, softmax_cross_entropy
from hallucidet_tpu.ops.nms import NEG_INF, batched_nms_padded, nms_padded
from hallucidet_tpu.ops.roi_align import multiscale_roi_align
from hallucidet_tpu.ops.sampling import (
    balanced_sample,
    balanced_sample_packed,
    match_boxes,
)


@dataclasses.dataclass(frozen=True)
class FasterRCNNConfig:
    num_classes: int = 2  # background + person (reference: config.py n_classes)
    backbone: str = "resnet50"
    # RPN (torchvision *_resnet50_fpn defaults, the ported weights' geometry)
    rpn_pre_nms_top_n_train: int = 2000
    rpn_pre_nms_top_n_test: int = 1000
    rpn_post_nms_top_n_train: int = 2000
    rpn_post_nms_top_n_test: int = 1000
    rpn_nms_thresh: float = 0.7
    rpn_fg_iou: float = 0.7
    rpn_bg_iou: float = 0.3
    rpn_batch_size_per_image: int = 256
    rpn_positive_fraction: float = 0.5
    rpn_score_thresh: float = 0.0
    rpn_min_size: float = 1e-3
    rpn_nms_candidate_cap: int = 4096
    # Box head
    box_score_thresh: float = 0.05
    box_nms_thresh: float = 0.5
    box_detections_per_img: int = 100
    box_fg_iou: float = 0.5
    box_bg_iou: float = 0.5
    box_batch_size_per_image: int = 512
    box_positive_fraction: float = 0.25
    box_min_size: float = 1e-2
    bbox_reg_weights: Tuple[float, float, float, float] = (10.0, 10.0, 5.0, 5.0)
    representation_size: int = 1024
    num_anchors_per_loc: int = 3
    # `infer(..., fast=True)` post-NMS proposal pool: torchvision's stock
    # 1000 proposals push ~2x the RoI-head work of the parity path's 512
    # sampled RoIs for no AP benefit at n_classes=2; 512 makes serving the
    # fastest path (round-3 measurement, PERF.md)
    serving_post_nms_top_n: int = 512


class FasterRCNNModule(nn.Module):
    """The parametric pieces: frozen-BN ResNet trunk + FPN + RPN head + box
    head/predictor. Orchestration (anchors, NMS, sampling, pooling) lives in
    `FasterRCNN`, which calls these methods through `apply(..., method=)`."""

    config: FasterRCNNConfig

    def setup(self):
        cfg = self.config
        self.body = ResNet(arch=cfg.backbone, frozen_bn=True)
        self.fpn = FPN(out_channels=256, extra="pool")
        # RPN head: shared 3x3 + two 1x1s, applied per level with tied weights.
        self.rpn_conv = conv(256, 3, 1, 1, name="rpn_conv")
        self.rpn_cls = conv(cfg.num_anchors_per_loc, 1, 1, 0, name="rpn_cls_logits")
        self.rpn_bbox = conv(
            cfg.num_anchors_per_loc * 4, 1, 1, 0, name="rpn_bbox_pred"
        )
        # TwoMLPHead + FastRCNNPredictor
        self.fc6 = nn.Dense(cfg.representation_size, name="fc6")
        self.fc7 = nn.Dense(cfg.representation_size, name="fc7")
        self.cls_score = nn.Dense(cfg.num_classes, name="cls_score")
        self.bbox_pred = nn.Dense(cfg.num_classes * 4, name="bbox_pred")

    def features(self, images: jnp.ndarray) -> List[jnp.ndarray]:
        c_feats = self.body(images)[2:]  # C2..C5
        return self.fpn(c_feats)  # P2..P5 + pool(P6)

    def rpn(self, feats: Sequence[jnp.ndarray]):
        # NOTE (round 5): a separator-padded level-packed form of this head
        # (one frame, 3 dispatches instead of 15, bit-exact — goldens
        # verified) measured 216.0 -> 214.6 img/s at b64 parity: the packed
        # frame's copy plus the 1.5x position inflation of the shared 3x3
        # cost more than the per-level dispatch overheads they replace
        # (which XLA already overlaps). Reverted; per-level stands.
        objs, deltas = [], []
        for f in feats:
            t = nn.relu(self.rpn_conv(f))
            objs.append(self.rpn_cls(t))
            deltas.append(self.rpn_bbox(t))
        return objs, deltas

    def box_predict(self, pooled: jnp.ndarray):
        """pooled [B, S, 7, 7, 256] -> (class_logits [B,S,C], box_reg [B,S,4C]).
        NHWC flatten order (h, w, c) — the torch checkpoint converter permutes
        fc6 input columns accordingly (interop/torch_loader.py)."""
        b, s = pooled.shape[:2]
        x = pooled.reshape(b, s, -1)
        x = nn.relu(self.fc6(x))
        x = nn.relu(self.fc7(x))
        return self.cls_score(x), self.bbox_pred(x)

    def __call__(self, images: jnp.ndarray):
        """Init-only path: touches every submodule once."""
        feats = self.features(images)
        objs, deltas = self.rpn(feats)
        dummy = jnp.zeros((images.shape[0], 1, 7, 7, 256), images.dtype)
        logits, reg = self.box_predict(dummy)
        return feats, objs, deltas, logits, reg


# Shared across detector families (see detection/transform.py docstring).
_half_cast = half_cast


def _flatten_rpn_outputs(objs, deltas):
    """Per-level NHWC maps -> concatenated [B, A_total] / [B, A_total, 4],
    position-major with cell-anchors contiguous (matches ops.anchors layout)."""
    b = objs[0].shape[0]
    flat_o = [o.reshape(b, -1) for o in objs]
    flat_d = [d.reshape(b, -1, 4) for d in deltas]
    sizes = [o.shape[1] for o in flat_o]
    return jnp.concatenate(flat_o, 1), jnp.concatenate(flat_d, 1), sizes


def _filter_proposals(
    pred_deltas: jnp.ndarray,  # [B, A, 4] raw RPN deltas
    anchors: jnp.ndarray,  # [A, 4]
    objectness: jnp.ndarray,  # [B, A]
    level_sizes: Sequence[int],
    image_hw: Tuple[int, int],
    cfg: FasterRCNNConfig,
    training: bool,
):
    """torchvision RPN filter_proposals: per-level pre-NMS top-k, clip, drop
    tiny/low-score, NMS batched by level, keep post-NMS top-n.

    Levels never suppress each other (batched_nms with level categories), so
    NMS runs independently per level — O(sum k_l^2) instead of O((sum k_l)^2)
    suppression work and no candidate-cap truncation — then the survivors
    merge by a global score top-k. Exactly equivalent to the reference path.

    Proposals are decoded AFTER the per-level top-k (round-5 perf work):
    selection depends only on objectness and decode is elementwise, so
    decoding the <=pre_nms_top_n survivors instead of all ~181k anchors is
    exact while skipping a [B, A, 4] decode+materialize.
    Returns (boxes [B,P,4], scores [B,P], valid [B,P])."""
    pre = cfg.rpn_pre_nms_top_n_train if training else cfg.rpn_pre_nms_top_n_test
    post = cfg.rpn_post_nms_top_n_train if training else cfg.rpn_post_nms_top_n_test

    surv_b, surv_s, surv_v = [], [], []
    start = 0
    for li, a_l in enumerate(level_sizes):
        k = min(pre, a_l)
        obj_l = objectness[:, start : start + a_l]
        scores_l, idx = jax.lax.top_k(obj_l, k)
        deltas_l = jnp.take_along_axis(
            pred_deltas[:, start : start + a_l], idx[..., None], axis=1
        )
        boxes_l = decode_boxes(deltas_l, anchors[start : start + a_l][idx])
        scores_l = jax.nn.sigmoid(scores_l)
        boxes_l = clip_boxes_to_image(boxes_l, image_hw)
        valid_l = remove_small_boxes_mask(boxes_l, cfg.rpn_min_size)
        valid_l = valid_l & (scores_l >= cfg.rpn_score_thresh)

        def one(b, s, v, k=k):
            return nms_padded(
                b, s, v, cfg.rpn_nms_thresh, max_out=min(post, k), candidate_cap=k
            )[:3]

        ob, os_, ov = jax.vmap(one)(boxes_l, scores_l, valid_l)
        surv_b.append(ob)
        surv_s.append(os_)
        surv_v.append(ov)
        start += a_l

    boxes = jnp.concatenate(surv_b, axis=1)
    scores = jnp.concatenate(surv_s, axis=1)
    valid = jnp.concatenate(surv_v, axis=1)
    # global top post_nms_top_n by score across levels
    masked = jnp.where(valid, scores, NEG_INF)
    k_out = min(post, masked.shape[1])
    top_scores, sel = jax.lax.top_k(masked, k_out)
    out_boxes = jnp.take_along_axis(boxes, sel[..., None], axis=1)
    out_valid = top_scores > NEG_INF / 2
    return out_boxes, jnp.where(out_valid, top_scores, 0.0), out_valid


def _rpn_loss(
    anchors: jnp.ndarray,  # [A, 4]
    objectness: jnp.ndarray,  # [B, A]
    pred_deltas: jnp.ndarray,  # [B, A, 4]
    targets: Targets,
    cfg: FasterRCNNConfig,
    rng: jax.Array,
) -> Dict[str, jnp.ndarray]:
    b = objectness.shape[0]
    keys = jax.random.split(rng, b)

    def one(gtb, gtl, gtv, obj, deltas, key):
        m = match_boxes(
            gtb, gtv, anchors, cfg.rpn_fg_iou, cfg.rpn_bg_iou,
            allow_low_quality_matches=True,
        )
        fg = m.matched_idx >= 0
        bg = m.matched_idx == -1
        # packed sampling: the box-reg/objectness losses then run on the
        # <=256 sampled slots instead of all 181k anchors (same draw and
        # identical sums as the mask form — tests/test_anchors_sampling.py)
        pos_idx, pos_val, neg_idx, neg_val = balanced_sample_packed(
            key, fg, bg, cfg.rpn_batch_size_per_image, cfg.rpn_positive_fraction
        )
        sel_gt = gtb[jnp.clip(m.matched_idx, 0)[pos_idx]]
        reg_targets = encode_boxes(sel_gt, anchors[pos_idx])
        box_l = smooth_l1_loss(
            deltas[pos_idx], reg_targets, beta=1.0 / 9.0, mask=pos_val[:, None]
        )
        idx_all = jnp.concatenate([pos_idx, neg_idx])
        val_all = jnp.concatenate([pos_val, neg_val])
        obj_l = jnp.sum(
            jnp.where(
                val_all,
                optax_sigmoid_ce(obj[idx_all], fg[idx_all].astype(obj.dtype)),
                0.0,
            )
        )
        return box_l, obj_l, jnp.sum(val_all)

    box_l, obj_l, n_sampled = jax.vmap(one)(
        targets.boxes, targets.labels, targets.valid, objectness, pred_deltas, keys
    )
    denom = jnp.maximum(jnp.sum(n_sampled), 1)
    return {
        "loss_objectness": jnp.sum(obj_l) / denom,
        "loss_rpn_box_reg": jnp.sum(box_l) / denom,
    }


def _select_training_samples(
    proposals: jnp.ndarray,  # [B, P, 4]
    pvalid: jnp.ndarray,  # [B, P]
    targets: Targets,
    cfg: FasterRCNNConfig,
    rng: jax.Array,
):
    """GT-augmented proposal sampling (torchvision select_training_samples
    semantics). Returns per-batch fixed [B, S, ...] sampled proposals, labels,
    regression targets, and masks."""
    all_boxes = jnp.concatenate([proposals, targets.boxes], axis=1)
    s = min(cfg.box_batch_size_per_image, all_boxes.shape[1])
    all_valid = jnp.concatenate([pvalid, targets.valid], axis=1)
    keys = jax.random.split(rng, proposals.shape[0])

    def one(boxes, bvalid, gtb, gtl, gtv, key):
        m = match_boxes(
            gtb, gtv, boxes, cfg.box_fg_iou, cfg.box_bg_iou,
            allow_low_quality_matches=False,
        )
        matched = jnp.clip(m.matched_idx, 0)
        labels = gtl[matched]
        labels = jnp.where(m.matched_idx == -1, 0, labels)
        labels = jnp.where(m.matched_idx == -2, -1, labels)
        pos = (labels > 0) & bvalid
        neg = (labels == 0) & bvalid
        pos_m, neg_m = balanced_sample(
            key, pos, neg, s, cfg.box_positive_fraction
        )
        sampled = pos_m | neg_m
        # Pack sampled entries into S fixed slots (ties -> lowest index first).
        _, idx = jax.lax.top_k(sampled.astype(jnp.float32), s)
        sel_valid = sampled[idx]
        sel_boxes = boxes[idx]
        sel_labels = jnp.where(sel_valid, labels[idx], 0)
        sel_gt = gtb[matched[idx]]
        reg_targets = encode_boxes(sel_gt, sel_boxes, cfg.bbox_reg_weights)
        return sel_boxes, sel_labels, sel_valid, reg_targets

    return jax.vmap(one)(
        all_boxes, all_valid, targets.boxes, targets.labels, targets.valid, keys
    )


def _fastrcnn_loss(class_logits, box_regression, labels, reg_targets, sel_valid):
    """classification: mean CE over sampled; regression: sum smooth-l1 over
    positives (class-specific column) / total sampled."""
    b, s, c = class_logits.shape
    flat_logits = class_logits.reshape(b * s, c)
    flat_labels = jnp.clip(labels.reshape(b * s), 0)
    flat_valid = sel_valid.reshape(b * s)
    loss_cls = softmax_cross_entropy(flat_logits, flat_labels, flat_valid)

    box_reg = box_regression.reshape(b, s, c, 4)
    cls_col = jnp.clip(labels, 0)[..., None, None]  # [B,S,1,1]
    pred = jnp.take_along_axis(box_reg, jnp.broadcast_to(cls_col, (b, s, 1, 4)), axis=2)[
        :, :, 0, :
    ]
    pos = (labels > 0) & sel_valid
    loss_box = smooth_l1_loss(pred, reg_targets, beta=1.0 / 9.0, mask=pos[..., None])
    denom = jnp.maximum(jnp.sum(sel_valid), 1)
    return loss_cls, loss_box / denom


def _postprocess_detections(
    class_logits: jnp.ndarray,  # [B, S, C]
    box_regression: jnp.ndarray,  # [B, S, 4C]
    proposals: jnp.ndarray,  # [B, S, 4]
    sel_valid: jnp.ndarray,  # [B, S]
    image_hw: Tuple[int, int],
    cfg: FasterRCNNConfig,
) -> Detections:
    b, s, c = class_logits.shape
    scores_all = jax.nn.softmax(class_logits, axis=-1)
    boxes_all = decode_boxes(box_regression, proposals, cfg.bbox_reg_weights)
    boxes_all = boxes_all.reshape(b, s, c, 4)
    boxes_all = clip_boxes_to_image(boxes_all, image_hw)

    # drop background column; flatten (proposal, class) pairs
    n_fg = c - 1
    boxes_f = boxes_all[:, :, 1:, :].reshape(b, s * n_fg, 4)
    scores_f = scores_all[:, :, 1:].reshape(b, s * n_fg)
    labels_f = jnp.broadcast_to(
        jnp.arange(1, c, dtype=jnp.int32)[None, None, :], (b, s, n_fg)
    ).reshape(b, s * n_fg)
    valid_f = jnp.broadcast_to(sel_valid[:, :, None], (b, s, n_fg)).reshape(b, s * n_fg)
    valid_f = (
        valid_f
        & (scores_f > cfg.box_score_thresh)
        & remove_small_boxes_mask(boxes_f, cfg.box_min_size)
    )

    def one(bx, sc, lb, v):
        ob, os_, ov, oi = batched_nms_padded(
            bx, sc, lb, v, cfg.box_nms_thresh, cfg.box_detections_per_img,
            candidate_cap=s * n_fg,
        )
        return ob, os_, jnp.where(ov, lb[oi], 0), ov

    ob, os_, ol, ov = jax.vmap(one)(boxes_f, scores_f, labels_f, valid_f)
    return Detections(ob, os_, ol, ov)


class FasterRCNN:
    """End-to-end Faster R-CNN pipeline over fixed-size inputs.

    `forward(variables, images, targets, train_det, rng)` mirrors the
    reference's eval_forward_fasterrcnn contract: returns
    ({loss_classifier, loss_box_reg, loss_objectness, loss_rpn_box_reg},
    Detections in original-image coordinates).
    """

    def __init__(
        self,
        config: FasterRCNNConfig = FasterRCNNConfig(),
        image_size: Tuple[int, int] = (300, 300),
        image_mean: Tuple[float, ...] = (0.0,),
        image_std: Tuple[float, ...] = (1.0,),
    ):
        self.config = config
        self.module = FasterRCNNModule(config)
        self.transform = DetectionTransform(image_size, image_mean, image_std)
        self.image_size = image_size
        self._anchor_gen = rpn_anchor_generator()
        self._level_hw: Optional[List[Tuple[int, int]]] = None

    # ---- static geometry ----

    def level_shapes(self) -> List[Tuple[int, int]]:
        if self._level_hw is None:
            h, w = self.image_size

            def run(img):
                return FasterRCNNModule(self.config).init_with_output(
                    jax.random.PRNGKey(0), img, method="features"
                )[0]

            shapes = jax.eval_shape(run, jax.ShapeDtypeStruct((1, h, w, 3), jnp.float32))
            self._level_hw = [tuple(s.shape[1:3]) for s in shapes]
        return self._level_hw

    def anchors(self) -> np.ndarray:
        return self._anchor_gen.anchors_concat(self.image_size, self.level_shapes())

    def _roi_levels(self) -> int:
        """How many FPN levels the RoI pool must cover at this frame size.

        MultiScaleRoIAlign assigns level floor(4 + log2(sqrt(area)/224))
        clipped to [2, 5]; every pooled box is clipped to the frame first,
        so sqrt(area) <= sqrt(H*W) bounds the reachable level. At the
        product 300x300 frame that bound is level 4 (P4) — P5 can NEVER
        receive a box, and its rows in the level-packed RoIAlign frame
        (ops/roi_align.py) are dead weight in both einsum passes (round 5;
        h_cat 142 -> 132). Exact: a dropped level had identically-zero
        interpolation weight for every possible RoI."""
        import math

        s_max = math.sqrt(self.image_size[0] * self.image_size[1])
        reach = math.floor(4 + math.log2(s_max / 224.0 + 1e-6)) - 2
        return max(1, min(4, int(reach) + 1))

    # ---- init ----

    def init(self, rng: jax.Array):
        h, w = self.image_size
        return self.module.init(rng, jnp.zeros((1, h, w, 3), jnp.float32))

    # ---- forward ----

    def forward(
        self,
        variables,
        images: jnp.ndarray,  # NHWC [B, H, W, 3] in [0, 1], native resolution
        targets: Targets,
        train_det: bool = False,
        rng: Optional[jax.Array] = None,
        phase_form=False,  # bool | (fh, fw): images = U-Net s2d tail phase output
        half: bool = False,  # bf16 feature path (see _half_cast)
    ) -> Tuple[Dict[str, jnp.ndarray], Detections]:
        cfg = self.config
        if rng is None:
            rng = jax.random.PRNGKey(0)
        if phase_form:
            original_hw = phase_native_hw(images, phase_form)
        else:
            original_hw = images.shape[1:3]
        images_t, targets_t = self.transform(images, targets, phase_form=phase_form)
        variables, images_t = _half_cast(variables, images_t, half)

        feats = self.module.apply(variables, images_t, method="features")
        objs, deltas = self.module.apply(variables, feats, method="rpn")
        objectness, pred_deltas, level_sizes = _flatten_rpn_outputs(objs, deltas)
        objectness = objectness.astype(jnp.float32)
        pred_deltas = pred_deltas.astype(jnp.float32)

        anchors = jnp.asarray(self.anchors())
        prop_boxes, _, prop_valid = _filter_proposals(
            jax.lax.stop_gradient(pred_deltas), anchors,
            jax.lax.stop_gradient(objectness), level_sizes,
            self.image_size, cfg, train_det,
        )

        rpn_rng, roi_rng = jax.random.split(rng)
        losses = _rpn_loss(anchors, objectness, pred_deltas, targets_t, cfg, rpn_rng)

        sel_boxes, sel_labels, sel_valid, reg_targets = _select_training_samples(
            prop_boxes, prop_valid, targets_t, cfg, roi_rng
        )

        # RoI pooling scales round to powers of two (MultiScaleRoIAlign
        # infer_scale semantics) — distinct from the anchor strides, which use
        # integer division (torchvision AnchorGenerator). Only the levels a
        # clipped box can reach are pooled (_roi_levels).
        nl = self._roi_levels()
        strides = [
            2 ** int(round(np.log2(self.image_size[0] / hw[0])))
            for hw in self.level_shapes()[:nl]
        ]
        pooled = jax.vmap(
            lambda fs, r: multiscale_roi_align(fs, r, strides, (7, 7), 2)
        )([f for f in feats[:nl]], sel_boxes)

        class_logits, box_regression = self.module.apply(
            variables, pooled, method="box_predict"
        )
        class_logits = class_logits.astype(jnp.float32)
        box_regression = box_regression.astype(jnp.float32)
        loss_cls, loss_box = _fastrcnn_loss(
            class_logits, box_regression, sel_labels, reg_targets, sel_valid
        )
        losses.update({"loss_classifier": loss_cls, "loss_box_reg": loss_box})

        dets = _postprocess_detections(
            class_logits, box_regression, sel_boxes, sel_valid, self.image_size, cfg
        )
        dets = self.transform.postprocess(dets, original_hw)
        return losses, dets

    def infer(
        self,
        variables,
        images: jnp.ndarray,
        rng: Optional[jax.Array] = None,
        phase_form=False,
        fast: bool = False,
        half: bool = False,
    ) -> Detections:
        """Pure serving path: detections without targets or losses — the
        stock torchvision eval behavior (all post-NMS proposals through the
        box head, no GT augmentation/sampling). The parity eval path stays
        `forward` (the reference's published numbers flow through sampling,
        see module docstring). `fast=True` shrinks the post-NMS proposal
        pool to cfg.serving_post_nms_top_n (the production-serving config;
        detections beyond the pool's recall are negligible at 2 classes)."""
        del rng
        cfg = self.config
        if fast:
            cfg = dataclasses.replace(
                cfg, rpn_post_nms_top_n_test=cfg.serving_post_nms_top_n
            )
        if phase_form:
            original_hw = phase_native_hw(images, phase_form)
        else:
            original_hw = images.shape[1:3]
        images_t, _ = self.transform(images, None, phase_form=phase_form)
        variables, images_t = _half_cast(variables, images_t, half)

        feats = self.module.apply(variables, images_t, method="features")
        objs, deltas = self.module.apply(variables, feats, method="rpn")
        objectness, pred_deltas, level_sizes = _flatten_rpn_outputs(objs, deltas)
        objectness = objectness.astype(jnp.float32)
        pred_deltas = pred_deltas.astype(jnp.float32)
        anchors = jnp.asarray(self.anchors())
        prop_boxes, _, prop_valid = _filter_proposals(
            pred_deltas, anchors, objectness, level_sizes,
            self.image_size, cfg, False,
        )

        nl = self._roi_levels()
        strides = [
            2 ** int(round(np.log2(self.image_size[0] / hw[0])))
            for hw in self.level_shapes()[:nl]
        ]
        pooled = jax.vmap(
            lambda fs, r: multiscale_roi_align(fs, r, strides, (7, 7), 2)
        )([f for f in feats[:nl]], prop_boxes)
        class_logits, box_regression = self.module.apply(
            variables, pooled, method="box_predict"
        )
        class_logits = class_logits.astype(jnp.float32)
        box_regression = box_regression.astype(jnp.float32)
        dets = _postprocess_detections(
            class_logits, box_regression, prop_boxes, prop_valid,
            self.image_size, cfg,
        )
        return self.transform.postprocess(dets, original_hw)
