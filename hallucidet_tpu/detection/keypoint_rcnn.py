"""Keypoint R-CNN branch — heatmap keypoint head under the pure-forward
design (reference: src/utils/eval_forward_fasterrcnn.py:148-255, which ports
torchvision's keypoint path: keypoint RoIAlign 14x14, KeypointRCNNHeads
(8x conv3x3-512+ReLU), KeypointRCNNPredictor (4x4/2 deconv + 2x bilinear ->
56x56 heatmaps), keypoints_to_heatmap CE loss, heatmaps_to_keypoints
postprocess).

Static shapes throughout: proposals come padded with validity masks; the
loss masks invalid/negative slots instead of boolean indexing; empty-GT
batches produce an exact 0 loss with intact gradients (the reference's
`keypoint_logits.sum() * 0` path).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from hallucidet_tpu.ops.boxes import box_iou
from hallucidet_tpu.ops.image_ops import resize_bilinear
from hallucidet_tpu.ops.roi_align import multiscale_roi_align


class KeypointRCNNHeads(nn.Module):
    """8x (conv3x3 512 + ReLU); conv names follow the torch Sequential
    indices ('0', '2', ..., '14') for the rule-based converter."""

    layers: Sequence[int] = (512,) * 8

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, ch in enumerate(self.layers):
            x = nn.Conv(ch, (3, 3), padding=((1, 1), (1, 1)),
                        name=str(2 * i))(x)
            x = nn.relu(x)
        return x


class KeypointRCNNPredictor(nn.Module):
    """ConvTranspose2d(512, K, 4, stride 2, pad 1) then 2x bilinear
    (align_corners=False) -> 4x the pooled resolution (14 -> 56)."""

    num_keypoints: int = 17

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # torch ConvTranspose2d(4, stride 2, pad 1) doubles the spatial size;
        # flax's integer padding counts differently, SAME gives the same
        # in*2 geometry.
        x = nn.ConvTranspose(
            self.num_keypoints, (4, 4), strides=(2, 2),
            padding="SAME", name="kps_score_lowres",
        )(x)
        h, w = x.shape[1:3]
        return resize_bilinear(x, (2 * h, 2 * w))


def keypoints_to_heatmap(
    keypoints: jnp.ndarray,  # [N, K, 3] (x, y, vis)
    rois: jnp.ndarray,  # [N, 4]
    heatmap_size: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """-> (lin_idx [N, K] int32, valid [N, K] bool). Exact port of the
    reference keypoints_to_heatmap (eval_forward_fasterrcnn.py:225-255)."""
    offset_x = rois[:, 0:1]
    offset_y = rois[:, 1:2]
    scale_x = heatmap_size / jnp.maximum(rois[:, 2:3] - rois[:, 0:1], 1e-6)
    scale_y = heatmap_size / jnp.maximum(rois[:, 3:4] - rois[:, 1:2], 1e-6)
    x = keypoints[..., 0]
    y = keypoints[..., 1]
    x_boundary = x == rois[:, 2:3]
    y_boundary = y == rois[:, 3:4]
    xi = jnp.floor((x - offset_x) * scale_x).astype(jnp.int32)
    yi = jnp.floor((y - offset_y) * scale_y).astype(jnp.int32)
    xi = jnp.where(x_boundary, heatmap_size - 1, xi)
    yi = jnp.where(y_boundary, heatmap_size - 1, yi)
    valid_loc = (xi >= 0) & (yi >= 0) & (xi < heatmap_size) & (yi < heatmap_size)
    vis = keypoints[..., 2] > 0
    valid = valid_loc & vis
    lin = yi * heatmap_size + xi
    return jnp.where(valid, lin, 0), valid


def keypointrcnn_loss(
    keypoint_logits: jnp.ndarray,  # [N, S, S, K] (NHWC)
    lin_targets: jnp.ndarray,  # [N, K]
    valid: jnp.ndarray,  # [N, K] bool
    label_smoothing: float = 0.0,
) -> jnp.ndarray:
    """Cross-entropy over the S*S heatmap cells, averaged over valid
    keypoints; exact 0 when nothing is valid (reference
    keypointrcnn_loss, :188-221; label_smoothing=0.1 when train_det)."""
    n, s, _, k = keypoint_logits.shape
    logits = jnp.transpose(keypoint_logits, (0, 3, 1, 2)).reshape(n * k, s * s)
    targets = lin_targets.reshape(n * k)
    v = valid.reshape(n * k)
    logp = jax.nn.log_softmax(logits, axis=-1)
    if label_smoothing > 0:
        n_cls = s * s
        on = 1.0 - label_smoothing
        ce = -(on * jnp.take_along_axis(logp, targets[:, None], axis=1)[:, 0]
               + label_smoothing / n_cls * logp.sum(axis=-1))
    else:
        ce = -jnp.take_along_axis(logp, targets[:, None], axis=1)[:, 0]
    denom = jnp.maximum(v.sum(), 1)
    return jnp.where(v.any(), (ce * v).sum() / denom, 0.0 * logits.sum())


def heatmaps_to_keypoints(
    keypoint_logits: jnp.ndarray,  # [N, S, S, K]
    rois: jnp.ndarray,  # [N, 4]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """argmax decode back to image coordinates -> ([N, K, 3] xy1, [N, K]
    scores) (torchvision heatmaps_to_keypoints semantics at the output
    resolution, without the per-RoI re-interpolation)."""
    n, s, _, k = keypoint_logits.shape
    widths = jnp.clip(rois[:, 2] - rois[:, 0], 1e-6)
    heights = jnp.clip(rois[:, 3] - rois[:, 1], 1e-6)
    flat = jnp.transpose(keypoint_logits, (0, 3, 1, 2)).reshape(n, k, s * s)
    idx = jnp.argmax(flat, axis=-1)
    scores = jnp.take_along_axis(
        jax.nn.softmax(flat, axis=-1), idx[..., None], axis=-1
    )[..., 0]
    yi = (idx // s).astype(jnp.float32)
    xi = (idx % s).astype(jnp.float32)
    x = rois[:, 0:1] + (xi + 0.5) * (widths[:, None] / s)
    y = rois[:, 1:2] + (yi + 0.5) * (heights[:, None] / s)
    kp = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
    return kp, scores


def match_proposals_to_gt(
    proposals: jnp.ndarray,  # [R, 4]
    gt_boxes: jnp.ndarray,  # [G, 4]
    gt_valid: jnp.ndarray,  # [G]
) -> jnp.ndarray:
    """argmax-IoU matched gt index per proposal (the sampler's
    pos_matched_idxs equivalent), int32 [R]."""
    iou = box_iou(proposals, gt_boxes)
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    return jnp.argmax(iou, axis=-1).astype(jnp.int32)


class KeypointBranch:
    """Composable keypoint branch over FPN features + sampled proposals.

    apply(variables, feats, rois, pos_mask, gt_boxes, gt_valid,
    gt_keypoints, strides) -> (loss, keypoints, kp_scores); all inputs
    batched and padded, pure and jittable.
    """

    def __init__(self, num_keypoints: int = 17, pool_size: int = 14,
                 sampling_ratio: int = 2):
        self.num_keypoints = num_keypoints
        self.pool_size = pool_size
        self.sampling_ratio = sampling_ratio
        self.head = KeypointRCNNHeads()
        self.predictor = KeypointRCNNPredictor(num_keypoints=num_keypoints)

    def init(self, rng: jax.Array):
        k1, k2 = jax.random.split(rng)
        dummy = jnp.zeros((1, self.pool_size, self.pool_size, 256))
        vh = self.head.init(k1, dummy)
        mid = self.head.apply(vh, dummy)
        vp = self.predictor.init(k2, mid)
        return {"params": {"keypoint_head": vh["params"],
                           "keypoint_predictor": vp["params"]}}

    def apply(
        self,
        variables,
        feats: List[jnp.ndarray],  # FPN levels, each [B, h, w, C]
        rois: jnp.ndarray,  # [B, R, 4] sampled proposals
        pos_mask: jnp.ndarray,  # [B, R] bool — positive & valid slots
        gt_boxes: jnp.ndarray,  # [B, G, 4]
        gt_valid: jnp.ndarray,  # [B, G]
        gt_keypoints: jnp.ndarray,  # [B, G, K, 3]
        strides: Sequence[int],
        label_smoothing: float = 0.0,
    ):
        p = variables["params"]
        pooled = jax.vmap(
            lambda fs, r: multiscale_roi_align(
                fs, r, strides, (self.pool_size, self.pool_size),
                self.sampling_ratio,
            )
        )(list(feats), rois)
        b, r = pooled.shape[:2]
        x = pooled.reshape((b * r,) + pooled.shape[2:])
        x = self.head.apply({"params": p["keypoint_head"]}, x)
        logits = self.predictor.apply({"params": p["keypoint_predictor"]}, x)
        s = logits.shape[1]
        logits = logits.reshape(b, r, s, s, self.num_keypoints)

        def one(lg, rois_i, pm, gtb, gtv, gtk):
            midx = match_proposals_to_gt(rois_i, gtb, gtv)
            kp = gtk[midx]  # [R, K, 3]
            lin, valid = keypoints_to_heatmap(kp, rois_i, s)
            valid = valid & pm[:, None] & gtv[midx][:, None]
            return keypointrcnn_loss(lg, lin, valid, label_smoothing)

        losses = jax.vmap(one)(
            logits, rois, pos_mask, gt_boxes, gt_valid, gt_keypoints
        )
        loss = jnp.mean(losses)

        flat_logits = logits.reshape(b * r, s, s, self.num_keypoints)
        kp, kp_scores = heatmaps_to_keypoints(
            flat_logits, rois.reshape(b * r, 4)
        )
        kp = kp.reshape(b, r, self.num_keypoints, 3)
        kp_scores = kp_scores.reshape(b, r, self.num_keypoints)
        return loss, kp, kp_scores
