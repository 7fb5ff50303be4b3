"""Box primitives: IoU, format conversion, clipping, and the delta box coder.

TPU-native rebuild of the torchvision box utilities the reference consumes
through its loss forwarders (reference: src/utils/eval_forward_fasterrcnn.py:86-94,
src/utils/eval_forward_retinanet.py:64-73,173). Everything here is pure jnp with
static shapes: padded box tensors + validity masks instead of ragged lists, so
the whole detection graph stays inside one XLA program.

Boxes are `[..., 4]` in xyxy (x1, y1, x2, y2) unless stated otherwise.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp

# Clamp for dw/dh in decode, matching the standard log-space clip
# (torchvision BoxCoder bbox_xform_clip = log(1000/16)).
BBOX_XFORM_CLIP = math.log(1000.0 / 16.0)


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area of xyxy boxes. [..., 4] -> [...]."""
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU. [N, 4] x [M, 4] -> [N, M].

    Broadcast-friendly: leading batch dims are supported as
    [..., N, 4] x [..., M, 4] -> [..., N, M].
    """
    area1 = box_area(boxes1)  # [..., N]
    area2 = box_area(boxes2)  # [..., M]
    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]  # [..., N, M]
    union = area1[..., :, None] + area2[..., None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


def generalized_box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise GIoU. [..., N, 4] x [..., M, 4] -> [..., N, M]."""
    iou = box_iou(boxes1, boxes2)
    lt = jnp.minimum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.maximum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    hull = wh[..., 0] * wh[..., 1]
    area1 = box_area(boxes1)[..., :, None]
    area2 = box_area(boxes2)[..., None, :]
    inter_lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    inter_rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    inter_wh = jnp.clip(inter_rb - inter_lt, 0.0)
    inter = inter_wh[..., 0] * inter_wh[..., 1]
    union = area1 + area2 - inter
    return jnp.where(hull > 0, iou - (hull - union) / hull, iou)


def clip_boxes_to_image(boxes: jnp.ndarray, size_hw: Tuple[int, int]) -> jnp.ndarray:
    """Clip xyxy boxes to [0, W] x [0, H]. `size_hw` = (height, width)."""
    h, w = size_hw
    x1 = jnp.clip(boxes[..., 0], 0.0, w)
    y1 = jnp.clip(boxes[..., 1], 0.0, h)
    x2 = jnp.clip(boxes[..., 2], 0.0, w)
    y2 = jnp.clip(boxes[..., 3], 0.0, h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def xyxy_to_cxcywh(boxes: jnp.ndarray) -> jnp.ndarray:
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [(x1 + x2) * 0.5, (y1 + y2) * 0.5, x2 - x1, y2 - y1], axis=-1
    )


def cxcywh_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    cx, cy, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1
    )


def xyxy_to_xywh(boxes: jnp.ndarray) -> jnp.ndarray:
    """xyxy -> (x1, y1, w, h); parity with reference Utils bbox helpers
    (reference: src/utils/utils.py:70-133)."""
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate([x1, y1, x2 - x1, y2 - y1], axis=-1)


def xywh_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    x1, y1, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate([x1, y1, x1 + w, y1 + h], axis=-1)


def encode_boxes(
    reference_boxes: jnp.ndarray,
    proposals: jnp.ndarray,
    weights: Tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.0),
) -> jnp.ndarray:
    """Encode gt boxes relative to anchors/proposals as (dx, dy, dw, dh).

    Matches the delta parameterization used by the reference's box coders
    (reference: src/utils/eval_forward_fasterrcnn.py:86 `box_coder.encode`).
    Both inputs [..., 4] xyxy; returns [..., 4] deltas.
    """
    wx, wy, ww, wh = weights
    px1, py1, px2, py2 = jnp.split(proposals, 4, axis=-1)
    gx1, gy1, gx2, gy2 = jnp.split(reference_boxes, 4, axis=-1)

    pw = px2 - px1
    ph = py2 - py1
    pcx = px1 + 0.5 * pw
    pcy = py1 + 0.5 * ph

    gw = gx2 - gx1
    gh = gy2 - gy1
    gcx = gx1 + 0.5 * gw
    gcy = gy1 + 0.5 * gh

    # Guard against degenerate (padded) proposals: avoid div-by-zero / log(0)
    # without poisoning gradients; padded slots are masked out downstream.
    pw = jnp.maximum(pw, 1e-6)
    ph = jnp.maximum(ph, 1e-6)
    gw = jnp.maximum(gw, 1e-6)
    gh = jnp.maximum(gh, 1e-6)

    dx = wx * (gcx - pcx) / pw
    dy = wy * (gcy - pcy) / ph
    dw = ww * jnp.log(gw / pw)
    dh = wh * jnp.log(gh / ph)
    return jnp.concatenate([dx, dy, dw, dh], axis=-1)


def decode_boxes(
    deltas: jnp.ndarray,
    anchors: jnp.ndarray,
    weights: Tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.0),
    clip: float = BBOX_XFORM_CLIP,
) -> jnp.ndarray:
    """Decode (dx, dy, dw, dh) deltas on anchors -> xyxy boxes.

    deltas: [..., K*4] with K classes sharing anchors [..., 4], or [..., 4].
    Returns same shape as deltas.
    """
    orig_shape = deltas.shape
    deltas = deltas.reshape(orig_shape[:-1] + (-1, 4))
    anchors = anchors[..., None, :]

    wx, wy, ww, wh = weights
    ax1, ay1, ax2, ay2 = jnp.split(anchors, 4, axis=-1)
    aw = ax2 - ax1
    ah = ay2 - ay1
    acx = ax1 + 0.5 * aw
    acy = ay1 + 0.5 * ah

    dx = deltas[..., 0:1] / wx
    dy = deltas[..., 1:2] / wy
    dw = jnp.minimum(deltas[..., 2:3] / ww, clip)
    dh = jnp.minimum(deltas[..., 3:4] / wh, clip)

    pcx = dx * aw + acx
    pcy = dy * ah + acy
    pw = jnp.exp(dw) * aw
    ph = jnp.exp(dh) * ah

    out = jnp.concatenate(
        [pcx - 0.5 * pw, pcy - 0.5 * ph, pcx + 0.5 * pw, pcy + 0.5 * ph], axis=-1
    )
    return out.reshape(orig_shape)


def remove_small_boxes_mask(boxes: jnp.ndarray, min_size: float) -> jnp.ndarray:
    """Validity mask for boxes with both sides >= min_size. [..., 4] -> [...]."""
    ws = boxes[..., 2] - boxes[..., 0]
    hs = boxes[..., 3] - boxes[..., 1]
    return (ws >= min_size) & (hs >= min_size)


def resize_boxes(
    boxes: jnp.ndarray,
    original_size_hw: Tuple[int, int] | jnp.ndarray,
    new_size_hw: Tuple[int, int] | jnp.ndarray,
) -> jnp.ndarray:
    """Rescale boxes from one image size to another (reference:
    src/models/custom_generalized_transform.py:325-338). Sizes are (h, w);
    array sizes allowed for per-image traced shapes."""
    if isinstance(original_size_hw, tuple):
        oh, ow = float(original_size_hw[0]), float(original_size_hw[1])
    else:
        oh, ow = original_size_hw[..., 0], original_size_hw[..., 1]
    if isinstance(new_size_hw, tuple):
        nh, nw = float(new_size_hw[0]), float(new_size_hw[1])
    else:
        nh, nw = new_size_hw[..., 0], new_size_hw[..., 1]
    ratio_w = nw / ow
    ratio_h = nh / oh
    x1 = boxes[..., 0] * ratio_w
    y1 = boxes[..., 1] * ratio_h
    x2 = boxes[..., 2] * ratio_w
    y2 = boxes[..., 3] * ratio_h
    return jnp.stack([x1, y1, x2, y2], axis=-1)
