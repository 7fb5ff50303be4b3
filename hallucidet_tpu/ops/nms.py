"""Static-shape exact NMS for XLA/TPU.

TPU-native replacement for the torchvision `nms`/`batched_nms` CUDA kernels the
reference depends on (reference: src/utils/eval_forward_fasterrcnn.py:88,136;
src/utils/eval_forward_retinanet.py:157; src/utils/eval_forward_fcos.py:80).

Design: ragged candidate lists become fixed-capacity tensors + validity masks.
Greedy NMS is inherently sequential in its survivor chain, so we sort by score
once, precompute the candidate IoU matrix tile-by-tile, and run the exact
suppression recurrence with `lax.fori_loop` over score rank. To bound the
O(N^2) matrix, callers cap candidates with `top_k` first (score-sorted
truncation — exact for any realistic `max_out << cap`).

Everything is batch-free ([N] per image); callers vmap over the batch.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from hallucidet_tpu.ops.boxes import box_iou

NEG_INF = -1e10


def top_k_by_score(
    boxes: jnp.ndarray, scores: jnp.ndarray, valid: jnp.ndarray, k: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Select top-k valid entries by score. Returns (boxes[k,4], scores[k],
    valid[k], idx[k]) sorted descending; invalid slots pushed to the end."""
    masked = jnp.where(valid, scores, NEG_INF)
    k = min(k, scores.shape[0])
    top_scores, idx = jax.lax.top_k(masked, k)
    return boxes[idx], top_scores, top_scores > NEG_INF / 2, idx


def _suppression_fixed_point(over: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Exact greedy-NMS keep mask for score-DESC-sorted candidates.

    Greedy NMS defines keep[j] = valid[j] & not exists i<j: keep[i] & over[i,j].
    Instead of an O(N)-step sequential scan, iterate the recurrence as a
    matrix fixed point: each round resolves suppression chains one level
    deeper (A kills B, dead B revives C, ...). Real detection workloads
    converge in a handful of rounds; the while_loop exits exactly at the
    fixed point, so the result equals the sequential algorithm bit-for-bit.

    The overlap matrix is BIT-PACKED along the row (suppressor) axis into
    int32 words before the loop: the [N, N] bool matrix the loop re-reads
    every round shrinks 32x (at the RPN's N=1000 per level: 1 MB -> 32 KB
    per image), and `suppressed[j] = any_i keep[i] & tri[i, j]` becomes a
    word-AND + reduce over N/32 words. The pack itself fuses into the IoU
    producer, so the f32 IoU matrix is consumed streaming (round-5 perf
    work; the unpacked form was the single largest slice of the RPN block's
    ~15 ms/step at b64 — PERF.md round-4 trace).
    """
    n = over.shape[0]
    idx = jnp.arange(n)
    # strictly-upper-triangular overlap among valid candidates
    tri = over & (idx[:, None] < idx[None, :]) & valid[:, None] & valid[None, :]
    w = (n + 31) // 32
    pad = w * 32 - n
    bits = jnp.asarray([1 << b for b in range(32)], jnp.uint32)
    # tri_packed[w, j] bit b  <->  tri[32w + b, j]; distinct powers of two
    # never carry, so the OR is a plain sum
    tri_p = jnp.pad(tri, ((0, pad), (0, 0)))
    tri_packed = jnp.sum(
        jnp.where(tri_p.reshape(w, 32, n), bits[None, :, None], 0), axis=1
    )

    def pack_keep(keep):
        kp = jnp.pad(keep, (0, pad))
        return jnp.sum(jnp.where(kp.reshape(w, 32), bits[None, :], 0), axis=1)

    def cond(state):
        keep, done, it = state
        return (~done) & (it < n)

    def body(state):
        keep, _, it = state
        suppressed = jnp.any(
            (tri_packed & pack_keep(keep)[:, None]) != 0, axis=0
        )
        new_keep = valid & ~suppressed
        return new_keep, jnp.array_equal(new_keep, keep), it + 1

    keep0 = valid
    keep, _, _ = jax.lax.while_loop(cond, body, (keep0, jnp.asarray(False), 0))
    return keep


def nms_keep_mask(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
) -> jnp.ndarray:
    """Exact greedy NMS. Inputs [N,4]/[N]; returns keep mask [N] aligned to the
    *input* order. Ties broken by input index (earlier wins), matching the
    stable score sort of the reference kernels.
    """
    n = boxes.shape[0]
    masked_scores = jnp.where(valid, scores, NEG_INF)
    # Stable descending sort by score.
    order = jnp.argsort(-masked_scores, stable=True)
    b = boxes[order]
    v = masked_scores[order] > NEG_INF / 2

    iou = box_iou(b, b)  # [N, N]
    keep_sorted = _suppression_fixed_point(iou > iou_threshold, v)
    return jnp.zeros((n,), bool).at[order].set(keep_sorted)


def nms_padded(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
    max_out: int,
    candidate_cap: int = 2048,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """NMS returning the top `max_out` survivors, score-sorted.

    Returns (boxes [max_out,4], scores [max_out], valid [max_out],
    src_idx [max_out] into the input). Candidates beyond `candidate_cap` by
    score rank are dropped before suppression (exact whenever the suppression
    chain fits in the cap, which it does for detection workloads where
    max_out << cap).
    """
    cap = min(candidate_cap, boxes.shape[0])
    b, s, v, idx0 = top_k_by_score(boxes, scores, valid, cap)
    keep = nms_keep_mask(b, s, v, iou_threshold)
    kept_scores = jnp.where(keep, s, NEG_INF)
    out_scores, sel = jax.lax.top_k(kept_scores, min(max_out, cap))
    out_valid = out_scores > NEG_INF / 2
    out_boxes = b[sel]
    out_idx = idx0[sel]
    if max_out > cap:  # pad up
        pad = max_out - cap
        out_boxes = jnp.pad(out_boxes, ((0, pad), (0, 0)))
        out_scores = jnp.pad(out_scores, (0, pad), constant_values=NEG_INF)
        out_valid = jnp.pad(out_valid, (0, pad))
        out_idx = jnp.pad(out_idx, (0, pad))
    out_scores = jnp.where(out_valid, out_scores, 0.0)
    return out_boxes, out_scores, out_valid, out_idx


def batched_nms_padded(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    categories: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
    max_out: int,
    candidate_cap: int = 2048,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Category-aware NMS: boxes with different `categories` (class id or FPN
    level id) never suppress each other. Implemented with the standard
    coordinate-offset trick so one suppression pass covers all categories."""
    max_coord = jnp.max(jnp.where(valid[..., None], boxes, 0.0))
    offsets = categories.astype(boxes.dtype) * (max_coord + 1.0)
    shifted = boxes + offsets[..., None]
    ob, os, ov, oi = nms_padded(
        shifted, scores, valid, iou_threshold, max_out, candidate_cap
    )
    # Undo the offset via gather of the original boxes.
    out_boxes = jnp.where(ov[..., None], boxes[oi], 0.0)
    return out_boxes, os, ov, oi


@functools.partial(jax.jit, static_argnames=("iou_threshold", "max_out"))
def nms_single(boxes, scores, iou_threshold: float, max_out: int):
    """Convenience jitted entry for tests/tools: all-valid inputs."""
    valid = jnp.ones(scores.shape, bool)
    return nms_padded(boxes, scores, valid, iou_threshold, max_out)
