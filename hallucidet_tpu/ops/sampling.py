"""IoU matcher and balanced positive/negative sampler, jit-native.

TPU rebuild of the matching/sampling machinery the reference uses through
torchvision internals (reference: src/utils/eval_forward_fasterrcnn.py:90-99
`assign_targets_to_anchors`/`select_training_samples`,
src/utils/eval_forward_retinanet.py:163-179 per-image IoU matching).

Ragged GT lists become padded [MAX_GT, 4] boxes + validity masks; boolean
indexing becomes masked top-k. Random balanced sampling uses threaded PRNG
keys (same distribution as the reference's randperm subsampling).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from hallucidet_tpu.ops.boxes import box_iou

BELOW_LOW_THRESHOLD = -1
BETWEEN_THRESHOLDS = -2


class MatchResult(NamedTuple):
    # For each candidate (anchor/proposal): index of matched GT in [0, MAX_GT),
    # or BELOW_LOW_THRESHOLD (-1) / BETWEEN_THRESHOLDS (-2).
    matched_idx: jnp.ndarray  # [N] int32
    max_iou: jnp.ndarray  # [N] float


def match_boxes(
    gt_boxes: jnp.ndarray,  # [G, 4]
    gt_valid: jnp.ndarray,  # [G] bool
    candidates: jnp.ndarray,  # [N, 4]
    high_threshold: float,
    low_threshold: float,
    allow_low_quality_matches: bool,
) -> MatchResult:
    """Assign each candidate to its best-IoU GT with two-threshold bucketing.

    Padded GT rows are excluded from the argmax. If no GT is valid, every
    candidate is background (-1) — the reference's empty-target branch.
    """
    iou = box_iou(gt_boxes, candidates)  # [G, N]
    iou = jnp.where(gt_valid[:, None], iou, -1.0)
    matched = jnp.argmax(iou, axis=0).astype(jnp.int32)  # [N]
    max_iou = jnp.max(iou, axis=0)  # [N]

    below = max_iou < low_threshold
    between = (max_iou >= low_threshold) & (max_iou < high_threshold)
    out = jnp.where(below, BELOW_LOW_THRESHOLD, matched)
    out = jnp.where(between, BETWEEN_THRESHOLDS, out)

    if allow_low_quality_matches:
        # For each valid GT, force-match every candidate achieving that GT's
        # best IoU (including ties), regardless of thresholds.
        best_per_gt = jnp.max(iou, axis=1, keepdims=True)  # [G, 1]
        is_best = (iou == best_per_gt) & gt_valid[:, None] & (best_per_gt > 0)
        any_best = jnp.any(is_best, axis=0)  # [N]
        out = jnp.where(any_best, matched, out)

    # All-padded GT => everything background.
    no_gt = ~jnp.any(gt_valid)
    out = jnp.where(no_gt, BELOW_LOW_THRESHOLD, out)
    return MatchResult(out, max_iou)


def balanced_sample(
    key: jax.Array,
    positive: jnp.ndarray,  # [N] bool
    negative: jnp.ndarray,  # [N] bool
    batch_size: int,
    positive_fraction: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Randomly pick up to `batch_size*positive_fraction` positives and fill
    the rest with negatives (same semantics as the reference's balanced
    sampler: uniform without replacement within each class).

    Returns (pos_mask, neg_mask) over [N].
    """
    n = positive.shape[0]
    pos_idx, pos_val, neg_idx, neg_val = balanced_sample_packed(
        key, positive, negative, batch_size, positive_fraction
    )
    pos_mask = jnp.zeros((n,), bool).at[pos_idx].set(pos_val) & positive
    neg_mask = jnp.zeros((n,), bool).at[neg_idx].set(neg_val) & negative
    return pos_mask, neg_mask


def balanced_sample_packed(
    key: jax.Array,
    positive: jnp.ndarray,  # [N] bool
    negative: jnp.ndarray,  # [N] bool
    batch_size: int,
    positive_fraction: float,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """`balanced_sample` returning PACKED slots instead of [N] masks:
    (pos_idx [P], pos_valid [P], neg_idx [Q], neg_valid [Q]) with
    P = batch_size*positive_fraction, Q = batch_size. Same draw as
    balanced_sample (identical key usage); lets loss code run on the <=
    batch_size sampled entries instead of all N candidates."""
    n = positive.shape[0]
    kp, kn = jax.random.split(key)
    max_pos = int(batch_size * positive_fraction)

    def pick(k, mask, max_count):
        # Random priority among eligible entries; take top `max_count` but no
        # more than the eligible count.
        noise = jax.random.uniform(k, (n,))
        score = jnp.where(mask, noise, -1.0)
        count = jnp.minimum(jnp.sum(mask), max_count)
        _, idx = jax.lax.top_k(score, min(max_count, n))
        rank = jnp.arange(min(max_count, n))
        return idx, rank < count, count

    pos_idx, pos_val, num_pos = pick(kp, positive, max_pos)
    max_neg = batch_size  # upper bound; actual clipped below
    neg_budget = jnp.minimum(batch_size - num_pos, jnp.sum(negative))
    noise = jax.random.uniform(kn, (n,))
    score = jnp.where(negative, noise, -1.0)
    _, neg_idx = jax.lax.top_k(score, min(max_neg, n))
    rank = jnp.arange(min(max_neg, n))
    neg_val = rank < neg_budget
    return pos_idx, pos_val, neg_idx, neg_val
