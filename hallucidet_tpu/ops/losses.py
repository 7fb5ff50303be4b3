"""Detection and reconstruction loss primitives (pure jnp, mask-aware).

Rebuilds the loss math of the reference's forwarders
(reference: src/utils/eval_forward_retinanet.py:22-80 focal/smooth-l1/IoU-family,
src/utils/eval_forward_fasterrcnn.py fastrcnn_loss path) and the pixel losses
(reference: src/losses/losses.py:28-48). All reductions accept a validity mask
so padded slots contribute exactly zero.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _masked_sum(x: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    if mask is not None:
        x = jnp.where(mask, x, 0.0)
    return jnp.sum(x)


def sigmoid_focal_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    alpha: float = 0.25,
    gamma: float = 2.0,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Elementwise focal loss summed over unmasked entries.

    targets in {0,1} (float). Matches the canonical formulation used by the
    reference's RetinaNet classification loss.
    """
    p = jax.nn.sigmoid(logits)
    ce = optax_sigmoid_ce(logits, targets)
    p_t = p * targets + (1.0 - p) * (1.0 - targets)
    loss = ce * ((1.0 - p_t) ** gamma)
    if alpha >= 0:
        alpha_t = alpha * targets + (1.0 - alpha) * (1.0 - targets)
        loss = alpha_t * loss
    return _masked_sum(loss, mask)


def optax_sigmoid_ce(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Numerically-stable binary cross entropy with logits (elementwise)."""
    return jnp.maximum(logits, 0.0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )


def smooth_l1_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    beta: float = 1.0 / 9.0,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Huber/smooth-L1 summed over unmasked entries (beta=1/9 is the RPN/
    RetinaNet default in the ported weights' training recipe)."""
    diff = jnp.abs(pred - target)
    loss = jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)
    if beta <= 0:
        loss = diff
    return _masked_sum(loss, mask)


def l1_loss(
    pred: jnp.ndarray, target: jnp.ndarray, mask: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    return _masked_sum(jnp.abs(pred - target), mask)


def softmax_cross_entropy(
    logits: jnp.ndarray,  # [N, C]
    labels: jnp.ndarray,  # [N] int
    mask: Optional[jnp.ndarray] = None,  # [N]
) -> jnp.ndarray:
    """Mean softmax CE over unmasked rows (Fast R-CNN classification loss)."""
    logz = jax.nn.logsumexp(logits, axis=-1)
    ll = jnp.take_along_axis(logits, labels[..., None], axis=-1)[..., 0]
    per_row = logz - ll
    if mask is None:
        return jnp.mean(per_row)
    denom = jnp.maximum(jnp.sum(mask), 1)
    return jnp.sum(jnp.where(mask, per_row, 0.0)) / denom


# ----- IoU-family regression losses (RetinaNet variants; reference:
# src/utils/eval_forward_retinanet.py:53-80 supports l1/smooth_l1/ciou/diou/giou)


def _pairwise_iou_terms(pred: jnp.ndarray, target: jnp.ndarray):
    """Aligned (not pairwise-matrix) IoU pieces for [N, 4] vs [N, 4]."""
    lt = jnp.maximum(pred[..., :2], target[..., :2])
    rb = jnp.minimum(pred[..., 2:], target[..., 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_p = jnp.clip(pred[..., 2] - pred[..., 0], 0.0) * jnp.clip(
        pred[..., 3] - pred[..., 1], 0.0
    )
    area_t = (target[..., 2] - target[..., 0]) * (target[..., 3] - target[..., 1])
    union = area_p + area_t - inter
    iou = inter / jnp.maximum(union, 1e-7)
    return iou, union


def giou_loss(pred, target, mask=None):
    iou, union = _pairwise_iou_terms(pred, target)
    lt = jnp.minimum(pred[..., :2], target[..., :2])
    rb = jnp.maximum(pred[..., 2:], target[..., 2:])
    wh = jnp.clip(rb - lt, 0.0)
    hull = jnp.maximum(wh[..., 0] * wh[..., 1], 1e-7)
    giou = iou - (hull - union) / hull
    return _masked_sum(1.0 - giou, mask)


def diou_loss(pred, target, mask=None):
    iou, _ = _pairwise_iou_terms(pred, target)
    pc = (pred[..., :2] + pred[..., 2:]) * 0.5
    tc = (target[..., :2] + target[..., 2:]) * 0.5
    center_d2 = jnp.sum((pc - tc) ** 2, axis=-1)
    lt = jnp.minimum(pred[..., :2], target[..., :2])
    rb = jnp.maximum(pred[..., 2:], target[..., 2:])
    diag2 = jnp.maximum(jnp.sum((rb - lt) ** 2, axis=-1), 1e-7)
    diou = iou - center_d2 / diag2
    return _masked_sum(1.0 - diou, mask)


def ciou_loss(pred, target, mask=None):
    iou, _ = _pairwise_iou_terms(pred, target)
    pc = (pred[..., :2] + pred[..., 2:]) * 0.5
    tc = (target[..., :2] + target[..., 2:]) * 0.5
    center_d2 = jnp.sum((pc - tc) ** 2, axis=-1)
    lt = jnp.minimum(pred[..., :2], target[..., :2])
    rb = jnp.maximum(pred[..., 2:], target[..., 2:])
    diag2 = jnp.maximum(jnp.sum((rb - lt) ** 2, axis=-1), 1e-7)
    pw = jnp.clip(pred[..., 2] - pred[..., 0], 1e-7)
    ph = jnp.clip(pred[..., 3] - pred[..., 1], 1e-7)
    tw = target[..., 2] - target[..., 0]
    th = jnp.maximum(target[..., 3] - target[..., 1], 1e-7)
    v = (4.0 / (jnp.pi**2)) * (
        jnp.arctan(tw / th) - jnp.arctan(pw / ph)
    ) ** 2
    alpha = jax.lax.stop_gradient(v / jnp.maximum(1.0 - iou + v, 1e-7))
    ciou = iou - center_d2 / diag2 - alpha * v
    return _masked_sum(1.0 - ciou, mask)


# ----- Pixel / reconstruction losses (reference: src/losses/losses.py)


def mse_pixel_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - target) ** 2)


def l1_pixel_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred - target))


def psnr(pred: jnp.ndarray, target: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    mse = jnp.mean((pred - target) ** 2)
    return 10.0 * jnp.log10(max_val**2 / jnp.maximum(mse, 1e-12))


def ssim(
    pred: jnp.ndarray,  # [B, H, W, C] in [0, 1]
    target: jnp.ndarray,
    max_val: float = 1.0,
    filter_size: int = 11,
    filter_sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jnp.ndarray:
    """Gaussian-windowed SSIM (mean over batch). Separable depthwise conv →
    XLA fuses this into two small convolutions; no Python loops."""
    half = filter_size // 2
    x = jnp.arange(-half, half + 1, dtype=pred.dtype)
    g = jnp.exp(-(x**2) / (2.0 * filter_sigma**2))
    g = g / jnp.sum(g)

    def blur(img):
        # separable: along H then W, per channel
        c = img.shape[-1]
        kh = jnp.tile(g.reshape(filter_size, 1, 1, 1), (1, 1, 1, c))
        kw = jnp.tile(g.reshape(1, filter_size, 1, 1), (1, 1, 1, c))
        dn = jax.lax.conv_dimension_numbers(img.shape, kh.shape, ("NHWC", "HWIO", "NHWC"))
        out = jax.lax.conv_general_dilated(
            img, kh, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c
        )
        out = jax.lax.conv_general_dilated(
            out, kw, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c
        )
        return out

    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    mu_p = blur(pred)
    mu_t = blur(target)
    mu_pp = blur(pred * pred) - mu_p * mu_p
    mu_tt = blur(target * target) - mu_t * mu_t
    mu_pt = blur(pred * target) - mu_p * mu_t
    num = (2 * mu_p * mu_t + c1) * (2 * mu_pt + c2)
    den = (mu_p**2 + mu_t**2 + c1) * (mu_pp + mu_tt + c2)
    return jnp.mean(num / den)


def ssim_loss(pred, target, max_val: float = 1.0):
    return 1.0 - ssim(pred, target, max_val)
