"""Segmentation losses — the smp loss-zoo surface, pure jnp.

Rebuild of the reference's vendored smp losses (reference:
src/segmentation_models/losses/: dice.py, jaccard.py, tversky.py, focal.py,
lovasz.py, soft_bce.py, soft_ce.py, mcc.py, _functional.py, constants.py).
Same modes (binary / multiclass / multilabel), same hyperparameters
(smooth/eps/alpha/beta/gamma/ignore_index/label-smoothing), NHWC logits.

Shapes: binary/multilabel losses take logits [B, H, W, C] (C=1 for binary)
and targets of the same shape; multiclass takes logits [B, H, W, C] and
integer targets [B, H, W].
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

BINARY_MODE = "binary"
MULTICLASS_MODE = "multiclass"
MULTILABEL_MODE = "multilabel"


# ---------------------------------------------------------------------------
# functional core (reference: losses/_functional.py)
# ---------------------------------------------------------------------------


def soft_jaccard_score(pred, target, smooth=0.0, eps=1e-7, dims=None):
    inter = jnp.sum(pred * target, axis=dims)
    card = jnp.sum(pred + target, axis=dims)
    union = card - inter
    return (inter + smooth) / jnp.clip(union + smooth, eps)


def soft_dice_score(pred, target, smooth=0.0, eps=1e-7, dims=None):
    inter = jnp.sum(pred * target, axis=dims)
    card = jnp.sum(pred + target, axis=dims)
    return (2.0 * inter + smooth) / jnp.clip(card + smooth, eps)


def soft_tversky_score(pred, target, alpha, beta, smooth=0.0, eps=1e-7, dims=None):
    inter = jnp.sum(pred * target, axis=dims)
    fp = jnp.sum(pred * (1.0 - target), axis=dims)
    fn = jnp.sum((1.0 - pred) * target, axis=dims)
    return (inter + smooth) / jnp.clip(inter + alpha * fp + beta * fn + smooth, eps)


def focal_loss_with_logits(
    logits, target, gamma=2.0, alpha=0.25, reduction="mean",
    normalized=False, reduced_threshold=None, eps=1e-6,
):
    """Binary focal loss (reference: _functional.py focal_loss_with_logits)."""
    target = target.astype(logits.dtype)
    logpt = -_bce_with_logits(logits, target)
    pt = jnp.exp(logpt)
    if reduced_threshold is None:
        focal_term = (1.0 - pt) ** gamma
    else:
        # reference divides by reduced_threshold itself
        # (_functional.py:77) — matched exactly, not "fixed"
        focal_term = ((1.0 - pt) / reduced_threshold) ** gamma
        focal_term = jnp.where(pt < reduced_threshold, 1.0, focal_term)
    loss = -focal_term * logpt
    if alpha is not None:
        loss = loss * (alpha * target + (1 - alpha) * (1 - target))
    if normalized:
        loss = loss / jnp.clip(jnp.sum(focal_term), eps)
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "sum":
        return jnp.sum(loss)
    return loss


def _bce_with_logits(logits, target):
    return (
        jnp.maximum(logits, 0.0)
        - logits * target
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


# ---------------------------------------------------------------------------
# loss classes
# ---------------------------------------------------------------------------


class _SoftScoreLoss:
    """Shared machinery for Dice/Jaccard/Tversky (reference: dice.py:12-…)."""

    def __init__(
        self, mode, classes=None, log_loss=False, from_logits=True,
        smooth=0.0, eps=1e-7,
    ):
        assert mode in (BINARY_MODE, MULTICLASS_MODE, MULTILABEL_MODE)
        self.mode = mode
        self.classes = classes
        self.log_loss = log_loss
        self.from_logits = from_logits
        self.smooth = smooth
        self.eps = eps

    def _score(self, pred, target, dims):
        raise NotImplementedError

    def __call__(self, logits, target):
        b = logits.shape[0]
        if self.mode == MULTICLASS_MODE:
            c = logits.shape[-1]
            pred = jax.nn.softmax(logits, -1) if self.from_logits else logits
            pred = pred.reshape(b, -1, c)
            tgt = jax.nn.one_hot(target.reshape(b, -1), c, dtype=pred.dtype)
        else:
            pred = jax.nn.sigmoid(logits) if self.from_logits else logits
            c = logits.shape[-1]
            pred = pred.reshape(b, -1, c)
            tgt = target.reshape(b, -1, c).astype(pred.dtype)
        dims = (0, 1)  # aggregate over batch+pixels, per channel (smp default)
        score = self._score(pred, tgt, dims)
        loss = -jnp.log(jnp.clip(score, self.eps)) if self.log_loss else 1.0 - score
        # only count classes present in target (smp behavior)
        present = jnp.sum(tgt, axis=(0, 1)) > 0
        loss = jnp.where(present, loss, 0.0)
        if self.classes is not None:
            mask = jnp.zeros(loss.shape, bool).at[jnp.asarray(self.classes)].set(True)
            loss = jnp.where(mask, loss, 0.0)
            return jnp.sum(loss) / jnp.maximum(jnp.sum(mask & present), 1)
        return jnp.sum(loss) / jnp.maximum(jnp.sum(present), 1)


class DiceLoss(_SoftScoreLoss):
    def _score(self, pred, target, dims):
        return soft_dice_score(pred, target, self.smooth, self.eps, dims)


class JaccardLoss(_SoftScoreLoss):
    def _score(self, pred, target, dims):
        return soft_jaccard_score(pred, target, self.smooth, self.eps, dims)


class TverskyLoss(_SoftScoreLoss):
    def __init__(self, mode, alpha=0.5, beta=0.5, gamma=1.0, **kw):
        super().__init__(mode, **kw)
        self.alpha = alpha
        self.beta = beta
        self.gamma = gamma

    def _score(self, pred, target, dims):
        return soft_tversky_score(
            pred, target, self.alpha, self.beta, self.smooth, self.eps, dims
        )

    def __call__(self, logits, target):
        return super().__call__(logits, target) ** self.gamma


class FocalLoss:
    """(reference: losses/focal.py:12)"""

    def __init__(
        self, mode, alpha=None, gamma=2.0, ignore_index=None,
        reduction="mean", normalized=False, reduced_threshold=None,
    ):
        self.mode = mode
        self.alpha = alpha
        self.gamma = gamma
        self.ignore_index = ignore_index
        self.reduction = reduction
        self.normalized = normalized
        self.reduced_threshold = reduced_threshold

    def __call__(self, logits, target):
        if self.mode in (BINARY_MODE, MULTILABEL_MODE):
            mask = None
            if self.ignore_index is not None:
                mask = target != self.ignore_index
            loss = focal_loss_with_logits(
                logits, jnp.where(mask, target, 0) if mask is not None else target,
                self.gamma, self.alpha, reduction="none",
                normalized=self.normalized, reduced_threshold=self.reduced_threshold,
            )
            if mask is not None:
                loss = jnp.where(mask, loss, 0.0)
                return jnp.sum(loss) / jnp.maximum(jnp.sum(mask), 1)
            return jnp.mean(loss)
        # multiclass: one-vs-all focal per class
        c = logits.shape[-1]
        total = 0.0
        valid = (
            target != self.ignore_index if self.ignore_index is not None else None
        )
        for cls in range(c):
            cls_target = (target == cls).astype(logits.dtype)
            loss = focal_loss_with_logits(
                logits[..., cls], cls_target, self.gamma, self.alpha,
                reduction="none", normalized=self.normalized,
                reduced_threshold=self.reduced_threshold,
            )
            if valid is not None:
                loss = jnp.where(valid, loss, 0.0)
                total = total + jnp.sum(loss) / jnp.maximum(jnp.sum(valid), 1)
            else:
                total = total + jnp.mean(loss)
        return total


class SoftBCEWithLogitsLoss:
    """(reference: losses/soft_bce.py)"""

    def __init__(
        self, weight=None, ignore_index=-100, smooth_factor=None,
        pos_weight=None, reduction="mean",
    ):
        self.weight = weight
        self.ignore_index = ignore_index
        self.smooth_factor = smooth_factor
        self.pos_weight = pos_weight
        self.reduction = reduction

    def __call__(self, logits, target):
        t = target.astype(logits.dtype)
        if self.smooth_factor is not None:
            t = (1 - t) * self.smooth_factor + t * (1 - self.smooth_factor)
        loss = _bce_with_logits(logits, t)
        if self.pos_weight is not None:
            loss = loss * (t * (self.pos_weight - 1) + 1)
        if self.weight is not None:
            loss = loss * self.weight
        if self.ignore_index is not None:
            mask = target != self.ignore_index
            loss = jnp.where(mask, loss, 0.0)
            if self.reduction == "mean":
                return jnp.sum(loss) / jnp.maximum(jnp.sum(mask), 1)
        if self.reduction == "mean":
            return jnp.mean(loss)
        if self.reduction == "sum":
            return jnp.sum(loss)
        return loss


class SoftCrossEntropyLoss:
    """Label-smoothed CE (reference: losses/soft_ce.py). logits [..., C],
    target int [...]."""

    def __init__(self, reduction="mean", smooth_factor=0.0, ignore_index=-100):
        self.reduction = reduction
        self.smooth_factor = smooth_factor
        self.ignore_index = ignore_index

    def __call__(self, logits, target):
        c = logits.shape[-1]
        logp = jax.nn.log_softmax(logits, -1)
        t = jnp.clip(target, 0)
        onehot = jax.nn.one_hot(t, c, dtype=logits.dtype)
        soft = onehot * (1 - self.smooth_factor) + self.smooth_factor / c
        loss = -jnp.sum(soft * logp, axis=-1)
        mask = target != self.ignore_index
        loss = jnp.where(mask, loss, 0.0)
        if self.reduction == "mean":
            return jnp.sum(loss) / jnp.maximum(jnp.sum(mask), 1)
        if self.reduction == "sum":
            return jnp.sum(loss)
        return loss


class MCCLoss:
    """Matthews correlation coefficient loss for binary masks (reference:
    losses/mcc.py)."""

    def __init__(self, eps: float = 1e-5):
        self.eps = eps

    def __call__(self, logits, target):
        pred = jax.nn.sigmoid(logits)
        t = target.astype(pred.dtype)
        bs = t.shape[0]
        t = t.reshape(bs, -1)
        p = pred.reshape(bs, -1)
        tp = jnp.sum(p * t) + self.eps
        tn = jnp.sum((1 - p) * (1 - t)) + self.eps
        fp = jnp.sum(p * (1 - t)) + self.eps
        fn = jnp.sum((1 - p) * t) + self.eps
        num = tp * tn - fp * fn
        den = jnp.sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))
        return 1.0 - num / den


# ---------------------------------------------------------------------------
# Lovasz (reference: losses/lovasz.py)
# ---------------------------------------------------------------------------


def _lovasz_grad(gt_sorted):
    """Gradient of the Lovasz extension w.r.t. sorted errors."""
    p = gt_sorted.shape[0]
    gts = jnp.sum(gt_sorted)
    intersection = gts - jnp.cumsum(gt_sorted)
    union = gts + jnp.cumsum(1.0 - gt_sorted)
    jaccard = 1.0 - intersection / union
    return jnp.concatenate([jaccard[:1], jaccard[1:] - jaccard[:-1]])


def _lovasz_hinge_flat(logits, labels):
    signs = 2.0 * labels - 1.0
    errors = 1.0 - logits * signs
    order = jnp.argsort(-errors)
    errors_sorted = errors[order]
    grad = _lovasz_grad(labels[order])
    return jnp.dot(jax.nn.relu(errors_sorted), grad)


def _lovasz_softmax_flat(probs, labels, classes="present"):
    c = probs.shape[-1]
    losses = []
    for cls in range(c):
        fg = (labels == cls).astype(probs.dtype)
        errors = jnp.abs(fg - probs[:, cls])
        order = jnp.argsort(-errors)
        loss = jnp.dot(errors[order], _lovasz_grad(fg[order]))
        if classes == "present":
            loss = jnp.where(jnp.sum(fg) > 0, loss, 0.0)
            losses.append((loss, jnp.sum(fg) > 0))
        else:
            losses.append((loss, True))
    vals = jnp.asarray([l for l, _ in losses])
    present = jnp.asarray([p for _, p in losses])
    return jnp.sum(vals) / jnp.maximum(jnp.sum(present), 1)


class LovaszLoss:
    def __init__(self, mode, per_image=False, from_logits=True):
        assert mode in (BINARY_MODE, MULTICLASS_MODE, MULTILABEL_MODE)
        self.mode = mode
        self.per_image = per_image
        self.from_logits = from_logits

    def __call__(self, logits, target):
        if self.mode in (BINARY_MODE, MULTILABEL_MODE):
            flat_l = logits.reshape(-1)
            flat_t = target.reshape(-1).astype(logits.dtype)
            if self.per_image:
                b = logits.shape[0]
                per = jax.vmap(_lovasz_hinge_flat)(
                    logits.reshape(b, -1), target.reshape(b, -1).astype(logits.dtype)
                )
                return jnp.mean(per)
            return _lovasz_hinge_flat(flat_l, flat_t)
        probs = jax.nn.softmax(logits, -1) if self.from_logits else logits
        c = probs.shape[-1]
        return _lovasz_softmax_flat(
            probs.reshape(-1, c), target.reshape(-1)
        )
