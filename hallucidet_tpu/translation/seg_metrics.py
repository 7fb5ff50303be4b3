"""Segmentation metrics — the smp metrics surface (reference:
src/segmentation_models/metrics/functional.py): `get_stats` producing
tp/fp/fn/tn per (image, class) and 17 metric functions over them with
micro / macro / weighted / *-imagewise reductions.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def get_stats(
    output: jnp.ndarray,
    target: jnp.ndarray,
    mode: str,
    ignore_index: Optional[int] = None,
    threshold: Optional[float] = None,
    num_classes: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """-> (tp, fp, fn, tn), each [batch, num_classes] (reference:
    metrics/functional.py:61).

    binary/multilabel: output/target [B, C, ...] (or [B, ..., C]; any layout —
    everything past dim 1 is flattened) with optional threshold on output.
    multiclass: integer maps [B, ...], num_classes required.
    """
    if mode == "multiclass":
        assert num_classes is not None
        b = output.shape[0]
        out = output.reshape(b, -1).astype(jnp.int32)
        tgt = target.reshape(b, -1).astype(jnp.int32)
        if ignore_index is not None:
            valid = tgt != ignore_index
        else:
            valid = jnp.ones_like(tgt, bool)
        onehot_o = jax.nn.one_hot(out, num_classes, dtype=jnp.int32)
        onehot_t = jax.nn.one_hot(tgt, num_classes, dtype=jnp.int32)
        onehot_o = onehot_o * valid[..., None]
        onehot_t = onehot_t * valid[..., None]
        tp = jnp.sum(onehot_o * onehot_t, axis=1)
        fp = jnp.sum(onehot_o * (1 - onehot_t), axis=1)
        fn = jnp.sum((1 - onehot_o) * onehot_t, axis=1)
        total = jnp.sum(valid, axis=1)[:, None]
        tn = total - tp - fp - fn
        return tp, fp, fn, tn

    assert mode in ("binary", "multilabel")
    out = output
    if threshold is not None:
        out = (out >= threshold).astype(jnp.int32)
    b, c = out.shape[0], out.shape[1]
    out = out.reshape(b, c, -1).astype(jnp.int32)
    tgt = target.reshape(b, c, -1).astype(jnp.int32)
    tp = jnp.sum(out * tgt, axis=2)
    fp = jnp.sum(out * (1 - tgt), axis=2)
    fn = jnp.sum((1 - out) * tgt, axis=2)
    tn = jnp.sum((1 - out) * (1 - tgt), axis=2)
    return tp, fp, fn, tn


def _reduce(metric_fn, tp, fp, fn, tn, reduction, class_weights=None, zero_division=0.0):
    tp = tp.astype(jnp.float32)
    fp = fp.astype(jnp.float32)
    fn = fn.astype(jnp.float32)
    tn = tn.astype(jnp.float32)
    w = (
        jnp.asarray(class_weights, jnp.float32)
        if class_weights is not None
        else jnp.ones(tp.shape[-1], jnp.float32)
    )

    def safe(fn_val, den_ok):
        return jnp.where(den_ok, fn_val, zero_division)

    if reduction == "micro":
        return metric_fn(tp.sum(), fp.sum(), fn.sum(), tn.sum())
    if reduction == "macro":
        per_cls = metric_fn(tp.sum(0), fp.sum(0), fn.sum(0), tn.sum(0))
        return jnp.mean(per_cls * w) * w.size / jnp.sum(w) if class_weights is not None else jnp.mean(per_cls)
    if reduction == "weighted":
        per_cls = metric_fn(tp.sum(0), fp.sum(0), fn.sum(0), tn.sum(0))
        weights = tp.sum(0) + fn.sum(0)
        return jnp.sum(per_cls * weights) / jnp.maximum(jnp.sum(weights), 1)
    if reduction == "micro-imagewise":
        per_img = metric_fn(tp.sum(1), fp.sum(1), fn.sum(1), tn.sum(1))
        return jnp.mean(per_img)
    if reduction in ("macro-imagewise", "weighted-imagewise"):
        per = metric_fn(tp, fp, fn, tn)  # [B, C]
        return jnp.mean(per)
    if reduction in (None, "none"):
        return metric_fn(tp, fp, fn, tn)
    raise ValueError(f"unknown reduction {reduction}")


def _metric(core):
    def wrapper(tp, fp, fn, tn, reduction=None, class_weights=None, zero_division=0.0):
        return _reduce(core, tp, fp, fn, tn, reduction, class_weights, zero_division)

    return wrapper


_eps = 1e-12


@_metric
def iou_score(tp, fp, fn, tn):
    return tp / jnp.clip(tp + fp + fn, _eps)


@_metric
def f1_score(tp, fp, fn, tn):
    return 2 * tp / jnp.clip(2 * tp + fp + fn, _eps)


def fbeta_score(tp, fp, fn, tn, beta=1.0, reduction=None, **kw):
    b2 = beta * beta

    def core(tp, fp, fn, tn):
        return (1 + b2) * tp / jnp.clip((1 + b2) * tp + b2 * fn + fp, _eps)

    return _reduce(core, tp, fp, fn, tn, reduction, **kw)


@_metric
def accuracy(tp, fp, fn, tn):
    return (tp + tn) / jnp.clip(tp + fp + fn + tn, _eps)


@_metric
def sensitivity(tp, fp, fn, tn):
    return tp / jnp.clip(tp + fn, _eps)


recall = sensitivity


@_metric
def specificity(tp, fp, fn, tn):
    return tn / jnp.clip(tn + fp, _eps)


@_metric
def balanced_accuracy(tp, fp, fn, tn):
    return (tp / jnp.clip(tp + fn, _eps) + tn / jnp.clip(tn + fp, _eps)) / 2


@_metric
def positive_predictive_value(tp, fp, fn, tn):
    return tp / jnp.clip(tp + fp, _eps)


precision = positive_predictive_value


@_metric
def negative_predictive_value(tp, fp, fn, tn):
    return tn / jnp.clip(tn + fn, _eps)


@_metric
def false_negative_rate(tp, fp, fn, tn):
    return fn / jnp.clip(fn + tp, _eps)


@_metric
def false_positive_rate(tp, fp, fn, tn):
    return fp / jnp.clip(fp + tn, _eps)


@_metric
def false_discovery_rate(tp, fp, fn, tn):
    return fp / jnp.clip(fp + tp, _eps)


@_metric
def false_omission_rate(tp, fp, fn, tn):
    return fn / jnp.clip(fn + tn, _eps)


@_metric
def positive_likelihood_ratio(tp, fp, fn, tn):
    sens = tp / jnp.clip(tp + fn, _eps)
    fpr = fp / jnp.clip(fp + tn, _eps)
    return sens / jnp.clip(fpr, _eps)


@_metric
def negative_likelihood_ratio(tp, fp, fn, tn):
    fnr = fn / jnp.clip(fn + tp, _eps)
    spec = tn / jnp.clip(tn + fp, _eps)
    return fnr / jnp.clip(spec, _eps)
