"""smp-style generic segmentation train/valid epoch runners and meters.

Rebuild of the reference's smp utils (reference:
src/segmentation_models/utils/train.py:7-115 Epoch/TrainEpoch/ValidEpoch,
utils/meter.py AverageValueMeter, utils/metrics.py IoU/Fscore/Accuracy/
Recall/Precision, utils/functional.py iou/f_score). The runners drive a Flax
segmentation model with an optax optimizer over (image, mask) batches —
the generic segmentation workflow the smp zoo ships alongside the models.
"""

from __future__ import annotations

import sys
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax


# ---- functional metrics (reference: utils/functional.py:20-125) ----


def _threshold(x, threshold=None):
    return (x > threshold).astype(x.dtype) if threshold is not None else x


def iou(pr, gt, eps=1e-7, threshold=None):
    pr = _threshold(pr, threshold)
    inter = jnp.sum(gt * pr)
    union = jnp.sum(gt) + jnp.sum(pr) - inter + eps
    return (inter + eps) / union


jaccard = iou


def f_score(pr, gt, beta=1.0, eps=1e-7, threshold=None):
    pr = _threshold(pr, threshold)
    tp = jnp.sum(gt * pr)
    fp = jnp.sum(pr) - tp
    fn = jnp.sum(gt) - tp
    return ((1 + beta**2) * tp + eps) / (
        (1 + beta**2) * tp + beta**2 * fn + fp + eps
    )


def accuracy(pr, gt, threshold=0.5):
    pr = _threshold(pr, threshold)
    return jnp.mean((pr == gt).astype(jnp.float32))


def precision(pr, gt, eps=1e-7, threshold=None):
    pr = _threshold(pr, threshold)
    tp = jnp.sum(gt * pr)
    fp = jnp.sum(pr) - tp
    return (tp + eps) / (tp + fp + eps)


def recall(pr, gt, eps=1e-7, threshold=None):
    pr = _threshold(pr, threshold)
    tp = jnp.sum(gt * pr)
    fn = jnp.sum(gt) - tp
    return (tp + eps) / (tp + fn + eps)


# metric callables with smp's __name__ surface
class IoU:
    __name__ = "iou_score"

    def __init__(self, threshold=0.5):
        self.threshold = threshold

    def __call__(self, pr, gt):
        return iou(pr, gt, threshold=self.threshold)


class Fscore:
    __name__ = "fscore"

    def __init__(self, threshold=0.5, beta=1.0):
        self.threshold = threshold
        self.beta = beta

    def __call__(self, pr, gt):
        return f_score(pr, gt, beta=self.beta, threshold=self.threshold)


class Accuracy:
    __name__ = "accuracy"

    def __init__(self, threshold=0.5):
        self.threshold = threshold

    def __call__(self, pr, gt):
        return accuracy(pr, gt, threshold=self.threshold)


class Recall:
    __name__ = "recall"

    def __init__(self, threshold=0.5):
        self.threshold = threshold

    def __call__(self, pr, gt):
        return recall(pr, gt, threshold=self.threshold)


class Precision:
    __name__ = "precision"

    def __init__(self, threshold=0.5):
        self.threshold = threshold

    def __call__(self, pr, gt):
        return precision(pr, gt, threshold=self.threshold)


class AverageValueMeter:
    """(reference: utils/meter.py)"""

    def __init__(self):
        self.reset()

    def add(self, value, n=1):
        self.sum += value * n
        self.n += n

    @property
    def mean(self):
        return self.sum / max(self.n, 1)

    def reset(self):
        self.sum = 0.0
        self.n = 0


class Epoch:
    """Generic epoch runner (reference: utils/train.py:7-75)."""

    stage_name = "epoch"

    def __init__(self, model, loss, metrics, variables, verbose=True):
        self.model = model
        self.loss = loss
        self.metrics = metrics
        self.variables = variables
        self.verbose = verbose

    def _format_logs(self, logs):
        return ", ".join(f"{k}: {v:.4f}" for k, v in logs.items())

    def batch_update(self, x, y):
        raise NotImplementedError

    def run(self, dataloader) -> Dict[str, float]:
        loss_meter = AverageValueMeter()
        metric_meters = {m.__name__: AverageValueMeter() for m in self.metrics}
        logs = {}
        for batch in dataloader:
            x, y = batch[0], batch[1]
            loss_val, pred = self.batch_update(jnp.asarray(x), jnp.asarray(y))
            loss_meter.add(float(loss_val))
            for m in self.metrics:
                metric_meters[m.__name__].add(float(m(pred, jnp.asarray(y))))
            logs = {"loss": loss_meter.mean}
            logs.update({k: v.mean for k, v in metric_meters.items()})
            if self.verbose:
                sys.stdout.write(f"\r{self.stage_name}: {self._format_logs(logs)}")
        if self.verbose:
            sys.stdout.write("\n")
        return logs


class TrainEpoch(Epoch):
    stage_name = "train"

    def __init__(self, model, loss, metrics, variables, optimizer, verbose=True):
        super().__init__(model, loss, metrics, variables, verbose)
        self.tx = optimizer
        self.opt_state = self.tx.init(variables["params"])

        def step(variables, opt_state, x, y):
            def loss_fn(params):
                v = dict(variables)
                v["params"] = params
                if "batch_stats" in v:
                    pred, upd = self.model.apply(
                        v, x, True, mutable=["batch_stats"]
                    )
                    return self.loss(pred, y), (pred, upd["batch_stats"])
                pred = self.model.apply(v, x, True)
                return self.loss(pred, y), (pred, v.get("batch_stats", {}))

            (loss_val, (pred, new_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(variables["params"])
            updates, opt_state = self.tx.update(
                grads, opt_state, variables["params"]
            )
            params = optax.apply_updates(variables["params"], updates)
            new_vars = dict(variables)
            new_vars["params"] = params
            if "batch_stats" in new_vars:
                new_vars["batch_stats"] = new_bs
            return new_vars, opt_state, loss_val, pred

        self._step = jax.jit(step)

    def batch_update(self, x, y):
        self.variables, self.opt_state, loss_val, pred = self._step(
            self.variables, self.opt_state, x, y
        )
        return loss_val, pred


class ValidEpoch(Epoch):
    stage_name = "valid"

    def __init__(self, model, loss, metrics, variables, verbose=True):
        super().__init__(model, loss, metrics, variables, verbose)

        def step(variables, x, y):
            pred = self.model.apply(variables, x, False)
            return self.loss(pred, y), pred

        self._step = jax.jit(step)

    def batch_update(self, x, y):
        return self._step(self.variables, x, y)
