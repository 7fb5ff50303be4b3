"""Optimizers, LR schedulers, gradient clipping, and trainable-param masks.

Rebuild of the reference's optimizer/scheduler config surface (reference:
src/config/config.py:205-260, train_detector.py:327-332, train_hallucidet.py:
429-435): sgd/adam/adamw/lion/adadelta, ReduceLROnPlateau monitored on
val_loss, clip-by-value 0.5, warmup scheduler, and head-only fine-tuning.

The plateau scheduler is host-side state that rescales the lr inside
optax.inject_hyperparams' opt_state — no recompilation when the lr drops.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax


def clip_grads_by_value(clip: float) -> optax.GradientTransformation:
    """Element-wise gradient clipping (Lightning gradient_clip_algorithm=value,
    reference: train_hallucidet.py:498-499, clip 0.5)."""
    return optax.clip(clip)


def build_optimizer(
    name: str = "adamw",
    lr: float = 1e-5,
    momentum: float = 0.9,
    weight_decay: float = 0.0005,
    gradient_clip_val: Optional[float] = 0.5,
    trainable_mask: Optional[Any] = None,
) -> optax.GradientTransformation:
    """Full training transform: [mask] -> clip-by-value -> optimizer(lr).

    The lr lives in inject_hyperparams state so PlateauScheduler can mutate it.
    `trainable_mask` is a pytree of bools (True = trainable); masked-out leaves
    get zero updates (the reference freezes via requires_grad).
    """
    def core(lr):
        table = {
            "sgd": optax.sgd(lr, momentum=momentum),
            "adam": optax.adam(lr),
            "adamw": optax.adamw(lr),
            "lion": optax.lion(lr),
            "adadelta": optax.adadelta(lr),
        }
        if name not in table:
            raise ValueError(f"unknown optimizer {name}")
        opt = table[name]
        if name == "sgd" and weight_decay:
            opt = optax.chain(optax.add_decayed_weights(weight_decay), opt)
        return opt

    tx = optax.inject_hyperparams(core)(lr=lr)
    chain = []
    if gradient_clip_val:
        chain.append(clip_grads_by_value(gradient_clip_val))
    chain.append(tx)
    out = optax.chain(*chain)
    if trainable_mask is not None:
        out = optax.masked(out, trainable_mask)
    return out


def set_learning_rate(opt_state, lr: float):
    """Rewrite the injected lr inside an optax.chain/masked state."""
    def visit(state):
        if hasattr(state, "hyperparams") and "lr" in state.hyperparams:
            state.hyperparams["lr"] = jnp.asarray(lr, dtype=jnp.float32)
            return True
        if hasattr(state, "inner_state"):
            return visit(state.inner_state)
        if isinstance(state, tuple):
            return any(visit(s) for s in state)
        return False

    assert visit(opt_state), "no injected lr found in optimizer state"
    return opt_state


def get_learning_rate(opt_state) -> Optional[float]:
    def visit(state):
        if hasattr(state, "hyperparams") and "lr" in state.hyperparams:
            return float(state.hyperparams["lr"])
        if hasattr(state, "inner_state"):
            return visit(state.inner_state)
        if isinstance(state, tuple):
            for s in state:
                got = visit(s)
                if got is not None:
                    return got
        return None

    return visit(opt_state)


@dataclasses.dataclass
class PlateauScheduler:
    """ReduceLROnPlateau (reference: config.py:248-260): when the monitored
    value stops improving for `patience` epochs, lr *= factor."""

    mode: str = "min"
    factor: float = 0.1
    patience: int = 5
    min_lr: float = 0.0
    best: Optional[float] = None
    bad_epochs: int = 0

    def step(self, metric: float, opt_state) -> bool:
        improved = (
            self.best is None
            or (self.mode == "min" and metric < self.best)
            or (self.mode == "max" and metric > self.best)
        )
        if improved:
            self.best = metric
            self.bad_epochs = 0
            return False
        self.bad_epochs += 1
        if self.bad_epochs > self.patience:
            lr = get_learning_rate(opt_state)
            new_lr = max(lr * self.factor, self.min_lr)
            set_learning_rate(opt_state, new_lr)
            self.bad_epochs = 0
            return True
        return False


@dataclasses.dataclass
class EarlyStopping:
    """EarlyStopping(monitor=val_map, patience=5, mode=max) (reference:
    train_detector.py:382)."""

    patience: int = 5
    mode: str = "max"
    min_delta: float = 0.0
    best: Optional[float] = None
    bad_epochs: int = 0

    def step(self, metric: float) -> bool:
        """Returns True when training should stop."""
        improved = (
            self.best is None
            or (self.mode == "max" and metric > self.best + self.min_delta)
            or (self.mode == "min" and metric < self.best - self.min_delta)
        )
        if improved:
            self.best = metric
            self.bad_epochs = 0
            return False
        self.bad_epochs += 1
        return self.bad_epochs >= self.patience


def warmup_lr_schedule(lr: float, warmup_iters: int, warmup_factor: float = 1.0 / 1000):
    """Linear warmup (reference: src/utils/utils.py:321-329)."""
    def schedule(step):
        alpha = jnp.clip(step / max(1, warmup_iters), 0.0, 1.0)
        return lr * (warmup_factor * (1 - alpha) + alpha)

    return schedule


# ---- trainable masks ----


def mask_from_predicate(params, predicate: Callable[[tuple], bool]):
    """Bool pytree: predicate(path_tuple) per leaf."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def to_names(path):
        return tuple(
            p.key if hasattr(p, "key") else str(p) for p in path
        )

    paths = {to_names(p): predicate(to_names(p)) for p, _ in flat}

    return jax.tree_util.tree_map_with_path(
        lambda p, _: paths[to_names(p)], params
    )


def detector_head_only_mask(params):
    """--fine-tuning-lp: update only the prediction heads (reference:
    train_detector.py:329-331 trains roi_heads/head only)."""
    head_keys = (
        "cls_score", "bbox_pred", "fc6", "fc7",  # faster-rcnn roi head
        "cls_logits", "bbox_reg", "bbox_ctrness",  # retinanet/fcos heads
        "cls_tower", "reg_tower", "rpn_conv", "rpn_cls_logits", "rpn_bbox_pred",
    )
    return mask_from_predicate(
        params, lambda path: any(any(k in seg for k in head_keys) for seg in path)
    )


def pretrained_backbone_mask(params, trainable_layers: int = 3):
    """torchvision `trainable_backbone_layers=3` semantics for pretrained
    detectors: freeze the stem + layer1, train layer2..4, FPN and heads."""
    frozen_prefixes = ("conv1", "bn1", "layer1")

    def pred(path):
        if path and path[0] == "body" and len(path) > 1:
            return not any(path[1].startswith(p) for p in frozen_prefixes)
        return True

    return mask_from_predicate(params, pred)
