"""Detector pretraining module — the reference's DetectorLit re-imagined as a
pure jitted train step + host loop hooks (reference: train_detector.py:85-348).

Semantics preserved:
- IR modality expands 1ch->3ch before the detector (train_detector.py:153-154);
- weighted loss sum with the reference's per-family gating (:167-179);
- validation computes COCO mAP on detections (train_det=False);
- Adam(lr 1e-4 recipe) over all trainable params, head-only with
  --fine-tuning-lp (:327-332); grad-clip by value.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from hallucidet_tpu.detection import Detector, Targets
from hallucidet_tpu.metrics import MeanAveragePrecision
from hallucidet_tpu.ops.image_ops import expand_one_channel_to_three
from hallucidet_tpu.train import optim as optim_lib


@dataclasses.dataclass
class DetectorTrainConfig:
    detector: str = "fasterrcnn"
    n_classes: int = 2
    input_size: int = 300
    modality: str = "rgb"
    lr: float = 1e-4
    optimizer: str = "adam"
    gradient_clip_val: float = 0.5
    fine_tuning_lp: bool = False
    pretrained: bool = True
    loss_weights: Optional[Dict[str, float]] = None


class DetectorModule:
    """Holds the detector + optimizer; exposes jitted train/eval steps that
    are shardable over a data mesh (state replicated, batch sharded)."""

    def __init__(self, cfg: DetectorTrainConfig, rng: jax.Array):
        self.cfg = cfg
        self.detector = Detector(
            name=cfg.detector, pretrained=cfg.pretrained,
            n_classes=cfg.n_classes, size=cfg.input_size,
        )
        self.variables = self.detector.init(rng)
        params = self.variables["params"]
        if cfg.fine_tuning_lp:
            mask = optim_lib.detector_head_only_mask(params)
        elif cfg.pretrained:
            mask = optim_lib.pretrained_backbone_mask(params)
        else:
            mask = None
        self.tx = optim_lib.build_optimizer(
            cfg.optimizer, cfg.lr,
            gradient_clip_val=cfg.gradient_clip_val, trainable_mask=mask,
        )
        self.opt_state = self.tx.init(params)
        self.weights = cfg.loss_weights or {
            "det_regression": 0.1, "det_classification": 0.1,
            "det_objectness": 0.1, "det_rpn_box_reg": 0.1,
            "det_bbox_ctrness": 0.1,
        }
        self._train_step = None
        self._eval_step = None

    # ---- loss weighting (reference: train_detector.py:162-179) ----

    def weighted_total(self, losses: Dict[str, jnp.ndarray]) -> Tuple[jnp.ndarray, Dict]:
        name = self.detector.name
        w = self.weights
        out = dict(losses)
        if name == "fasterrcnn":
            out["classification"] = losses["loss_classifier"]
            out["bbox_regression"] = losses["loss_box_reg"]
        out["bbox_regression"] = out["bbox_regression"] * w["det_regression"]
        out["classification"] = out["classification"] * w["det_classification"]
        out["loss_objectness"] = (
            losses["loss_objectness"] * w["det_objectness"]
            if name == "fasterrcnn" else 0.0
        )
        out["loss_rpn_box_reg"] = (
            losses["loss_rpn_box_reg"] * w["det_rpn_box_reg"]
            if name == "fasterrcnn" else 0.0
        )
        out["bbox_ctrness"] = (
            losses["bbox_ctrness"] * w["det_bbox_ctrness"]
            if name == "fcos" else 0.0
        )
        total = (
            out["bbox_regression"] + out["classification"]
            + out["loss_objectness"] + out["loss_rpn_box_reg"]
            + out["bbox_ctrness"]
        )
        return total, out

    def _prep_images(self, images: jnp.ndarray) -> jnp.ndarray:
        if images.shape[-1] == 1:
            return expand_one_channel_to_three(images)
        return images

    # ---- steps ----

    def make_train_step(self):
        detector, tx = self.detector, self.tx

        def step(state, batch, rng):
            params, opt_state = state
            images, targets = batch
            images = self._prep_images(images)

            def loss_fn(p):
                losses, _ = detector.calculate_loss(
                    {"params": p}, images, targets, train_det=True, rng=rng
                )
                total, weighted = self.weighted_total(losses)
                return total, weighted

            (total, weighted), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            logs = {"train/loss/total": total}
            for k, v in weighted.items():
                logs[f"train/loss/{k}"] = jnp.asarray(v)
            return (params, opt_state), logs

        return step

    def make_eval_step(self):
        detector = self.detector

        def step(params, batch, rng):
            images, targets = batch
            images = self._prep_images(images)
            losses, dets = detector.calculate_loss(
                {"params": params}, images, targets, train_det=False, rng=rng
            )
            total, weighted = self.weighted_total(losses)
            return total, dets

        return step
