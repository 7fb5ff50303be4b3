"""Training orchestration: the epoch loop the reference delegates to
pytorch_lightning.Trainer (reference: train_detector.py:377-390,
train_hallucidet.py:494-547), TPU-native.

One jitted train step per module; batches stream through the prefetching
loader already device_put (sharded over the data mesh when one is given);
validation computes COCO mAP host-side; ReduceLROnPlateau watches val_loss;
EarlyStopping watches val_map; best checkpoint saved on the monitored metric.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Optional

import jax
import numpy as np

from hallucidet_tpu.metrics import MeanAveragePrecision
from hallucidet_tpu.train.checkpoint import CheckpointManager
from hallucidet_tpu.train.optim import EarlyStopping, PlateauScheduler


class Trainer:
    """n_devices > 1 runs every train/eval step data-parallel over a device
    mesh (Config.Environment.N_DEVICES, the reference's N_GPUS knob): params
    replicated, batches sharded on the leading axis, XLA inserting the
    gradient all-reduce over ICI (train/parallel.py). The global batch size
    must be divisible by n_devices (loaders use drop_last=True)."""

    def __init__(
        self,
        max_epochs: int,
        ckpt: Optional[CheckpointManager] = None,
        logger=None,
        limit_train_batches: float = 1.0,
        early_stopping: Optional[EarlyStopping] = None,
        plateau: Optional[PlateauScheduler] = None,
        seed: int = 123,
        n_devices: int = 1,
    ):
        self.max_epochs = max_epochs
        self.ckpt = ckpt
        self.logger = logger
        self.limit_train_batches = limit_train_batches
        self.early_stopping = early_stopping
        self.plateau = plateau
        self.seed = seed
        self.global_step = 0
        self.mesh = None
        if n_devices and n_devices > 1:
            from hallucidet_tpu.train.parallel import make_mesh

            self.mesh = make_mesh(n_devices)

    def _jit_step(self, step, donate: bool = False):
        if self.mesh is not None:
            from hallucidet_tpu.train.parallel import dp_jit

            return dp_jit(step, self.mesh, donate_state=donate)
        return jax.jit(step, donate_argnums=(0,) if donate else ())

    def _place(self, state, batch):
        if self.mesh is None:
            return state, batch
        from hallucidet_tpu.train.parallel import replicate, shard_batch

        return state, shard_batch(self.mesh, batch)

    def _replicate_state(self, state):
        if self.mesh is None:
            return state
        from hallucidet_tpu.train.parallel import replicate

        return replicate(self.mesh, state)

    def _log(self, payload: Dict):
        if self.logger is not None:
            self.logger.log({k: _scalar(v) for k, v in payload.items()})

    # ---- detector pretraining (reference: DetectorLit) ----

    def fit_detector(self, module, dm) -> Dict:
        train_step = self._jit_step(module.make_train_step(), donate=True)
        eval_step = self._jit_step(module.make_eval_step())
        state = self._replicate_state(
            (module.variables["params"], module.opt_state)
        )
        base_rng = jax.random.PRNGKey(self.seed)
        history = {}

        for epoch in range(self.max_epochs):
            t0 = time.time()
            loader = dm.train_dataloader()
            n_batches = max(1, int(len(loader) * self.limit_train_batches))
            for bi, batch in enumerate(loader):
                if bi >= n_batches:
                    break
                rng = jax.random.fold_in(base_rng, self.global_step)
                _, batch = self._place(state, batch)
                state, logs = train_step(state, batch, rng)
                self.global_step += 1
                logs["train/loss/step"] = self.global_step
                self._log(logs)

            # validation
            val_map_metric = MeanAveragePrecision()
            val_losses = []
            for batch in dm.val_dataloader():
                rng = jax.random.fold_in(base_rng, 10_000_000 + epoch)
                _, batch = self._place(state, batch)
                total, dets = eval_step(state[0], batch, rng)
                val_losses.append(float(total))
                val_map_metric.update_padded(dets, batch[1])
            maps = val_map_metric.compute()
            val_loss = float(np.mean(val_losses)) if val_losses else float("nan")
            val_map = maps["map_50"]
            history = {
                "valid/metrics/map": maps["map"],
                "valid/metrics/map_50": val_map,
                "valid/loss/total": val_loss,
                "valid/metrics/step": epoch,
                "epoch_time_s": time.time() - t0,
            }
            self._log(history)

            if self.ckpt is not None:
                full_state = {"params": state[0]}
                self.ckpt.maybe_save_best(full_state, val_map, epoch)
                self.ckpt.save_last(full_state)
            if self.plateau is not None:
                self.plateau.step(val_loss, state[1])
            if self.early_stopping is not None and self.early_stopping.step(val_map):
                break

        module.variables = {"params": state[0]}
        module.opt_state = state[1]
        return history

    def test_detector(self, module, dm, params=None) -> Dict:
        eval_step = self._jit_step(module.make_eval_step())
        params = params if params is not None else module.variables["params"]
        params = self._replicate_state(params)
        metric = MeanAveragePrecision()
        rng = jax.random.PRNGKey(self.seed + 999)
        for batch in dm.test_dataloader():
            _, batch = self._place(params, batch)
            _, dets = eval_step(params, batch, rng)
            metric.update_padded(dets, batch[1])
        return metric.compute()

    # ---- hallucidet training (reference: EncoderDecoderLit) ----

    def fit_hallucidet(self, module, dm) -> Dict:
        train_step = self._jit_step(module.make_train_step(), donate=True)
        eval_step = self._jit_step(module.make_eval_step(with_baselines=True))
        # train_det=True: the step optimizes the combined {ed, det} tree
        # (reference unfreeze, train_hallucidet.py:429-435); the opt_state in
        # module.__init__ is already built over that tree.
        if module.cfg.train_det:
            params0 = {
                "ed": module.ed_variables["params"],
                "det": module.det_variables["params"],
            }
        else:
            params0 = module.ed_variables["params"]
        state = self._replicate_state((
            params0,
            module.ed_variables.get("batch_stats", {}),
            module.opt_state,
        ))
        base_rng = jax.random.PRNGKey(self.seed)
        history = {}

        for epoch in range(self.max_epochs):
            t0 = time.time()
            loader = dm.train_dataloader()
            n_batches = max(1, int(len(loader) * self.limit_train_batches))
            for bi, batch in enumerate(loader):
                if bi >= n_batches:
                    break
                rng = jax.random.fold_in(base_rng, self.global_step)
                _, batch = self._place(state, batch)
                state, logs = train_step(state, batch, rng)
                self.global_step += 1
                payload = {f"train/loss/{k}": v for k, v in logs.items()}
                payload["train/loss/step"] = self.global_step
                self._log(payload)

            map_hall = MeanAveragePrecision()
            map_rgb = MeanAveragePrecision()
            map_ir = MeanAveragePrecision()
            val_losses = []
            # one bf16 cast per epoch instead of one per step (exact)
            val_state = module.precast_eval_state(state)
            for batch in dm.val_dataloader():
                rng = jax.random.fold_in(base_rng, 10_000_000 + epoch)
                _, batch = self._place(val_state, batch)
                total, logs, (d_hall, d_rgb, d_ir), _ = eval_step(
                    val_state, batch, rng
                )
                val_losses.append(float(total))
                _, t_rgb, _, t_ir = batch
                map_hall.update_padded(d_hall, t_ir)
                map_rgb.update_padded(d_rgb, t_rgb)
                map_ir.update_padded(d_ir, t_ir)
            maps_hall = map_hall.compute()
            maps_rgb = map_rgb.compute()
            maps_ir = map_ir.compute()
            val_loss = float(np.mean(val_losses)) if val_losses else float("nan")
            history = {
                "valid/metrics/map_hall": maps_hall["map_50"],
                "valid/metrics/map_rgb": maps_rgb["map_50"],
                "valid/metrics/map_ir": maps_ir["map_50"],
                "valid/loss/total": val_loss,
                "valid/metrics/step": epoch,
                "epoch_time_s": time.time() - t0,
            }
            self._log(history)

            if self.ckpt is not None:
                if module.cfg.train_det:
                    full_state = {
                        "params": state[0]["ed"],
                        "batch_stats": state[1],
                        "det_params": state[0]["det"],
                    }
                else:
                    full_state = {"params": state[0], "batch_stats": state[1]}
                self.ckpt.maybe_save_best(
                    full_state, maps_hall["map_50"], epoch
                )
                self.ckpt.save_last(full_state)
            if self.plateau is not None:
                self.plateau.step(val_loss, state[2])
            if self.early_stopping is not None and self.early_stopping.step(
                maps_hall["map_50"]
            ):
                break

        if module.cfg.train_det:
            module.ed_variables = {"params": state[0]["ed"], "batch_stats": state[1]}
            module.det_variables = dict(
                module.det_variables, params=state[0]["det"]
            )
        else:
            module.ed_variables = {"params": state[0], "batch_stats": state[1]}
        module.opt_state = state[2]
        return history

    def test_hallucidet(self, module, dm, state=None) -> Dict:
        eval_step = self._jit_step(module.make_eval_step(with_baselines=True))
        if state is None:
            params0 = module.ed_variables["params"]
            if module.cfg.train_det:
                params0 = {"ed": params0, "det": module.det_variables["params"]}
            state = (
                params0,
                module.ed_variables.get("batch_stats", {}),
            )
        state = self._replicate_state(module.precast_eval_state(state))
        map_hall, map_rgb, map_ir = (
            MeanAveragePrecision(), MeanAveragePrecision(), MeanAveragePrecision(),
        )
        rng = jax.random.PRNGKey(self.seed + 555)
        for batch in dm.test_dataloader():
            _, batch = self._place(state, batch)
            _, _, (d_hall, d_rgb, d_ir), _ = eval_step(state, batch, rng)
            _, t_rgb, _, t_ir = batch
            map_hall.update_padded(d_hall, t_ir)
            map_rgb.update_padded(d_rgb, t_rgb)
            map_ir.update_padded(d_ir, t_ir)
        return {
            "map_hall": map_hall.compute(),
            "map_rgb": map_rgb.compute(),
            "map_ir": map_ir.compute(),
        }


def _scalar(v):
    try:
        return float(v)
    except (TypeError, ValueError):
        return v
