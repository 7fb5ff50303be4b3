"""Orbax checkpointing: best-by-metric + last, with the reference's layout
semantics (reference: train_hallucidet.py:484-490 ModelCheckpoint(save_top_k=1,
monitor=val_map, mode=max, filename='best'), manual best save :353-356,
final save :544-545, `trainer.test(ckpt_path='best')` :547)."""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    """Keeps `best` (highest metric) and `last` checkpoints under `directory`.
    State is any pytree (params/batch_stats/opt_state/step)."""

    def __init__(self, directory: str, monitor: str = "val_map", mode: str = "max"):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.monitor = monitor
        self.mode = mode
        self.best_metric: Optional[float] = None
        self.best_epoch: Optional[int] = None
        self._ckpt = ocp.StandardCheckpointer()

    def _path(self, name: str) -> str:
        return os.path.join(self.directory, name)

    def _save(self, name: str, state) -> None:
        path = self._path(name)
        self._ckpt.save(path, state, force=True)
        self._ckpt.wait_until_finished()

    def save_last(self, state) -> None:
        self._save("last", state)

    def maybe_save_best(self, state, metric: float, epoch: int) -> bool:
        improved = (
            self.best_metric is None
            or (self.mode == "max" and metric > self.best_metric)
            or (self.mode == "min" and metric < self.best_metric)
        )
        if improved:
            self.best_metric = metric
            self.best_epoch = epoch
            self._save("best", state)
        return improved

    def restore(self, name: str, target):
        """Restore into the structure of `target` (abstract pytree ok)."""
        return self._ckpt.restore(self._path(name), target=target)

    def has(self, name: str) -> bool:
        return os.path.isdir(self._path(name))


def save_pytree(path: str, tree: Any) -> None:
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(os.path.abspath(path), tree, force=True)
    ckpt.wait_until_finished()


def load_pytree(path: str, target: Any = None) -> Any:
    ckpt = ocp.StandardCheckpointer()
    return ckpt.restore(os.path.abspath(path), target=target)
