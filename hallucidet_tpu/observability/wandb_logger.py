"""Observability: wandb logging with the reference's metric-name surface
(reference: train_detector.py:53-83,125-144; train_hallucidet.py:44,145-158
— wandb.init + define_metric step axes + per-step loss dicts), degrading to a
local JSONL logger when wandb is unavailable or offline (zero-egress TPU pods).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class WandbLogger:
    """Thin wrapper: same call surface (`log`, `define_metric`, `summary`)
    whether wandb is importable or not."""

    def __init__(
        self,
        project: str = "hallucidet",
        name: str = "detector",
        config: Optional[Dict] = None,
        jsonl_dir: str = "logs",
    ):
        self.summary: Dict = {}
        self._wandb = None
        self._jsonl = None
        try:
            import wandb  # type: ignore

            mode = os.environ.get("WANDB_MODE", "offline")
            self._run = wandb.init(
                project=project, name=name, config=config or {}, mode=mode
            )
            self._wandb = wandb
        except Exception:
            os.makedirs(jsonl_dir, exist_ok=True)
            path = os.path.join(
                jsonl_dir, f"{project}_{name}_{int(time.time())}.jsonl"
            )
            self._jsonl = open(path, "a")
            self._jsonl_path = path

    def define_metric(self, name: str, step_metric: Optional[str] = None):
        if self._wandb is not None:
            self._run.define_metric(name, step_metric=step_metric)

    def log(self, payload: Dict):
        if self._wandb is not None:
            self._run.log(payload)
        elif self._jsonl is not None:
            clean = {}
            for k, v in payload.items():
                try:
                    clean[k] = float(v)
                except (TypeError, ValueError):
                    clean[k] = str(v)
            self._jsonl.write(json.dumps(clean) + "\n")
            self._jsonl.flush()

    def finish(self):
        if self._wandb is not None:
            self._run.finish()
        elif self._jsonl is not None:
            self._jsonl.close()


def define_reference_metrics(logger: WandbLogger):
    """The reference's define_metric hierarchy (train_detector.py:125-144)."""
    for split in ("train", "valid", "test"):
        logger.define_metric(f"{split}/loss/step")
        logger.define_metric(f"{split}/loss/*", step_metric=f"{split}/loss/step")
        logger.define_metric(f"{split}/metrics/step")
        logger.define_metric(
            f"{split}/metrics/*", step_metric=f"{split}/metrics/step"
        )
        logger.define_metric(f"{split}/media/step")
        logger.define_metric(f"{split}/media/*", step_metric=f"{split}/media/step")
