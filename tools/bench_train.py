#!/usr/bin/env python
"""Training-step throughput: the reference recipe (batch 8 @1024x1280 LLVIP,
remat, --precision 16) through `HalluciDetModule.make_train_step` — the exact
jitted step `train_hallucidet.py` runs (reference semantics:
train_hallucidet.py:161-240, Adam over enc-dec params, grad clip 0.5).

Protocol (PERF.md): the optimizer state mutates every step, so repeated
dispatches are never identical (no relay memoization concern); sync is the
host fetch of the loss scalar. Env: B=<batch> ITERS=<n>.
"""

import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from hallucidet_tpu.detection import pad_targets
from hallucidet_tpu.train import HalluciDetModule, HalluciDetTrainConfig


def main():
    from hallucidet_tpu.train import auto_remat

    batch = int(os.environ.get("B", "8"))
    iters = int(os.environ.get("ITERS", "6"))
    renv = os.environ.get("REMAT", "auto")  # auto | 0 | 1
    remat = auto_remat(16, batch) if renv == "auto" else renv == "1"
    cfg = HalluciDetTrainConfig(
        detector="fasterrcnn", decoder_backbone="resnet34", input_size=300,
        precision=16, remat=remat,
    )
    m = HalluciDetModule(cfg, jax.random.PRNGKey(0), sample_hw=(64, 64))
    print("phase handoff:", m.use_phase_handoff, " gray fold:",
          m.use_gray_fold, " remat:", remat)

    hw = (1024, 1280)
    ir = jax.random.uniform(jax.random.PRNGKey(3), (batch, *hw, 1), jnp.float32)
    rgb = jnp.zeros((batch, *hw, 3), jnp.float32)
    t = pad_targets(
        [np.array([[100, 100, 300, 400]], np.float32)] * batch,
        [np.array([1])] * batch, 8,
    )
    data = (rgb, t, ir, t)
    step = jax.jit(m.make_train_step())
    state = (m.ed_variables["params"], m.ed_variables.get("batch_stats", {}),
             m.opt_state)
    state, logs = step(state, data, jax.random.PRNGKey(1))
    float(logs["total"])  # compile + sync

    t0 = time.perf_counter()
    for i in range(iters):
        state, logs = step(
            state, data, jax.random.fold_in(jax.random.PRNGKey(2), i)
        )
    print("warm total:", float(logs["total"]))  # host fetch = device sync
    dt = (time.perf_counter() - t0) / iters
    print(f"train step: {dt*1000:.1f} ms/step  ({batch/dt:.1f} img/s)")


if __name__ == "__main__":
    main()
