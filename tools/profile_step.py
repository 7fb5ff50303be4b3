#!/usr/bin/env python
"""Trace the product eval step (HalluciDetModule.make_eval_step) on the real
TPU and dump an xplane for tools/xplane_top.py.

Usage: python tools/profile_step.py [outdir] [mode]
  mode: parity (default) | serving | unet | detector | train
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

from hallucidet_tpu.detection import pad_targets
from hallucidet_tpu.train import HalluciDetModule, HalluciDetTrainConfig


def main():
    import os

    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/prof_step"
    mode = sys.argv[2] if len(sys.argv) > 2 else "parity"
    batch = int(os.environ.get("B", "8"))
    hw = (1024, 1280)

    from hallucidet_tpu.train import auto_remat

    cfg = HalluciDetTrainConfig(
        detector="fasterrcnn", decoder_backbone="resnet34", input_size=300,
        precision=16,
        remat=(mode == "train") and auto_remat(16, batch, hw),
    )
    module = HalluciDetModule(cfg, jax.random.PRNGKey(0), sample_hw=(64, 64))

    ir = jax.random.uniform(jax.random.PRNGKey(3), (batch, *hw, 1), jnp.float32)
    rgb = jnp.zeros((batch, *hw, 3), jnp.float32)
    targets = pad_targets(
        [np.array([[100, 100, 300, 400]], np.float32)] * batch,
        [np.array([1])] * batch, capacity=8,
    )
    data = (rgb, targets, ir, targets)
    state = (module.ed_variables["params"],
             module.ed_variables.get("batch_stats", {}))

    if mode == "detector":
        # detector alone on a pre-made phase tensor (the handoff input)
        det = module.detector
        dv = module.det_variables
        fh, fw = module.phase_factors
        phase = jax.random.uniform(
            jax.random.PRNGKey(5),
            (batch, hw[0] // fh, hw[1] // fw, 3 * fh * fw),
            jnp.float32,
        )

        def fn(variables, x, rng):
            losses, dets = det.calculate_loss(
                variables, x, targets, train_det=False, rng=rng,
                phase_form=module.phase_factors,
            )
            return losses, dets.scores
        step = jax.jit(fn)
        args = lambda i: (dv, phase, jax.random.fold_in(jax.random.PRNGKey(1), i))
    elif mode == "unet":
        def fn(ed_params, ed_bs, x):
            ed_vars = jax.tree_util.tree_map(
                lambda t: t.astype(jnp.bfloat16),
                {"params": ed_params, "batch_stats": ed_bs},
            )
            from hallucidet_tpu.ops.image_ops import expand_one_channel_to_three
            ir3 = expand_one_channel_to_three(x).astype(jnp.bfloat16)
            return module.encoder_decoder.apply(
                ed_vars, ir3, False, output_phase_form=True
            ).astype(jnp.float32).sum()
        step = jax.jit(fn)
        args = lambda i: (state[0], state[1],
                          ir + jnp.float32(i) * 1e-6)
    elif mode == "train":
        # the reference training recipe: fwd + bwd through the frozen
        # detector, remat, Adam update (tools/bench_train.py semantics)
        train_step = jax.jit(module.make_train_step())
        tstate = (module.ed_variables["params"],
                  module.ed_variables.get("batch_stats", {}),
                  module.opt_state)
        step = train_step
        args = lambda i: (tstate, data, jax.random.fold_in(jax.random.PRNGKey(1), i))
    elif mode == "serving":
        # the bench.py serving path: detections-only infer(fast=True)
        det = module.detector
        dv = module.det_variables

        def fn(st, batch_, rng):
            ed_params, ed_bs = st
            _, _, ir_, _ = batch_
            ed_vars = jax.tree_util.tree_map(
                lambda t: t.astype(jnp.bfloat16),
                {"params": ed_params, "batch_stats": ed_bs},
            )
            hall = module.encoder_decoder.apply(
                ed_vars, ir_.astype(jnp.bfloat16), False, output_phase_form=True
            ).astype(jnp.float32)
            dets = det.predict(
                dv, hall, phase_form=module.phase_factors, fast=True
            )
            return jnp.sum(dets.scores)
        step = jax.jit(fn)
        pstate = module.precast_eval_state(state)
        args = lambda i: (pstate, data, jax.random.fold_in(jax.random.PRNGKey(1), i))
    else:
        eval_step = jax.jit(
            module.make_eval_step(with_baselines=False, with_hallucinated=False)
        )
        step = eval_step
        # pre-cast params exactly as bench.py / the product eval loop do
        pstate = module.precast_eval_state(state)
        args = lambda i: (pstate, data, jax.random.fold_in(jax.random.PRNGKey(1), i))

    # compile + settle
    out = step(*args(0))
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))

    with jax.profiler.trace(outdir):
        last = None
        for i in range(3):
            last = step(*args(i + 1))
        float(jnp.sum(jax.tree_util.tree_leaves(last)[0]))
    print("trace written to", outdir)


if __name__ == "__main__":
    main()
