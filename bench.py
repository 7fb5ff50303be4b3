#!/usr/bin/env python
"""Headline benchmark: fused IR->RGB + detect throughput on LLVIP-native
frames (1024x1280), one chip — measured through the PRODUCT pipeline.

This drives `HalluciDetModule.make_eval_step` — the exact jitted step the
train/eval CLIs run (reference semantics: train_hallucidet.py:161-240) — not
a bench-only graph: IR 1ch->3ch expand, U-Net(resnet34) hallucination at
native resolution with the s2d phase-form tail handed straight to the
detector transform, Faster R-CNN R50-FPN loss forward + NMS postprocess, as
ONE XLA program. The reference publishes no speed numbers (SURVEY.md §6), so
`vs_baseline` reports measured / analytic-speed-of-light for the dominant
convolution FLOPs on this chip.

Measurement protocol (PERF.md): inter-iteration variation comes from folding
the iteration index into the step's rng key (a 2-word operand) — never from
perturbing the megapixel input; sync is a host fetch of the final scalar.

Prints exactly one JSON line.
"""

import json
import os
import time


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hallucidet_tpu.detection import pad_targets
    from hallucidet_tpu.train import HalluciDetModule, HalluciDetTrainConfig

    # batch 64: throughput-optimal serving batch from the post-RoIAlign-fusion
    # sweep (PERF.md: b32 166, b64 174 img/s; b96 blows the compile budget,
    # b128 OOMs on the pooled-RoI intermediate) — per-step fixed costs
    # amortize with batch
    batch = int(os.environ.get("BENCH_BATCH", "64"))
    hw = (1024, 1280)  # native LLVIP frame

    # --precision 16: bf16 translation net (the fast product config);
    # detector box math stays f32 (PERF.md policy).
    cfg = HalluciDetTrainConfig(
        detector="fasterrcnn", decoder_backbone="resnet34", input_size=300,
        precision=16, remat=False,
    )
    module = HalluciDetModule(cfg, jax.random.PRNGKey(0), sample_hw=(64, 64))
    assert module.use_phase_handoff, "product phase handoff must be active"

    # mode=serving swaps the loss-bearing parity forward for the
    # detections-only serving path (detection/faster_rcnn.infer)
    mode = os.environ.get("BENCH_MODE", "parity")  # parity | serving
    if mode == "serving":
        det = module.detector
        variables = module.det_variables

        def step(state, batch_, rng):
            ed_params, ed_bs = state
            _, _, ir, _ = batch_
            # raw 1-channel IR: the ResNet stem folds its kernel over the
            # replicated channels (nn/resnet.py gray_fold) — no 1->3 expand
            ed_vars = jax.tree_util.tree_map(
                lambda t: t.astype(jnp.bfloat16),
                {"params": ed_params, "batch_stats": ed_bs},
            )
            hall = module.encoder_decoder.apply(
                ed_vars, ir.astype(jnp.bfloat16), False, output_phase_form=True
            )
            dets = det.predict(
                variables, hall, phase_form=module.phase_factors, fast=True,
                half=True,
            )
            return jnp.sum(dets.scores), None, (dets, None, None), None
        eval_step = jax.jit(step)
    else:
        eval_step = jax.jit(
            module.make_eval_step(with_baselines=False, with_hallucinated=False)
        )

    state = module.precast_eval_state((
        module.ed_variables["params"],
        module.ed_variables.get("batch_stats", {}),
    ))  # one-time bf16 cast, exactly as the product eval loop does per epoch
    ir = jax.random.uniform(jax.random.PRNGKey(3), (batch, *hw, 1), jnp.float32)
    rgb = jnp.zeros((batch, *hw, 3), jnp.float32)  # unused (no baselines)
    targets = pad_targets(
        [np.array([[100, 100, 300, 400]], np.float32)] * batch,
        [np.array([1])] * batch,
        capacity=8,
    )
    data = (rgb, targets, ir, targets)
    base_rng = jax.random.PRNGKey(1)

    # warmup / compile
    out = eval_step(state, data, base_rng)
    total0 = out[0]
    # NOTE: on the axon relay block_until_ready is a no-op; a host fetch is
    # the only real synchronization point.
    float(jnp.sum(total0))

    iters = int(os.environ.get("BENCH_ITERS", "10"))
    t0 = time.perf_counter()
    last = None
    for i in range(iters):
        # per-iteration rng (tiny operand) defeats the relay's
        # identical-dispatch memoization without copying the input
        rng = jax.random.fold_in(base_rng, i + 1)
        out = eval_step(state, data, rng)
        last = out[0]
    _ = float(jnp.sum(last))  # host fetch = device sync
    dt = time.perf_counter() - t0
    imgs_per_sec = batch * iters / dt

    # Analytic speed-of-light: canonical conv/matmul FLOPs of the product
    # step, accounted per layer in hallucidet_tpu/utils/flops.py (auditable:
    # `python tools/sol_accounting.py` prints the per-stage table). 361.3
    # GFLOP/img at this geometry; supersedes the round<=3 hand estimate of
    # 275 (which undercounted the encoder).
    from hallucidet_tpu.utils.flops import (
        V5E_BF16_PEAK, product_step_gflops_per_image,
    )

    total_flop = product_step_gflops_per_image(hw) * 1e9
    sol_imgs_per_sec = V5E_BF16_PEAK / total_flop

    print(
        json.dumps(
            {
                "metric": "fused_ir2rgb_detect_llvip_1024x1280",
                "value": round(imgs_per_sec, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(imgs_per_sec / sol_imgs_per_sec, 4),
                "batch": batch,
                "dtype": "bfloat16",
                "note": "measured through HalluciDetModule.make_eval_step (the product pipeline); reference publishes no throughput; vs_baseline = fraction of analytic conv-FLOP speed-of-light on this chip (per-layer accounting: hallucidet_tpu/utils/flops.py, table via tools/sol_accounting.py)",
            }
        )
    )


if __name__ == "__main__":
    main()
