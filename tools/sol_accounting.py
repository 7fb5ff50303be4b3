#!/usr/bin/env python
"""Print the speed-of-light decomposition table (VERDICT r3 next #7).

Per-stage canonical GFLOP/image (hallucidet_tpu/utils/flops.py), per-stage
SOL throughput on one v5e, and — when measured per-stage times are passed —
utilization. Measured defaults are the current PERF.md trace numbers; refresh
them after re-tracing (tools/profile_step.py + tools/xplane_top.py).

    python tools/sol_accounting.py [--batch 8] [--unet-ms X] [--det-ms Y] \
        [--step-ms Z]
"""

import argparse

from hallucidet_tpu.utils.flops import (
    V5E_BF16_PEAK,
    detector_fasterrcnn_entries,
    stage_gflops,
    unet_resnet34_entries,
)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", default="1024x1280")
    ap.add_argument("--batch", type=int, default=8,
                    help="batch the measured times were traced at")
    ap.add_argument("--unet-ms", type=float, default=None,
                    help="measured U-Net ms/batch (profile_step.py unet)")
    ap.add_argument("--det-ms", type=float, default=None,
                    help="measured detector ms/batch (mode=detector)")
    ap.add_argument("--step-ms", type=float, default=None,
                    help="measured fused product step ms/batch")
    ap.add_argument("--per-layer", action="store_true")
    args = ap.parse_args(argv)
    hw = tuple(int(x) for x in args.hw.split("x"))

    if args.per_layer:
        for n, f in unet_resnet34_entries(hw):
            print(f"{n:34s} {f / 1e9:8.1f} GFLOP/img")
        for n, f in detector_fasterrcnn_entries():
            print(f"{n:34s} {f / 1e9:8.1f} GFLOP/img")
        print()

    stages = stage_gflops(hw)
    print(f"{'stage':12s} {'GFLOP/img':>10s} {'SOL img/s':>10s} "
          f"{'meas ms/b':>10s} {'meas img/s':>10s} {'util':>6s}")
    measured = {
        "encoder": None, "decoder": None,
        "detector": args.det_ms,
        "total": args.step_ms,
    }
    if args.unet_ms is not None:
        # split the U-Net time by FLOP share (the trace's per-op lines give
        # the true split; this is the coarse default)
        share = stages["encoder"] / (stages["encoder"] + stages["decoder"])
        measured["encoder"] = args.unet_ms * share
        measured["decoder"] = args.unet_ms * (1 - share)
    for k in ("encoder", "decoder", "detector", "total"):
        g = stages[k]
        sol = V5E_BF16_PEAK / (g * 1e9)
        ms = measured[k]
        if ms is None:
            print(f"{k:12s} {g:10.1f} {sol:10.1f} {'—':>10s} {'—':>10s} {'—':>6s}")
        else:
            ips = args.batch / (ms / 1e3)
            print(f"{k:12s} {g:10.1f} {sol:10.1f} {ms:10.1f} {ips:10.1f} "
                  f"{ips / sol:6.1%}")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
