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

    cases = sorted(n for n in dir(snap) if n.startswith("test_"))
    results = []
    for name in cases:
        try:
            getattr(snap, name)()
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
