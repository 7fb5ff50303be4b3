#!/usr/bin/env python
"""Probe: does batch->W packing restore the wide-W regime for the W-bound
encoder convs? (VERDICT r3 next #1; PERF.md layer1 H-fold negative result
showed the same folded kernel class at 73 GF/ms @W=320 vs 177 @W=640.)

Times matched-FLOP conv classes, packed vs unpacked, RELATIVE comparison only
(PERF.md measurement protocol: fori_loop with several chained ops per
iteration, perturb the small kernel operand, subtract the ~1.36 ms/iter relay
overhead, sync by host fetch).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 24
CHAIN = 4  # convs per loop iteration
LOOP_MS = 1.36  # relay fori_loop fixed overhead per iteration


def time_conv(shape, kshape, stride=1, label=""):
    """ms per conv at bf16, amortized over a fori_loop chain."""
    x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), kshape, jnp.bfloat16) * 0.01

    def body(i, carry):
        y, kk = carry
        kk = kk + jnp.float32(1e-6).astype(jnp.bfloat16)  # perturb small operand
        for _ in range(CHAIN):
            y = jax.lax.conv_general_dilated(
                y, kk, (stride, stride), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        return y, kk

    if stride != 1:
        raise NotImplementedError

    @jax.jit
    def run(x, k):
        y, _ = jax.lax.fori_loop(0, ITERS, body, (x, k))
        return jnp.sum(y.astype(jnp.float32))

    float(run(x, k))  # compile + warm
    t0 = time.perf_counter()
    v = float(run(x, k))
    dt = (time.perf_counter() - t0) * 1e3
    per_conv = (dt - ITERS * LOOP_MS) / (ITERS * CHAIN)
    gflop = 2 * np.prod(kshape) * shape[0] * shape[1] * shape[2] / 1e9
    print(f"{label:44s} {per_conv:7.2f} ms/conv  {gflop / per_conv:7.1f} GF/ms"
          f"  ({'finite' if np.isfinite(v) else 'NONFINITE'})")
    return per_conv


def main():
    B = 64
    print(f"== layer1 class: 3x3 64->64 @256x320, batch {B} ==")
    t_base = time_conv((B, 256, 320, 64), (3, 3, 64, 64), label="unpacked")
    for k in (2, 4, 8):
        time_conv((B // k, 256, k * 322, 64), (3, 3, 64, 64),
                  label=f"W-packed k={k} (W={k * 322})")
    print("== layer1 H2-folded class: 3x3 128->128 @128xW ==")
    time_conv((B, 128, 320, 128), (3, 3, 128, 128), label="folded, unpacked")
    for k in (2, 4):
        time_conv((B // k, 128, k * 322, 128), (3, 3, 128, 128),
                  label=f"folded + W-packed k={k}")
    print(f"== layer2 class: 3x3 128->128 @128x160 ==")
    time_conv((B, 128, 160, 128), (3, 3, 128, 128), label="unpacked")
    for k in (4, 8):
        time_conv((B // k, 128, k * 162, 128), (3, 3, 128, 128),
                  label=f"W-packed k={k}")
    print(f"== layer3 class: 3x3 256->256 @64x80 ==")
    time_conv((B, 64, 80, 256), (3, 3, 256, 256), label="unpacked")
    for k in (8,):
        time_conv((B // k, 64, k * 82, 256), (3, 3, 256, 256),
                  label=f"W-packed k={k}")
    print(f"== layer4 class: 3x3 512->512 @32x40 ==")
    time_conv((B, 32, 40, 512), (3, 3, 512, 512), label="unpacked")
    for k in (8,):
        time_conv((B // k, 32, k * 42, 512), (3, 3, 512, 512),
                  label=f"W-packed k={k}")
    print(f"== stem class: 7x7 grayfold 1->64 s2 @1024x1280 — skipped "
          f"(strided probe not implemented; measure in-context) ==")


if __name__ == "__main__":
    main()
