"""Fused nearest-upsample(2x) + concat(skip) + conv3x3 — exact algebraic
rewrite for the U-Net decoder hot path.

The naive decoder block (reference semantics:
src/segmentation_models/decoders/unet/decoder.py:38-46) materializes the 2x
nearest-upsampled tensor and its concat with the skip at full resolution —
two large HBM intermediates — then convolves with thin channels (poor MXU
lane utilization). Because convolution is linear in input channels and the
upsample is a phase-structured copy, the same output decomposes exactly as:

  conv3x3(concat(up2(x), skip), W) ==
      interleave_phases(conv2x2_phase(x, W_up)) + conv3x3(skip, W_skip)

where W_up / W_skip are channel-slices of the original kernel and each output
phase (py, px) in {0,1}^2 reads at most a 2x2 window of coarse pixels, with
taps that land on the same coarse pixel pre-summed. This removes both
intermediates and cuts the upsample-path MACs by 2.25x, with bit-identical
math up to float reassociation. Weights remain stored in the unfused layout,
so checkpoints and the torch converter are unaffected.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _phase_kernel(k: jnp.ndarray, py: int, px: int) -> jnp.ndarray:
    """[3,3,Ci,O] -> [2,2,Ci,O] phase kernel (taps hitting the same coarse
    pixel summed)."""
    if py == 0:
        rows = jnp.stack([k[0], k[1] + k[2]], axis=0)  # coarse offsets -1, 0
    else:
        rows = jnp.stack([k[0] + k[1], k[2]], axis=0)  # coarse offsets 0, +1
    if px == 0:
        cols = jnp.stack([rows[:, 0], rows[:, 1] + rows[:, 2]], axis=1)
    else:
        cols = jnp.stack([rows[:, 0] + rows[:, 1], rows[:, 2]], axis=1)
    return cols  # [2, 2, Ci, O]


def _conv(x: jnp.ndarray, k: jnp.ndarray, padding) -> jnp.ndarray:
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), padding, dimension_numbers=dn
    )


def upsample2_concat_conv3x3(
    x_coarse: jnp.ndarray,  # [B, h, w, Cu]
    skip: Optional[jnp.ndarray],  # [B, 2h, 2w, Cs] or None
    kernel: jnp.ndarray,  # [3, 3, Cu + Cs, O], unfused layout
    bias: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """== conv3x3(concat([up2(x_coarse), skip]), kernel) with SAME padding."""
    b, h, w, cu = x_coarse.shape
    k_up = kernel[:, :, :cu, :]

    phases = []
    for py in (0, 1):
        row = []
        for px in (0, 1):
            k2 = _phase_kernel(k_up, py, px)
            pad = (
                ((1, 0) if py == 0 else (0, 1)),
                ((1, 0) if px == 0 else (0, 1)),
            )
            row.append(_conv(x_coarse, k2, pad))
        phases.append(row)

    # interleave phases: out[2i+py, 2j+px] = phases[py][px][i, j]
    top = jnp.stack(phases[0], axis=3)  # [B,h,w,2,O]
    bot = jnp.stack(phases[1], axis=3)
    full = jnp.stack([top, bot], axis=2)  # [B,h,2,w,2,O]
    o = full.shape[-1]
    out = full.reshape(b, 2 * h, 2 * w, o)

    if skip is not None:
        k_skip = kernel[:, :, cu:, :]
        out = out + _conv(skip, k_skip, ((1, 1), (1, 1)))
    if bias is not None:
        out = out + bias
    return out
