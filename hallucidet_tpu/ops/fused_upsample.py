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


# ---------------------------------------------------------------------------
# Space-to-depth (phase-form) conv transforms — the decoder-tail fast path.
#
# XLA's thin-channel convs at full resolution (16ch @ 1024x1280) run ~10-20x
# off their roofline in-context (bad intermediate layouts, C on the lane
# dim). Keeping the tail in 2x2 space-to-depth form turns them into
# 4x-channel convs at half resolution — same FLOPs, healthy MXU shapes —
# with the kernels transformed once per call (tiny [3,3,C,O] einsums).
# All transforms are exact up to float reassociation.
# ---------------------------------------------------------------------------


def space_to_depth2(x: jnp.ndarray) -> jnp.ndarray:
    """[B,H,W,C] -> [B,H/2,W/2,4C], channel order (ry, rx, c)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space2(x: jnp.ndarray) -> jnp.ndarray:
    """[B,h,w,4C] (channel order (py, px, c)) -> [B,2h,2w,C]."""
    b, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h, w, 2, 2, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b, 2 * h, 2 * w, c)


def s2d_conv_kernel(k: jnp.ndarray) -> jnp.ndarray:
    """[3,3,C,O] -> [3,3,4C,4O]: conv3x3(x) == D2S(conv3x3'(S2D(x))).

    W'[Dy,Dx,(ry,rx,c),(py,px,o)] = k[dy,dx,c,o] with
    dy = 2(Dy-1)+ry-py+1 when in 0..2 (else 0), dx likewise."""
    import numpy as np

    c, o = k.shape[2], k.shape[3]
    D = np.arange(3)[:, None, None]      # Dy/Dx
    r = np.arange(2)[None, :, None]      # ry/rx
    p = np.arange(2)[None, None, :]      # py/px
    d = 2 * (D - 1) + r - p + 1          # [3,2,2]
    valid = (d >= 0) & (d <= 2)
    dsafe = np.clip(d, 0, 2)
    # gather k over (dy, dx) -> [3,2,2, 3,2,2, C, O]
    dy = dsafe[:, :, :, None, None, None]
    dx = dsafe[None, None, None, :, :, :]
    g = k[jnp.asarray(np.broadcast_to(dy, (3, 2, 2, 3, 2, 2))),
          jnp.asarray(np.broadcast_to(dx, (3, 2, 2, 3, 2, 2)))]
    m = valid[:, :, :, None, None, None] & valid[None, None, None]
    g = g * jnp.asarray(m[..., None, None], k.dtype)
    # -> [Dy, Dx, ry, rx, C, py, px, O] -> [3,3,4C,4O]
    g = jnp.transpose(g, (0, 3, 1, 4, 6, 2, 5, 7))
    return g.reshape(3, 3, 4 * c, 4 * o)


def up_phase_conv_kernel(k: jnp.ndarray) -> jnp.ndarray:
    """[3,3,C,O] -> [3,3,C,4O]: conv3x3(up2(x)) == D2S(conv3x3'(x)).

    Taps of the full-res conv that land on the same coarse pixel are
    pre-summed (same math as _phase_kernel, laid out as one 3x3 conv):
    W'[Dy,Dx,c,(py,px,o)] = sum over dy with (py+dy-1)//2 == Dy-1,
    dx with (px+dx-1)//2 == Dx-1 of k[dy,dx,c,o]."""
    c, o = k.shape[2], k.shape[3]
    rows = []
    for Dy in range(3):
        cols = []
        for Dx in range(3):
            phases = []
            for py in range(2):
                for px in range(2):
                    acc = jnp.zeros((c, o), k.dtype)
                    for dy in range(3):
                        if (py + dy - 1) // 2 != Dy - 1:
                            continue
                        for dx in range(3):
                            if (px + dx - 1) // 2 != Dx - 1:
                                continue
                            acc = acc + k[dy, dx]
                    phases.append(acc)
            cols.append(jnp.concatenate(phases, axis=-1))  # [c, 4o]
        rows.append(jnp.stack(cols, axis=0))
    return jnp.stack(rows, axis=0)  # [3,3,c,4o]


def s2d_stride2_conv_kernel(k: jnp.ndarray) -> jnp.ndarray:
    """[K,K,C,O] (odd K, stride-2 'same' conv) -> [(K+1)/2+1, ., 4C, O]:
    conv_s2(x) == conv_s1(S2D(x), k') with padding (K//2+1)//2 each... —
    computed for the ResNet stem case K=7: out[i,j] reads rows 2i+dy-3,
    dy in 0..6; in S2D coords row = i + delta with delta = (dy-3-ry)/2,
    ry = (dy+1)%2, giving a 4-tap kernel with padding (2,1)."""
    import numpy as np

    kk, _, c, o = k.shape
    assert kk == 7, "stem transform implemented for 7x7 stride-2"
    out = np.zeros((4, 4, 2, 2, 1, 1), np.float32)  # occupancy map only
    pieces = {}
    for dy in range(7):
        ry = (dy + 1) % 2
        dlt = (dy - 3 - ry) // 2 + 2  # 0..3
        pieces[(dlt, ry)] = dy
    rows = []
    for Dy in range(4):
        cols = []
        for Dx in range(4):
            chan = []
            for ry in range(2):
                for rx in range(2):
                    dy = pieces.get((Dy, ry))
                    dx = pieces.get((Dx, rx))
                    if dy is None or dx is None:
                        chan.append(jnp.zeros((c, o), k.dtype))
                    else:
                        chan.append(k[dy, dx])
            cols.append(jnp.concatenate(chan, axis=0))  # [4c, o]
        rows.append(jnp.stack(cols, axis=0))
    return jnp.stack(rows, axis=0)  # [4,4,4c,o]


# The 2-tap shifted-anchor phase-conv variants (zero-redundancy conv1,
# 1.78x conv2) were built, exactness-tested, and measured ~7% SLOWER than
# the aligned 3x3 phase form on v5e (odd spatial dims cost more in layout
# than the saved MACs) — removed; post-mortem in PERF.md "Examined and
# closed".
