"""Pallas TPU kernel for RoIAlign.

The XLA einsum formulation (ops/roi_align.py) materializes a [N, Sy, W, C]
row-interpolation intermediate in HBM (~550MB per image at P2 geometry) and is
memory-bound (~36ms/batch measured). This kernel keeps the feature map and all
per-RoI intermediates resident in VMEM: each grid program loads R RoIs,
builds their interpolation weight matrices on the VPU, and runs the two
MXU contractions back to back, writing only the [R, 7, 7, C] pooled output
to HBM. Semantics identical to ops/roi_align.roi_align (aligned=False,
sampling_ratio static, degenerate RoIs clamped to size 1).

Dispatch: ops/roi_align.py routes here on TPU unless the global matmul
precision is set to `highest` (bit-parity eval mode), where the einsum path
with f32 MXU passes is used instead.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sample_grid(output_size: int, sampling_ratio: int) -> np.ndarray:
    """Static per-bin sample offsets in units of bins: [S]."""
    s = np.repeat(np.arange(output_size, dtype=np.float32), sampling_ratio)
    f = (np.tile(np.arange(sampling_ratio, dtype=np.float32), output_size) + 0.5)
    return s + f / sampling_ratio


def _weights(coords: jnp.ndarray, extent: int) -> jnp.ndarray:
    """[R, S] coords -> [R*S, extent] triangle weights w/ border semantics."""
    r, s = coords.shape
    # float mask (mosaic: minor-dim broadcast only supports 32-bit types)
    inside = ((coords >= -1.0) & (coords <= float(extent))).astype(jnp.float32)
    c = jnp.clip(coords, 0.0, float(extent) - 1.0)
    idx = jax.lax.broadcasted_iota(jnp.int32, (r, s, extent), 2).astype(jnp.float32)
    w = jnp.clip(1.0 - jnp.abs(c[..., None] - idx), 0.0, 1.0)
    w = w * inside[..., None]
    return w.reshape(r * s, extent)


def _kernel(
    rois_ref,  # [R, 4] VMEM
    feat_ref,  # [H, W, C] VMEM (same block every program)
    out_ref,  # [R, OH, OW, C] VMEM
    *,
    spatial_scale: float,
    output_size: Tuple[int, int],
    sampling_ratio: int,
    h: int,
    w: int,
    c: int,
    r_per_prog: int,
):
    oh, ow = output_size
    sr = sampling_ratio
    sy, sx = oh * sr, ow * sr

    def sample_grid(n_samples):
        # grid[s] = bin(s) + (sub(s)+0.5)/sr, built in-kernel (no captured
        # constants allowed in pallas kernels)
        s_idx = jax.lax.broadcasted_iota(jnp.int32, (1, n_samples), 1)[0].astype(
            jnp.float32
        )
        bins = jnp.floor(s_idx / sr)
        sub = s_idx - bins * sr
        return bins + (sub + 0.5) / sr

    grid_y = sample_grid(sy)  # [Sy]
    grid_x = sample_grid(sx)  # [Sx]

    rois = rois_ref[...]
    x1 = rois[:, 0] * spatial_scale
    y1 = rois[:, 1] * spatial_scale
    x2 = rois[:, 2] * spatial_scale
    y2 = rois[:, 3] * spatial_scale
    roi_w = jnp.maximum(x2 - x1, 1.0)
    roi_h = jnp.maximum(y2 - y1, 1.0)

    ys = y1[:, None] + grid_y[None, :] * (roi_h / oh)[:, None]  # [R, Sy]
    xs = x1[:, None] + grid_x[None, :] * (roi_w / ow)[:, None]  # [R, Sx]
    # Fold the sr x sr bin average into the weights (separable; exact).
    wy = _weights(ys, h).reshape(r_per_prog, oh, sr, h).mean(axis=2)  # [R,OH,H]
    wx = _weights(xs, w).reshape(r_per_prog, ow, sr, w).mean(axis=2)  # [R,OW,W]
    wy = wy.astype(jnp.bfloat16)
    wx = wx.astype(jnp.bfloat16)

    feat = feat_ref[...].reshape(h, w * c)  # bf16 [H, W*C]

    # MXU-filling matmuls for the RoIs' row interpolation (M = R/2*OH), f32
    # accumulation cast to bf16 per half so the f32 temporary and the bf16
    # result stay within the scoped VMEM limit; then small per-RoI column
    # contractions. Temporaries die between iterations (stack reuse).
    halves = []
    half = r_per_prog // 2
    wy_flat = wy.reshape(r_per_prog * oh, h)
    for q in range(2):
        part = jnp.dot(
            wy_flat[q * half * oh : (q + 1) * half * oh],
            feat,
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
        halves.append(part)
    rows_all = jnp.concatenate(halves, axis=0).reshape(r_per_prog, oh, w, c)

    for r in range(r_per_prog):
        m = rows_all[r].transpose(1, 0, 2).reshape(w, oh * c)
        s = jnp.dot(wx[r], m, preferred_element_type=jnp.float32)  # [OW, OH*C]
        out_ref[r] = s.reshape(ow, oh, c).transpose(1, 0, 2)  # [OH, OW, C]


def roi_align_pallas(
    features: jnp.ndarray,  # [H, W, C]
    rois: jnp.ndarray,  # [N, 4]
    spatial_scale: float,
    output_size: Tuple[int, int] = (7, 7),
    sampling_ratio: int = 2,
    interpret: bool = False,
) -> jnp.ndarray:
    h, w, c = features.shape
    n = rois.shape[0]
    oh, ow = output_size

    r_per_prog = 8
    pad = (-n) % r_per_prog
    if pad:
        rois = jnp.pad(rois, ((0, pad), (0, 0)))
    n_padded = n + pad
    grid = (n_padded // r_per_prog,)

    out = pl.pallas_call(
        functools.partial(
            _kernel,
            spatial_scale=float(spatial_scale),
            output_size=output_size,
            sampling_ratio=sampling_ratio,
            h=h, w=w, c=c, r_per_prog=r_per_prog,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (r_per_prog, 4), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((h, w, c), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (r_per_prog, oh, ow, c), lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n_padded, oh, ow, c), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_padded * (oh * sampling_ratio) * h * w * c,
            bytes_accessed=h * w * c * 4 + n_padded * oh * ow * c * 4,
            transcendentals=0,
        ),
    )(rois.astype(jnp.float32), features.astype(jnp.bfloat16))
    return out[:n]
