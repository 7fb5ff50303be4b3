"""RoIAlign and multi-scale (FPN) RoIAlign, MXU-native.

TPU replacement for torchvision's C++/CUDA `roi_align` consumed by the
reference's RoI heads (reference: src/utils/eval_forward_fasterrcnn.py:122
`model.roi_heads.box_roi_pool`, a MultiScaleRoIAlign).

Design: RoIAlign's bilinear sampling grid is separable per RoI — the sample
points are an outer product of row coords and column coords. We therefore build
per-RoI 1-D interpolation weight matrices W_y [S, H] and W_x [S, W] with pure
broadcasting (triangle kernel + border clamp, no scatter) and contract them
with the feature map as two batched matmuls. XLA tiles these straight onto the
MXU; there are no gathers in the hot path. Exactness matches `aligned=False`,
`sampling_ratio=2` RoIAlign (the config of the ported detection weights).

All functions are per-image; vmap over the batch.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _sample_coords(
    start: jnp.ndarray,  # [N]
    size: jnp.ndarray,  # [N] (roi extent in feature coords)
    output_size: int,
    sampling_ratio: int,
) -> jnp.ndarray:
    """Per-RoI 1-D sample coordinates [N, output_size * sampling_ratio].

    bin = size / output_size; within bin b, sample s sits at
    start + (b + (s + 0.5)/sampling_ratio) * bin.
    """
    s = output_size * sampling_ratio
    grid = (
        np.repeat(np.arange(output_size, dtype=np.float32), sampling_ratio)
        + (np.tile(np.arange(sampling_ratio, dtype=np.float32), output_size) + 0.5)
        / sampling_ratio
    )  # [S]
    bin_size = size / output_size  # [N]
    return start[:, None] + jnp.asarray(grid)[None, :] * bin_size[:, None]


def _interp_weights(coords: jnp.ndarray, extent: int) -> jnp.ndarray:
    """Triangle-kernel interpolation weights [N, S, extent] with RoIAlign
    border semantics: points outside [-1, extent] contribute zero; points in
    the border band clamp onto the edge pixel."""
    inside = (coords >= -1.0) & (coords <= extent)
    c = jnp.clip(coords, 0.0, extent - 1.0)
    idx = jnp.arange(extent, dtype=coords.dtype)
    w = jnp.clip(1.0 - jnp.abs(c[..., None] - idx), 0.0, 1.0)
    return jnp.where(inside[..., None], w, 0.0)


def roi_align(
    features: jnp.ndarray,  # [H, W, C]
    rois: jnp.ndarray,  # [N, 4] xyxy in input-image coords
    spatial_scale: float,
    output_size: Tuple[int, int] = (7, 7),
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    """RoIAlign -> [N, oh, ow, C].

    Implementation: separable pooling-folded interpolation as two MXU
    einsums (exact). A Pallas kernel existed through round 2 but measured
    3x slower than this path at full Faster R-CNN geometry (per-program
    feature re-residency + Mosaic's low matmul throughput at [M,K<=512,
    N=128] shapes — see PERF.md round-2 notes) and was removed; the git
    history (hallucidet_tpu/ops/roi_align_pallas.py) keeps the kernel."""
    h, w, c = features.shape
    n = rois.shape[0]
    oh, ow = output_size

    x1 = rois[:, 0] * spatial_scale
    y1 = rois[:, 1] * spatial_scale
    x2 = rois[:, 2] * spatial_scale
    y2 = rois[:, 3] * spatial_scale
    # aligned=False keeps the raw scaled coords; degenerate rois clamp to size 1
    roi_w = jnp.maximum(x2 - x1, 1.0)
    roi_h = jnp.maximum(y2 - y1, 1.0)

    ys = _sample_coords(y1, roi_h, oh, sampling_ratio)  # [N, Sy]
    xs = _sample_coords(x1, roi_w, ow, sampling_ratio)  # [N, Sx]
    # The sr x sr bin average is separable across y/x, so it folds into the
    # interpolation weights: wy_bin = mean of each bin's sr sample rows.
    # Exactly equal to sampling then pooling, at half the intermediate size.
    sr = sampling_ratio
    wy = _interp_weights(ys, h).reshape(n, oh, sr, h).mean(axis=2)  # [N,OH,H]
    wx = _interp_weights(xs, w).reshape(n, ow, sr, w).mean(axis=2)  # [N,OW,W]

    # Two MXU contractions: rows then columns. Precision inherits the global
    # jax_default_matmul_precision: bf16-fast by default on TPU, set
    # `highest` for bit-parity eval runs (tests do). In fast mode the row
    # intermediate is stored bf16 to halve HBM traffic (this op is
    # bandwidth-bound).
    rows = jnp.einsum("nyh,hwc->nywc", wy, features)  # [N,OH,W,C]
    if _fast_mode():
        rows = rows.astype(jnp.bfloat16)
    out = jnp.einsum("nxw,nywc->nyxc", wx.astype(rows.dtype), rows)
    return out.astype(features.dtype)


def _fast_mode() -> bool:
    prec = jax.config.jax_default_matmul_precision
    return prec not in ("highest", "float32")


def fpn_level_assignment(
    rois: jnp.ndarray,  # [N, 4]
    k_min: int,
    k_max: int,
    canonical_scale: float = 224.0,
    canonical_level: int = 4,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """FPN heuristic: level k = floor(k0 + log2(sqrt(area)/s0)). Returns the
    index into the pooled feature list (0-based from k_min), int32 [N]."""
    area = jnp.clip(rois[:, 2] - rois[:, 0], 0.0) * jnp.clip(
        rois[:, 3] - rois[:, 1], 0.0
    )
    scale = jnp.sqrt(area)
    lvl = jnp.floor(
        canonical_level + jnp.log2(scale / canonical_scale + eps)
    )
    lvl = jnp.clip(lvl, k_min, k_max)
    return (lvl - k_min).astype(jnp.int32)


def multiscale_roi_align_per_level(
    features: Sequence[jnp.ndarray],  # per level [Hi, Wi, C]
    rois: jnp.ndarray,  # [N, 4]
    strides: Sequence[int],  # per level, e.g. (4, 8, 16, 32)
    output_size: Tuple[int, int] = (7, 7),
    sampling_ratio: int = 2,
    canonical_scale: float = 224.0,
    canonical_level: int = 4,
) -> jnp.ndarray:
    """MultiScaleRoIAlign over FPN levels -> [N, oh, ow, C] (per-level form).

    Pools every RoI on every level and selects by the level-assignment mask
    (the masks are disjoint, so the select is a masked SUM that XLA fuses
    into each level's column-einsum epilogue). Kept as the straightforward
    cross-check oracle for the fused single-einsum form below, which is the
    production path."""
    n = rois.shape[0]
    k_min = int(round(np.log2(strides[0])))
    k_max = int(round(np.log2(strides[-1])))
    levels = fpn_level_assignment(
        rois, k_min, k_max, canonical_scale, canonical_level
    )  # [N]
    out = None
    for i, (feat, stride) in enumerate(zip(features, strides)):
        pooled = roi_align(
            feat, rois, 1.0 / float(stride), output_size, sampling_ratio
        )
        sel = (levels == i)[:, None, None, None].astype(pooled.dtype)
        term = pooled * sel
        out = term if out is None else out + term
    return out


def _interp_weights_banded(
    coords: jnp.ndarray,  # [N, S] level-local sample coords
    extent: jnp.ndarray,  # [N] the RoI's level extent along this axis
    offset: jnp.ndarray,  # [N] the level's start index in the packed axis
    total: int,  # packed axis length
) -> jnp.ndarray:
    """Triangle-kernel weights [N, S, total] into a level-packed axis.

    RoIAlign border semantics are applied in LEVEL-LOCAL coordinates
    (outside [-1, extent] -> zero; border band clamps onto the level's edge
    pixel) and only then shifted by the level offset. Because the clamped
    coordinate lies in [0, extent-1], the unit-support triangle kernel can
    never place weight outside the RoI's own level band — adjacent levels
    in the packed map never bleed."""
    inside = (coords >= -1.0) & (coords <= extent[:, None])
    c = jnp.clip(coords, 0.0, extent[:, None] - 1.0) + offset[:, None]
    idx = jnp.arange(total, dtype=coords.dtype)
    w = jnp.clip(1.0 - jnp.abs(c[..., None] - idx), 0.0, 1.0)
    return jnp.where(inside[..., None], w, 0.0)


def multiscale_roi_align(
    features: Sequence[jnp.ndarray],  # per level [Hi, Wi, C]
    rois: jnp.ndarray,  # [N, 4]
    strides: Sequence[int],  # per level, e.g. (4, 8, 16, 32)
    output_size: Tuple[int, int] = (7, 7),
    sampling_ratio: int = 2,
    canonical_scale: float = 224.0,
    canonical_level: int = 4,
) -> jnp.ndarray:
    """MultiScaleRoIAlign over FPN levels -> [N, oh, ow, C], fused form.

    TPU-first replacement for torchvision's MultiScaleRoIAlign (reference:
    src/utils/eval_forward_fasterrcnn.py:122): the FPN levels are packed
    into ONE feature map (concatenated along H, right-padded to the widest
    level), each RoI's interpolation weights are built in its own level's
    coordinate frame and shifted into the packed frame, and the whole
    multi-level pool runs as a single pair of MXU einsums. Compared to the
    per-level form this removes the 4x pool-everything-everywhere work, the
    masked-sum select, and the inter-level layout copies (~1.5 ms/step of
    the round-3 trace). Exact: weights outside a RoI's level band are
    identically zero (see _interp_weights_banded)."""
    n = rois.shape[0]
    oh, ow = output_size
    sr = sampling_ratio
    heights = [int(f.shape[0]) for f in features]
    widths = [int(f.shape[1]) for f in features]
    w_max = max(widths)
    offs = np.concatenate([[0], np.cumsum(heights)])  # [L+1]
    h_cat = int(offs[-1])
    f_cat = jnp.concatenate(
        [
            jnp.pad(f, ((0, 0), (0, w_max - int(f.shape[1])), (0, 0)))
            for f in features
        ],
        axis=0,
    )  # [h_cat, w_max, C]

    k_min = int(round(np.log2(strides[0])))
    k_max = int(round(np.log2(strides[-1])))
    levels = fpn_level_assignment(
        rois, k_min, k_max, canonical_scale, canonical_level
    )  # [N]
    scale = jnp.asarray([1.0 / s for s in strides], jnp.float32)[levels]
    ext_h = jnp.asarray(heights, jnp.float32)[levels]
    ext_w = jnp.asarray(widths, jnp.float32)[levels]
    off_h = jnp.asarray(offs[:-1], jnp.float32)[levels]

    x1 = rois[:, 0] * scale
    y1 = rois[:, 1] * scale
    x2 = rois[:, 2] * scale
    y2 = rois[:, 3] * scale
    roi_w = jnp.maximum(x2 - x1, 1.0)
    roi_h = jnp.maximum(y2 - y1, 1.0)
    ys = _sample_coords(y1, roi_h, oh, sr)  # [N, Sy] level-local
    xs = _sample_coords(x1, roi_w, ow, sr)

    zero = jnp.zeros_like(off_h)
    wy = _interp_weights_banded(ys, ext_h, off_h, h_cat)
    wx = _interp_weights_banded(xs, ext_w, zero, w_max)
    # fold the sr x sr bin average into the weights (see roi_align)
    wy = wy.reshape(n, oh, sr, h_cat).mean(axis=2)  # [N, OH, h_cat]
    wx = wx.reshape(n, ow, sr, w_max).mean(axis=2)  # [N, OW, w_max]

    rows = jnp.einsum("nyh,hwc->nywc", wy, f_cat)  # [N, OH, w_max, C]
    if _fast_mode():
        rows = rows.astype(jnp.bfloat16)
    # Both einsum passes are HBM-bandwidth-bound on the [N, OH, w_max, C]
    # intermediate (8.8 GB bf16 at batch 64 / 512 RoIs): pass 1 writes it at
    # ~15.1 ms/step and this pass reads it at ~13.7 ms/step vs a ~10.7 ms
    # one-way traffic floor on v5e. Restating the column pass as an explicit
    # dot_general (batch n only, y in the rhs-free dims) lowers to the SAME
    # broadcast-multiply-reduce fusion at the same cost (round-4 negative
    # probe, PERF.md) — the MXU never sees it either way because the per-RoI
    # matmuls are tiny; the binding constraint is the intermediate's traffic,
    # which is set by w_max (= the 75-wide stride-4 FPN level).
    out = jnp.einsum("nxw,nywc->nyxc", wx.astype(rows.dtype), rows)
    return out.astype(features[0].dtype)
