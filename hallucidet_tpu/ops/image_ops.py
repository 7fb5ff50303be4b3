"""On-device image ops: exact half-pixel bilinear resize (as matmuls on the
MXU), deterministic nearest upsampling, and channel normalization.

Replaces the reference's host/cuDNN image path: `F.interpolate` inside the
detection transform (reference: src/models/custom_generalized_transform.py:49-87)
and the deterministic decoder upsample (reference:
src/segmentation_models/decoders/unet/decoder.py:7-8). Resize is implemented as
two separable 1-D interpolation matrices contracted with the image — a pair of
matmuls that XLA tiles straight onto the MXU, instead of a gather — and is
bit-compatible with `align_corners=False, antialias=False` bilinear used by the
ported weights.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


@functools.lru_cache(maxsize=None)
def _interp_matrix(in_size: int, out_size: int) -> np.ndarray:
    """[out_size, in_size] half-pixel bilinear interpolation weights."""
    out = np.zeros((out_size, in_size), dtype=np.float32)
    scale = in_size / out_size
    for i in range(out_size):
        src = (i + 0.5) * scale - 0.5
        x0 = int(np.floor(src))
        frac = src - x0
        lo = min(max(x0, 0), in_size - 1)
        hi = min(max(x0 + 1, 0), in_size - 1)
        out[i, lo] += 1.0 - frac
        out[i, hi] += frac
    return out


def resize_bilinear(
    images: jnp.ndarray, out_hw: Tuple[int, int], dtype=None
) -> jnp.ndarray:
    """Bilinear resize, NHWC [B,H,W,C] -> [B,h,w,C] (half-pixel centers, no
    antialias). Static shapes; interpolation matrices are trace-time constants."""
    b, h, w, c = images.shape
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return images
    compute_dtype = dtype or images.dtype
    mh = jnp.asarray(_interp_matrix(h, oh), dtype=compute_dtype)  # [oh, h]
    mw = jnp.asarray(_interp_matrix(w, ow), dtype=compute_dtype)  # [ow, w]
    x = images.astype(compute_dtype)
    # HIGHEST keeps fp32 on the MXU — resize feeds box-exact postprocessing.
    prec = jax.lax.Precision.HIGHEST
    # Contract H: [B,H,W,C] x [oh,H] -> [B,oh,W,C]
    x = jnp.einsum("bhwc,oh->bowc", x, mh, precision=prec)
    # Contract W: [B,oh,W,C] x [ow,W] -> [B,oh,ow,C]
    x = jnp.einsum("bhwc,ow->bhoc", x, mw, precision=prec)
    return x


@functools.lru_cache(maxsize=None)
def _interp_matrix_align_corners(in_size: int, out_size: int) -> np.ndarray:
    """[out, in] bilinear weights with align_corners=True mapping."""
    out = np.zeros((out_size, in_size), dtype=np.float32)
    if out_size == 1 or in_size == 1:
        out[:, 0] = 1.0
        return out
    scale = (in_size - 1) / (out_size - 1)
    for i in range(out_size):
        src = i * scale
        x0 = int(np.floor(src))
        frac = src - x0
        lo = min(x0, in_size - 1)
        hi = min(x0 + 1, in_size - 1)
        out[i, lo] += 1.0 - frac
        out[i, hi] += frac
    return out


def resize_bilinear_align_corners(
    images: jnp.ndarray, out_hw: Tuple[int, int]
) -> jnp.ndarray:
    """Bilinear resize with align_corners=True (torch F.interpolate semantics
    used by the smp FPN/PSP/PAN decoders), NHWC, MXU matmuls."""
    b, h, w, c = images.shape
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return images
    mh = jnp.asarray(_interp_matrix_align_corners(h, oh), images.dtype)
    mw = jnp.asarray(_interp_matrix_align_corners(w, ow), images.dtype)
    prec = jax.lax.Precision.HIGHEST
    x = jnp.einsum("bhwc,oh->bowc", images, mh, precision=prec)
    return jnp.einsum("bhwc,ow->bhoc", x, mw, precision=prec)


def adaptive_avg_pool2d(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """torch AdaptiveAvgPool2d semantics (variable floor/ceil windows),
    NHWC, expressed as two averaging matrices (MXU-friendly)."""

    @functools.lru_cache(maxsize=None)
    def pool_matrix(in_size: int, out_size: int) -> np.ndarray:
        m = np.zeros((out_size, in_size), np.float32)
        for i in range(out_size):
            start = (i * in_size) // out_size
            end = -(-((i + 1) * in_size) // out_size)  # ceil
            m[i, start:end] = 1.0 / (end - start)
        return m

    b, h, w, c = x.shape
    oh, ow = out_hw
    mh = jnp.asarray(pool_matrix(h, oh), x.dtype)
    mw = jnp.asarray(pool_matrix(w, ow), x.dtype)
    y = jnp.einsum("bhwc,oh->bowc", x, mh)
    return jnp.einsum("bhwc,ow->bhoc", y, mw)


def upsample_nearest(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """Deterministic nearest-neighbor 2x/kx upsample, NHWC.

    Exact semantics of the reference's `upsample_deterministic`
    (reference: src/segmentation_models/decoders/unet/decoder.py:7-8): each
    pixel is repeated scale x scale. Implemented as broadcast+reshape so XLA
    lowers it to a copy-free layout change where possible."""
    b, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (b, h, scale, w, scale, c))
    return x.reshape(b, h * scale, w * scale, c)


def normalize(
    images: jnp.ndarray,
    mean: Sequence[float],
    std: Sequence[float],
) -> jnp.ndarray:
    """(img - mean) / std per channel, NHWC. A no-op when mean=0/std=1 (the
    reference pins the detector transform there — skip the pass entirely)."""
    if all(m == 0.0 for m in mean) and all(s == 1.0 for s in std):
        return images
    mean_arr = jnp.asarray(mean, dtype=images.dtype)
    std_arr = jnp.asarray(std, dtype=images.dtype)
    return (images - mean_arr) / std_arr


def imagenet_normalize(images: jnp.ndarray) -> jnp.ndarray:
    """ImageNet mean/std normalization for pretrained encoders (reference:
    src/models/encoder_decoder.py:47-53)."""
    return normalize(images, IMAGENET_MEAN, IMAGENET_STD)


def expand_one_channel_to_three(images: jnp.ndarray) -> jnp.ndarray:
    """IR 1-channel -> 3-channel repeat (reference: src/utils/utils.py:51-53).
    NHWC input [B,H,W,1] -> [B,H,W,3]."""
    return jnp.repeat(images, 3, axis=-1)


def minmax_normalize_image(images: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Per-image per-channel min-max rescale to [0,1] (reference:
    src/utils/utils.py:237-254)."""
    lo = jnp.min(images, axis=(1, 2), keepdims=True)
    hi = jnp.max(images, axis=(1, 2), keepdims=True)
    return (images - lo) / jnp.maximum(hi - lo, eps)


def resize_bilinear_from_phase(
    x_ph: jnp.ndarray,
    out_hw: Tuple[int, int],
    factors: Tuple[int, int] = (2, 2),
    dtype=None,
) -> jnp.ndarray:
    """resize_bilinear(depth_to_space(x_ph, fh, fw), out_hw) without
    materializing the full-resolution image: the interpolation matrices split
    by source phase (Mh[:, py::fh]) and contract the phase form directly.
    Exact (same sums; used by the fused IR->RGB->detect pipeline to consume
    the U-Net's space-to-depth tail output)."""
    fh, fw = factors
    b, hp, wp, cf = x_ph.shape
    c = cf // (fh * fw)
    h, w = fh * hp, fw * wp
    oh, ow = out_hw
    # at least f32: a bf16 phase tensor is consumed directly (the per-element
    # upconvert fuses into the einsum) but the interp weights and the
    # accumulation stay f32 — exact vs converting the input up front
    compute_dtype = dtype or jnp.promote_types(x_ph.dtype, jnp.float32)
    mh = jnp.asarray(_interp_matrix(h, oh), dtype=compute_dtype)  # [oh, h]
    mw = jnp.asarray(_interp_matrix(w, ow), dtype=compute_dtype)  # [ow, w]
    mh_ph = mh.reshape(oh, hp, fh)  # [oh, hp, py]
    mw_ph = mw.reshape(ow, wp, fw)  # [ow, wp, px]
    x6 = x_ph.reshape(b, hp, wp, fh, fw, c)
    # pad the minor channel dim to 8: with c=3 (RGB) both einsums — and
    # especially their autodiff transposes in the train step — lower to
    # layout-bound forms (isolated probe: 94.7 -> 9.3 ms/iter fwd+bwd at the
    # b8 train geometry). Zero channels contribute zero to every sum and are
    # sliced off the SMALL fixed-size output, so this is exact.
    c_pad = (-c) % 8 if c < 8 else 0
    if c_pad:
        x6 = jnp.pad(x6, ((0, 0),) * 5 + ((0, c_pad),))
    x6 = x6.astype(compute_dtype)
    prec = jax.lax.Precision.HIGHEST
    y = jnp.einsum("bhwpqc,ohp->bowqc", x6, mh_ph, precision=prec)
    y = jnp.einsum("bowqc,vwq->bovc", y, mw_ph, precision=prec)
    return y[..., :c] if c_pad else y


def resize_bilinear_from_phase2(
    x_ph: jnp.ndarray, out_hw: Tuple[int, int], dtype=None
) -> jnp.ndarray:
    """Legacy 2x2-phase wrapper of resize_bilinear_from_phase."""
    return resize_bilinear_from_phase(x_ph, out_hw, (2, 2), dtype)
