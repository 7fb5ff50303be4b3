"""Classic IR preprocessing baseline — 'CNN-based thermal infrared person
detection by domain adaptation' (SPIE 10643).

Rebuild of the reference comparison model's preprocessing ops (reference:
src/models/cnnBasedThermalInfraredDA.py:58-222): invert, gaussian blur,
min-max / quantile histogram stretching (beta=0.003), histogram equalization,
their compositions, and the per-channel parallel combination. All ops are
pure jnp on NHWC [B, H, W, C] tensors in [0, 1], so any pipeline fuses into
the detector's XLA program (the reference runs them per-image on host tensors).

Use with detection.Detector for the non-learned baseline:
    imgs = invert_equalization(ir3)
    losses, dets = detector.calculate_loss(vars, imgs, targets)
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def invert(x: jnp.ndarray, channels: Optional[Sequence[int]] = None) -> jnp.ndarray:
    if channels is None:
        return 1.0 - x
    out = x
    for c in channels:
        out = out.at[..., c].set(1.0 - out[..., c])
    return out


def gaussian_blur(
    x: jnp.ndarray,
    kernel_size: Tuple[int, int] = (3, 3),
    sigma: Optional[float] = None,
) -> jnp.ndarray:
    """Separable gaussian blur (torchvision semantics: sigma defaults to
    0.3*((k-1)*0.5 - 1) + 0.8)."""
    kh, kw = kernel_size

    def kernel_1d(k):
        s = sigma if sigma is not None else 0.3 * ((k - 1) * 0.5 - 1) + 0.8
        half = (k - 1) * 0.5
        grid = jnp.arange(k, dtype=x.dtype) - half
        g = jnp.exp(-(grid**2) / (2 * s * s))
        return g / jnp.sum(g)

    c = x.shape[-1]
    gh = kernel_1d(kh).reshape(kh, 1, 1, 1)
    gw = kernel_1d(kw).reshape(1, kw, 1, 1)
    dn = jax.lax.conv_dimension_numbers(
        x.shape, (kh, 1, 1, 1), ("NHWC", "HWIO", "NHWC")
    )
    pad_h = ((kh // 2, kh // 2), (0, 0))
    pad_w = ((0, 0), (kw // 2, kw // 2))
    out = jax.lax.conv_general_dilated(
        x, jnp.tile(gh, (1, 1, 1, c)), (1, 1), pad_h, dimension_numbers=dn,
        feature_group_count=c,
    )
    out = jax.lax.conv_general_dilated(
        out, jnp.tile(gw, (1, 1, 1, c)), (1, 1), pad_w, dimension_numbers=dn,
        feature_group_count=c,
    )
    return out


def histogram_stretching_default(x: jnp.ndarray) -> jnp.ndarray:
    """Per-channel min-max stretch."""
    lo = jnp.min(x, axis=(1, 2), keepdims=True)
    hi = jnp.max(x, axis=(1, 2), keepdims=True)
    return (x - lo) / jnp.maximum(hi - lo, 1e-12)


def histogram_stretching(x: jnp.ndarray, beta: float = 0.003) -> jnp.ndarray:
    """Quantile stretch (beta=0.003 from the SPIE paper), per channel, then
    clamp to the quantile band (reference: cnnBasedThermalInfraredDA.py:96-110)."""
    q_min = jnp.quantile(x, beta, axis=(1, 2), keepdims=True)
    q_max = jnp.quantile(x, 1.0 - beta, axis=(1, 2), keepdims=True)
    out = (x - q_min) / jnp.maximum(q_max - q_min, 1e-12)
    return jnp.clip(out, q_min, q_max)


def histogram_equalization(x: jnp.ndarray) -> jnp.ndarray:
    """256-bin histogram equalization per image/channel (PIL/torchvision
    equalize algorithm), expressed with one-hot bincounts so it stays jittable."""
    u8 = jnp.clip((x * 255.0), 0, 255).astype(jnp.int32)  # [B,H,W,C]

    def eq_one(ch):  # [H, W] int32
        hist = jnp.zeros((256,), jnp.int32).at[ch.reshape(-1)].add(1)
        nonzero = hist > 0
        # last nonzero bin's count
        last_idx = 255 - jnp.argmax(nonzero[::-1])
        last_count = hist[last_idx]
        step = (jnp.sum(hist) - last_count) // 255
        cum = jnp.cumsum(hist) - hist
        lut = jnp.clip((cum + step // 2) // jnp.maximum(step, 1), 0, 255)
        out = jnp.where(step == 0, ch, lut[ch])
        return out

    eq = jax.vmap(jax.vmap(eq_one, in_axes=-1, out_axes=-1))(u8)
    return eq.astype(x.dtype) / 255.0


def invert_stretching(x: jnp.ndarray) -> jnp.ndarray:
    return histogram_stretching(invert(x))


def invert_stretching_blur(x: jnp.ndarray) -> jnp.ndarray:
    return gaussian_blur(invert_stretching(x))


def invert_equalization(x: jnp.ndarray) -> jnp.ndarray:
    return histogram_equalization(invert(x))


def invert_equalization_blur(x: jnp.ndarray) -> jnp.ndarray:
    return gaussian_blur(invert_equalization(x))


def parallel_combination(
    x: jnp.ndarray, channel_op: Sequence[str] = ("equalization", "invert", "none")
) -> jnp.ndarray:
    """Different classic op per channel (reference:
    cnnBasedThermalInfraredDA.py:203-222)."""
    outs = []
    for idx, op in enumerate(channel_op):
        ch = x[..., idx : idx + 1]
        if op == "invert":
            ch = invert(ch)
        elif op == "equalization":
            ch = histogram_equalization(ch)
        outs.append(ch)
    return jnp.concatenate(outs, axis=-1)


PIPELINES = {
    "none": lambda x: x,
    "invert": invert,
    "blur": gaussian_blur,
    "stretching": histogram_stretching,
    "stretching_default": histogram_stretching_default,
    "equalization": histogram_equalization,
    "invert_stretching": invert_stretching,
    "invert_stretching_blur": invert_stretching_blur,
    "invert_equalization": invert_equalization,
    "invert_equalization_blur": invert_equalization_blur,
    "parallel": parallel_combination,
}
