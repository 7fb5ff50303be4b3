"""Host-side image conversion and augmentation (numpy, seeded).

Rebuild of the reference's ToTensor semantics (reference:
src/dataloader/dataloader.py:13-73 — RGB HWC float/255, IR single channel,
uint8 range check) and the detector-training augmentation stack (reference:
train_detector.py:401-410: ColorJitter(0.01) + RandomInvert(0.1) +
RandomAdjustSharpness(1.2, 0.1) + RandomEqualize(0.1)), NHWC layout.
The HalluciDet multimodal transform is identity + /255 (reference:
train_hallucidet.py:513-524), reproduced by default in the loader.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def check_range(image: np.ndarray) -> np.ndarray:
    """uint8 / 0-255 float -> [0,1] float; asserts sane range (reference:
    dataloader.py:62-73)."""
    if image.dtype == np.uint8 or (
        image.min() >= 0 and image.max() > 1 and image.max() <= 255
    ):
        image = image.astype("float32") / 255.0
    image = image.astype("float32")
    assert image.min() >= 0 and image.max() <= 1, (
        "Please, verify your images are either uint8 (0-255) or float (0.0-1.0)"
    )
    return image


def to_tensor_rgb(image: np.ndarray) -> np.ndarray:
    """HWC uint8 -> HWC float32 [0,1] (NHWC build: no CHW transpose)."""
    return check_range(image)


def to_tensor_ir(image: np.ndarray) -> np.ndarray:
    """HW -> HW1 float32 [0,1]."""
    img = check_range(image)
    if img.ndim == 2:
        img = img[..., None]
    return img


# ---- augmentation ops (uint8 HWC in, uint8 HWC out) ----


def _blend(a: np.ndarray, b: np.ndarray, factor: float) -> np.ndarray:
    out = a.astype(np.float32) * factor + b.astype(np.float32) * (1.0 - factor)
    return np.clip(out, 0, 255).astype(np.uint8)


def adjust_brightness(img: np.ndarray, factor: float) -> np.ndarray:
    return _blend(img, np.zeros_like(img), factor)


def adjust_contrast(img: np.ndarray, factor: float) -> np.ndarray:
    gray = img.astype(np.float32).mean(axis=-1, keepdims=True) if img.ndim == 3 else img
    mean = np.full_like(img, gray.mean(), dtype=np.uint8)
    return _blend(img, mean, factor)


def adjust_saturation(img: np.ndarray, factor: float) -> np.ndarray:
    if img.ndim == 2 or img.shape[-1] == 1:
        return img
    weights = np.array([0.299, 0.587, 0.114], np.float32)
    gray = (img.astype(np.float32) @ weights)[..., None]
    gray3 = np.repeat(gray, 3, axis=-1).astype(np.uint8)
    return _blend(img, gray3, factor)


def adjust_hue(img: np.ndarray, delta: float) -> np.ndarray:
    """delta in [-0.5, 0.5] as a fraction of the hue circle."""
    if img.ndim == 2 or img.shape[-1] == 1 or delta == 0.0:
        return img
    x = img.astype(np.float32) / 255.0
    mx = x.max(-1)
    mn = x.min(-1)
    c = mx - mn
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    h = np.zeros_like(mx)
    nz = c > 1e-8
    rmax = nz & (mx == r)
    gmax = nz & (mx == g) & ~rmax
    bmax = nz & ~rmax & ~gmax
    cc = np.where(nz, c, 1.0)
    h[rmax] = (((g - b) / cc) % 6)[rmax]
    h[gmax] = ((b - r) / cc + 2)[gmax]
    h[bmax] = ((r - g) / cc + 4)[bmax]
    h = (h / 6.0 + delta) % 1.0
    # hsv -> rgb
    i = np.floor(h * 6.0)
    f = h * 6.0 - i
    v = mx
    s = np.where(mx > 1e-8, c / np.maximum(mx, 1e-8), 0.0)
    p = v * (1 - s)
    q = v * (1 - f * s)
    t = v * (1 - (1 - f) * s)
    i = i.astype(int) % 6
    out = np.stack(
        [
            np.choose(i, [v, q, p, p, t, v]),
            np.choose(i, [t, v, v, q, p, p]),
            np.choose(i, [p, p, t, v, v, q]),
        ],
        axis=-1,
    )
    return np.clip(out * 255.0, 0, 255).astype(np.uint8)


def invert(img: np.ndarray) -> np.ndarray:
    return (255 - img.astype(np.int16)).astype(np.uint8)


def adjust_sharpness(img: np.ndarray, factor: float) -> np.ndarray:
    """torchvision sharpness kernel: 3x3 [[1,1,1],[1,5,1],[1,1,1]]/13, borders
    kept from the original."""
    x = img.astype(np.float32)
    if x.ndim == 2:
        x = x[..., None]
    pad = np.pad(x, ((1, 1), (1, 1), (0, 0)), mode="edge")
    k = np.array([[1, 1, 1], [1, 5, 1], [1, 1, 1]], np.float32) / 13.0
    blurred = np.zeros_like(x)
    for dy in range(3):
        for dx in range(3):
            blurred += k[dy, dx] * pad[dy : dy + x.shape[0], dx : dx + x.shape[1]]
    out = x.copy()
    out[1:-1, 1:-1] = (
        x[1:-1, 1:-1] * factor + blurred[1:-1, 1:-1] * (1.0 - factor)
    )
    out = np.clip(out, 0, 255).astype(np.uint8)
    return out[..., 0] if img.ndim == 2 else out


def equalize(img: np.ndarray) -> np.ndarray:
    """Per-channel histogram equalization (PIL ImageOps.equalize algorithm)."""
    def eq_channel(ch):
        hist = np.bincount(ch.reshape(-1), minlength=256)
        nonzero = hist[hist != 0]
        if len(nonzero) <= 1:
            return ch
        step = (hist.sum() - nonzero[-1]) // 255
        if step == 0:
            return ch
        lut = (np.cumsum(hist) - hist + step // 2) // step
        return np.clip(lut, 0, 255).astype(np.uint8)[ch]

    if img.ndim == 2:
        return eq_channel(img)
    return np.stack([eq_channel(img[..., c]) for c in range(img.shape[-1])], axis=-1)


class DetectorAugmentation:
    """The detector-pretraining augmentation stack, seeded (reference:
    train_detector.py:401-410). Operates on uint8 HWC arrays."""

    def __init__(
        self,
        brightness: float = 0.01,
        contrast: float = 0.01,
        saturation: float = 0.01,
        hue: float = 0.01,
        p_invert: float = 0.1,
        sharpness_factor: float = 1.2,
        p_sharpness: float = 0.1,
        p_equalize: float = 0.1,
    ):
        self.brightness = brightness
        self.contrast = contrast
        self.saturation = saturation
        self.hue = hue
        self.p_invert = p_invert
        self.sharpness_factor = sharpness_factor
        self.p_sharpness = p_sharpness
        self.p_equalize = p_equalize

    def __call__(self, img: np.ndarray, rng: np.random.Generator) -> np.ndarray:
        # ColorJitter applies the four adjustments in a random order.
        ops = []
        if self.brightness > 0:
            f = rng.uniform(1 - self.brightness, 1 + self.brightness)
            ops.append(lambda im: adjust_brightness(im, f))
        if self.contrast > 0:
            f2 = rng.uniform(1 - self.contrast, 1 + self.contrast)
            ops.append(lambda im: adjust_contrast(im, f2))
        if self.saturation > 0:
            f3 = rng.uniform(1 - self.saturation, 1 + self.saturation)
            ops.append(lambda im: adjust_saturation(im, f3))
        if self.hue > 0:
            d = rng.uniform(-self.hue, self.hue)
            ops.append(lambda im: adjust_hue(im, d))
        for i in rng.permutation(len(ops)):
            img = ops[i](img)
        if rng.random() < self.p_invert:
            img = invert(img)
        if rng.random() < self.p_sharpness:
            img = adjust_sharpness(img, self.sharpness_factor)
        if rng.random() < self.p_equalize:
            img = equalize(img)
        return img
