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


# ---------------------------------------------------------------------------
# Joint bbox-aware spatial augmentation (the reference's multimodal
# DatasetTransform machinery: ONE albumentations compose over both modalities
# with shared bbox params — reference: src/dataloader/dataloaderPL.py:44-86).
# numpy, seeded; boxes are xyxy float arrays, labels int arrays.
# ---------------------------------------------------------------------------


def _clip_boxes(boxes, labels, w, h, min_area=0.0, min_visibility=0.0):
    """albumentations-style post-transform box handling: clip to the frame,
    drop boxes whose clipped area is 0 / below thresholds."""
    if len(boxes) == 0:
        return boxes, labels
    boxes = np.asarray(boxes, np.float32)
    orig_area = np.maximum(boxes[:, 2] - boxes[:, 0], 0) * np.maximum(
        boxes[:, 3] - boxes[:, 1], 0
    )
    clipped = boxes.copy()
    clipped[:, 0::2] = np.clip(clipped[:, 0::2], 0, w)
    clipped[:, 1::2] = np.clip(clipped[:, 1::2], 0, h)
    area = np.maximum(clipped[:, 2] - clipped[:, 0], 0) * np.maximum(
        clipped[:, 3] - clipped[:, 1], 0
    )
    vis = np.where(orig_area > 0, area / np.maximum(orig_area, 1e-9), 0.0)
    keep = (area > min_area) & (vis > min_visibility) & (area > 0)
    return clipped[keep], np.asarray(labels)[keep]


class HorizontalFlip:
    """alb.HorizontalFlip(p) over both modalities with one coin flip."""

    def __init__(self, p: float = 0.5):
        self.p = p

    def __call__(self, sample, rng):
        if rng.random() >= self.p:
            return sample
        img_rgb, b_rgb, l_rgb, img_ir, b_ir, l_ir = sample
        w = img_rgb.shape[1]

        def flip_boxes(b):
            if len(b) == 0:
                return b
            b = np.asarray(b, np.float32).copy()
            b[:, [0, 2]] = w - b[:, [2, 0]]
            return b

        return (
            img_rgb[:, ::-1].copy(), flip_boxes(b_rgb), l_rgb,
            img_ir[:, ::-1].copy(), flip_boxes(b_ir), l_ir,
        )


class RandomCrop:
    """alb.RandomCrop(height, width, p): one crop window shared by both
    modalities; boxes shifted, clipped, and dropped when empty."""

    def __init__(self, height: int, width: int, p: float = 1.0,
                 min_area: float = 0.0, min_visibility: float = 0.0):
        self.height, self.width, self.p = height, width, p
        self.min_area, self.min_visibility = min_area, min_visibility

    def __call__(self, sample, rng):
        if rng.random() >= self.p:
            return sample
        img_rgb, b_rgb, l_rgb, img_ir, b_ir, l_ir = sample
        h, w = img_rgb.shape[:2]
        ch, cw = min(self.height, h), min(self.width, w)
        y0 = int(rng.integers(0, h - ch + 1))
        x0 = int(rng.integers(0, w - cw + 1))

        def crop_img(im):
            return im[y0:y0 + ch, x0:x0 + cw].copy()

        def crop_boxes(b, lab):
            if len(b) == 0:
                return np.asarray(b, np.float32).reshape(0, 4), np.asarray(lab)
            b = np.asarray(b, np.float32).copy()
            b[:, [0, 2]] -= x0
            b[:, [1, 3]] -= y0
            return _clip_boxes(b, lab, cw, ch, self.min_area,
                               self.min_visibility)

        b_rgb2, l_rgb2 = crop_boxes(b_rgb, l_rgb)
        b_ir2, l_ir2 = crop_boxes(b_ir, l_ir)
        return (crop_img(img_rgb), b_rgb2, l_rgb2,
                crop_img(img_ir), b_ir2, l_ir2)


class Resize:
    """alb.Resize(height, width): bilinear with OpenCV's half-pixel-centered
    convention (albumentations' cv2.INTER_LINEAR default); boxes scaled."""

    def __init__(self, height: int, width: int):
        self.height, self.width = height, width

    def _resize(self, im):
        h, w = im.shape[:2]
        out_dtype = im.dtype
        ys = (np.arange(self.height) + 0.5) * (h / self.height) - 0.5
        xs = (np.arange(self.width) + 0.5) * (w / self.width) - 0.5
        y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
        x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
        y1 = np.clip(y0 + 1, 0, h - 1)
        x1 = np.clip(x0 + 1, 0, w - 1)
        wy = np.clip(ys - y0, 0.0, 1.0)[:, None]
        wx = np.clip(xs - x0, 0.0, 1.0)[None, :]
        if im.ndim == 3:
            wy, wx = wy[..., None], wx[..., None]
        imf = im.astype(np.float32)
        top = imf[y0][:, x0] * (1 - wx) + imf[y0][:, x1] * wx
        bot = imf[y1][:, x0] * (1 - wx) + imf[y1][:, x1] * wx
        out = top * (1 - wy) + bot * wy
        if np.issubdtype(out_dtype, np.integer):
            out = np.rint(out).clip(np.iinfo(out_dtype).min,
                                    np.iinfo(out_dtype).max)
        return out.astype(out_dtype)

    def __call__(self, sample, rng):
        img_rgb, b_rgb, l_rgb, img_ir, b_ir, l_ir = sample
        h, w = img_rgb.shape[:2]
        sy, sx = self.height / h, self.width / w

        def scale(b):
            if len(b) == 0:
                return np.asarray(b, np.float32).reshape(0, 4)
            b = np.asarray(b, np.float32).copy()
            b[:, [0, 2]] *= sx
            b[:, [1, 3]] *= sy
            return b

        return (self._resize(img_rgb), scale(b_rgb), l_rgb,
                self._resize(img_ir), scale(b_ir), l_ir)


class JointSpatialTransform:
    """The reference's joint compose with shared bbox params and its
    all-boxes-dropped fallback: when every RGB box is dropped, the
    PRE-transform targets are restored (for both modalities) while the
    transformed images are kept — quirk preserved from dataloaderPL.py:84-86.
    """

    def __init__(self, ops):
        self.ops = list(ops)

    def __call__(self, img_rgb, target_rgb, img_ir, target_ir, rng):
        before_rgb = {k: np.asarray(v).copy() for k, v in target_rgb.items()}
        before_ir = {k: np.asarray(v).copy() for k, v in target_ir.items()}
        sample = (
            img_rgb, target_rgb["boxes"], target_rgb["labels"],
            img_ir, target_ir["boxes"], target_ir["labels"],
        )
        for op in self.ops:
            sample = op(sample, rng)
        img_rgb, b_rgb, l_rgb, img_ir, b_ir, l_ir = sample
        t_rgb = {"boxes": np.asarray(b_rgb, np.float32).reshape(-1, 4),
                 "labels": np.asarray(l_rgb)}
        t_ir = {"boxes": np.asarray(b_ir, np.float32).reshape(-1, 4),
                "labels": np.asarray(l_ir)}
        if len(t_rgb["boxes"]) == 0:
            t_rgb, t_ir = before_rgb, before_ir
        return img_rgb, t_rgb, img_ir, t_ir
