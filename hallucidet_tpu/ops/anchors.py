"""Multi-level (FPN) anchor generation with static shapes.

TPU-native equivalent of the anchor generators the reference reaches through
torchvision (reference: src/utils/eval_forward_fasterrcnn.py:77,
src/utils/eval_forward_retinanet.py:133). Because the detection transform is
fixed-size (300x300 / 640x640), anchors are a compile-time constant per config:
we build them once in numpy and close over them, so XLA sees a constant.

Anchor layout per level: row-major over (y, x) grid positions, with all cell
anchors per position contiguous — i.e. index = (y * gw + x) * A + a. Levels are
concatenated in order. This matches the standard torchvision layout so ported
head weights line up channel-for-channel.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import numpy as np


def generate_cell_anchors(
    scales: Sequence[float],
    aspect_ratios: Sequence[float],
    round_anchors: bool = True,
) -> np.ndarray:
    """Zero-centered base anchors [len(aspect_ratios)*len(scales), 4] xyxy.

    h_ratio = sqrt(ar), w_ratio = 1/h_ratio; ws/hs enumerate (ratio, scale)
    with scale fastest, matching the channel order of torchvision heads.
    """
    scales = np.asarray(scales, dtype=np.float64)
    aspect_ratios = np.asarray(aspect_ratios, dtype=np.float64)
    h_ratios = np.sqrt(aspect_ratios)
    w_ratios = 1.0 / h_ratios
    ws = (w_ratios[:, None] * scales[None, :]).reshape(-1)
    hs = (h_ratios[:, None] * scales[None, :]).reshape(-1)
    base = np.stack([-ws, -hs, ws, hs], axis=1) / 2.0
    if round_anchors:
        base = np.round(base)
    return base.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _grid_anchors_cached(
    grid_sizes: Tuple[Tuple[int, int], ...],
    strides: Tuple[Tuple[float, float], ...],
    scales_per_level: Tuple[Tuple[float, ...], ...],
    aspect_ratios: Tuple[float, ...],
    round_anchors: bool,
) -> Tuple[np.ndarray, ...]:
    out = []
    for (gh, gw), (sh, sw), scales in zip(grid_sizes, strides, scales_per_level):
        cell = generate_cell_anchors(scales, aspect_ratios, round_anchors)
        shifts_x = np.arange(gw, dtype=np.float32) * sw
        shifts_y = np.arange(gh, dtype=np.float32) * sh
        sy, sx = np.meshgrid(shifts_y, shifts_x, indexing="ij")
        shifts = np.stack(
            [sx.reshape(-1), sy.reshape(-1), sx.reshape(-1), sy.reshape(-1)], axis=1
        )
        anchors = (shifts[:, None, :] + cell[None, :, :]).reshape(-1, 4)
        out.append(anchors.astype(np.float32))
    return tuple(out)


class AnchorGenerator:
    """FPN anchor generator over fixed image size.

    sizes: per-level tuples of anchor scales (in input-image pixels).
    aspect_ratios: shared across levels (torchvision replicates per level).
    """

    def __init__(
        self,
        sizes: Sequence[Sequence[float]],
        aspect_ratios: Sequence[float] = (0.5, 1.0, 2.0),
        round_anchors: bool = True,
    ):
        self.sizes = tuple(tuple(float(s) for s in lvl) for lvl in sizes)
        self.aspect_ratios = tuple(float(a) for a in aspect_ratios)
        self.round_anchors = round_anchors

    @property
    def num_anchors_per_location(self) -> int:
        return len(self.sizes[0]) * len(self.aspect_ratios)

    def anchors_per_level(
        self,
        image_size_hw: Tuple[int, int],
        feature_sizes_hw: Sequence[Tuple[int, int]],
    ) -> Tuple[np.ndarray, ...]:
        """Constant per-level anchors [Ni, 4] for a fixed image/feature config.

        Strides use integer division image_size // feature_size (torchvision
        semantics), so 300/FPN gives strides 4, 7(!), 15, 37, 75-adjacent —
        exactly matching the ported weights' training geometry.
        """
        ih, iw = image_size_hw
        grid_sizes = tuple((int(h), int(w)) for h, w in feature_sizes_hw)
        strides = tuple(
            (float(ih // h), float(iw // w)) for h, w in grid_sizes
        )
        assert len(grid_sizes) == len(self.sizes), (
            f"{len(grid_sizes)} feature levels vs {len(self.sizes)} anchor size sets"
        )
        return _grid_anchors_cached(
            grid_sizes, strides, self.sizes, self.aspect_ratios, self.round_anchors
        )

    def anchors_concat(
        self,
        image_size_hw: Tuple[int, int],
        feature_sizes_hw: Sequence[Tuple[int, int]],
    ) -> np.ndarray:
        """All levels concatenated: [sum_i Ni, 4]."""
        return np.concatenate(
            self.anchors_per_level(image_size_hw, feature_sizes_hw), axis=0
        )


def rpn_anchor_generator() -> AnchorGenerator:
    """Anchor config of the RPN in *_resnet50_fpn detectors:
    one scale per level (32..512), 3 aspect ratios."""
    return AnchorGenerator(
        sizes=((32,), (64,), (128,), (256,), (512,)),
        aspect_ratios=(0.5, 1.0, 2.0),
    )


def retinanet_anchor_generator() -> AnchorGenerator:
    """RetinaNet: 3 octave scales per level x 3 aspect ratios."""
    sizes = tuple(
        tuple(x * 2 ** (i / 3) for i in range(3)) for x in (32, 64, 128, 256, 512)
    )
    return AnchorGenerator(sizes=sizes, aspect_ratios=(0.5, 1.0, 2.0))


def fcos_anchor_generator() -> AnchorGenerator:
    """FCOS uses degenerate one-point 'anchors' (8..128), ratio 1.0; the
    boxes only carry grid-cell geometry for the point-based losses."""
    return AnchorGenerator(
        sizes=((8,), (16,), (32,), (64,), (128,)), aspect_ratios=(1.0,)
    )
