"""Padded, static-shape target/detection containers.

The reference passes ragged `List[Dict[str, Tensor]]` targets through every
layer (reference: src/dataloader/dataloader.py targets, src/utils/utils.py:25-47
`batch_targets_for_detector`). The TPU-native design replaces them with fixed-
capacity tensors + validity masks so the whole graph is one XLA program.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Sequence

import jax.numpy as jnp
import numpy as np


class Targets(NamedTuple):
    """Ground-truth boxes per batch: boxes [B, G, 4] xyxy, labels [B, G]
    int32 (1 = person for the 2-class configs), valid [B, G] bool."""

    boxes: jnp.ndarray
    labels: jnp.ndarray
    valid: jnp.ndarray

    @property
    def batch_size(self) -> int:
        return self.boxes.shape[0]

    @property
    def capacity(self) -> int:
        return self.boxes.shape[1]

    def scale(self, ratio_hw) -> "Targets":
        rh, rw = ratio_hw
        b = self.boxes * jnp.asarray([rw, rh, rw, rh], self.boxes.dtype)
        return Targets(b, self.labels, self.valid)


class Detections(NamedTuple):
    """Predictions per batch: boxes [B, D, 4], scores [B, D], labels [B, D]
    int32, valid [B, D] bool; score-sorted within each image."""

    boxes: jnp.ndarray
    scores: jnp.ndarray
    labels: jnp.ndarray
    valid: jnp.ndarray


def pad_targets(
    boxes_list: Sequence[np.ndarray],
    labels_list: Sequence[np.ndarray],
    capacity: int,
) -> Targets:
    """Host-side: ragged numpy lists -> padded Targets. Overflow truncates
    (capacity should exceed the dataset max; LLVIP tops out well below 64)."""
    b = len(boxes_list)
    boxes = np.zeros((b, capacity, 4), np.float32)
    labels = np.zeros((b, capacity), np.int32)
    valid = np.zeros((b, capacity), bool)
    for i, (bx, lb) in enumerate(zip(boxes_list, labels_list)):
        n = min(len(bx), capacity)
        if n:
            boxes[i, :n] = np.asarray(bx, np.float32).reshape(-1, 4)[:n]
            labels[i, :n] = np.asarray(lb, np.int32).reshape(-1)[:n]
            valid[i, :n] = True
    return Targets(jnp.asarray(boxes), jnp.asarray(labels), jnp.asarray(valid))
