"""Segmentation / classification heads, including the HalluciDet head variants.

Rebuild of smp heads (reference: src/segmentation_models/base/heads.py) plus
the head swaps done by the reference's EncoderDecoder wrapper (reference:
src/models/encoder_decoder.py:29-45): 'sigmoid' (the trained config),
'relu_bn', and 'avg_dropout_sigmoid'. The reference's relu_bn branch crashes
on a missing attribute upstream; here it is implemented as evidently intended
(ReLU then BatchNorm over the output channels).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from hallucidet_tpu.nn.layers import BatchNorm, conv, make_activation
from hallucidet_tpu.ops.image_ops import upsample_nearest


class SegmentationHead(nn.Module):
    """conv3x3 -> optional deterministic upsample -> head activation."""

    out_channels: int
    kernel_size: int = 3
    upsampling: int = 1
    head: str = "sigmoid"  # sigmoid | relu_bn | avg_dropout_sigmoid | identity | any activation name
    dropout: float = 0.2
    avg2d: bool = True

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        train: bool = False,
        dropout_rng: Optional[jax.Array] = None,
    ) -> jnp.ndarray:
        x = conv(
            self.out_channels, self.kernel_size, 1, self.kernel_size // 2, name="0"
        )(x)
        if self.upsampling > 1:
            x = upsample_nearest(x, self.upsampling)
        if self.head == "relu_bn":
            x = nn.relu(x)
            x = BatchNorm(self.out_channels, name="head_bn")(x, train)
        elif self.head == "avg_dropout_sigmoid":
            if self.avg2d:
                x = jnp.mean(x, axis=(1, 2), keepdims=True)
            if train and self.dropout > 0:
                x = nn.Dropout(rate=self.dropout, deterministic=False)(
                    x, rng=dropout_rng
                )
            x = jax.nn.sigmoid(x)
        else:
            x = make_activation(self.head)(x)
        return x


class ClassificationHead(nn.Module):
    """global-avg-pool -> dropout -> linear [-> activation] (reference:
    src/segmentation_models/base/heads.py:29-38)."""

    classes: int
    dropout: float = 0.2
    activation: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        train: bool = False,
        dropout_rng: Optional[jax.Array] = None,
    ) -> jnp.ndarray:
        x = jnp.mean(x, axis=(1, 2))
        if train and self.dropout > 0:
            x = nn.Dropout(rate=self.dropout, deterministic=False)(x, rng=dropout_rng)
        x = nn.Dense(self.classes, name="linear")(x)
        if self.activation:
            x = make_activation(self.activation)(x)
        return x
