"""Shared Flax building blocks: conv+BN+ReLU, frozen batchnorm, attention,
activation registry.

Rebuilds the base-module layer of the reference's vendored smp library
(reference: src/segmentation_models/base/modules.py) plus torchvision's
FrozenBatchNorm2d, NHWC and TPU-first. Module/param names mirror the torch
layer names so the checkpoint converter is a mechanical key map.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class FrozenBatchNorm(nn.Module):
    """BatchNorm with all statistics and affine params frozen (torchvision
    FrozenBatchNorm2d semantics: used throughout the detector backbone so the
    detector's loss stays well-defined in eval mode — the property the
    reference's L4 forwarders exist to preserve, SURVEY.md §2.4)."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        weight = self.param("weight", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("running_mean", nn.initializers.zeros, (self.features,))
        var = self.param("running_var", nn.initializers.ones, (self.features,))
        # Never trainable, regardless of optimizer masking.
        weight, bias, mean, var = map(
            jax.lax.stop_gradient, (weight, bias, mean, var)
        )
        # Fold to scale/shift in f32 (stable rsqrt even when params arrive
        # bf16 under the half-precision feature path), then apply in the
        # activation dtype so a bf16 x stays bf16. Exact no-op for f32.
        w32, b32, m32, v32 = (
            t.astype(jnp.float32) for t in (weight, bias, mean, var)
        )
        scale = w32 * jax.lax.rsqrt(v32 + self.eps)
        shift = b32 - m32 * scale
        return x * scale.astype(x.dtype) + shift.astype(x.dtype)


class BatchNorm(nn.Module):
    """Torch-compatible BatchNorm2d: eps 1e-5, momentum 0.1 (torch convention
    -> flax momentum 0.9), running stats in the `batch_stats` collection."""

    features: int
    eps: float = 1e-5
    momentum: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=1.0 - self.momentum,
            epsilon=self.eps,
            name="bn",
        )(x)


def conv(
    features: int,
    kernel_size: int,
    strides: int = 1,
    padding: int | str = 0,
    use_bias: bool = True,
    groups: int = 1,
    dilation: int = 1,
    name: Optional[str] = None,
) -> nn.Conv:
    """3x3/1x1/7x7 conv with torch-style integer padding, NHWC/HWIO."""
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    return nn.Conv(
        features=features,
        kernel_size=(kernel_size, kernel_size),
        strides=(strides, strides),
        padding=padding,
        use_bias=use_bias,
        feature_group_count=groups,
        kernel_dilation=(dilation, dilation),
        name=name,
    )


class ConvParams(nn.Module):
    """Declares nn.Conv-compatible params ('kernel', optional 'bias') without
    applying them — callers apply a transformed kernel (the space-to-depth
    fast paths), so checkpoints stay interchangeable with plain nn.Conv."""

    shape: tuple
    use_bias: bool = False

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(), self.shape)
        bias = (
            self.param("bias", nn.initializers.zeros, (self.shape[-1],))
            if self.use_bias
            else None
        )
        return kernel, bias


class ConvBnReLU(nn.Module):
    """Conv(3x3, pad 1) -> BN -> ReLU, bias iff no batchnorm (reference:
    src/segmentation_models/base/modules.py:10-47 Conv2dReLU)."""

    features: int
    kernel_size: int = 3
    padding: int = 1
    strides: int = 1
    use_batchnorm: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = conv(
            self.features,
            self.kernel_size,
            self.strides,
            self.padding,
            use_bias=not self.use_batchnorm,
            name="0",
        )(x)
        if self.use_batchnorm:
            x = BatchNorm(self.features, name="1")(x, train)
        return nn.relu(x)


class SCSEModule(nn.Module):
    """Concurrent spatial & channel squeeze-excitation attention (reference:
    src/segmentation_models/base/modules.py:50-63)."""

    in_channels: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # Channel SE: global-avg-pool -> 1x1 reduce -> relu -> 1x1 expand -> sigmoid
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        c = conv(self.in_channels // self.reduction, 1, name="cSE_1")(pooled)
        c = nn.relu(c)
        c = conv(self.in_channels, 1, name="cSE_3")(c)
        cse = x * jax.nn.sigmoid(c)
        # Spatial SE: 1x1 conv to one channel -> sigmoid
        s = conv(1, 1, name="sSE_0")(x)
        sse = x * jax.nn.sigmoid(s)
        return cse + sse


class Attention(nn.Module):
    """Attention dispatch: None -> identity, 'scse' -> SCSEModule (reference:
    src/segmentation_models/base/modules.py:119-131)."""

    kind: Optional[str]
    in_channels: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.kind is None or self.kind == "identity":
            return x
        if self.kind == "scse":
            return SCSEModule(self.in_channels, name="attention")(x)
        raise ValueError(f"unknown attention kind: {self.kind}")


def make_activation(name: Optional[str]) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Activation registry (reference: src/segmentation_models/base/modules.py:
    84-116): identity/sigmoid/softmax2d/softmax/logsoftmax/tanh/argmax/argmax2d/
    clamp, plus any jax.nn callable by name."""
    if name is None or name == "identity":
        return lambda x: x
    table: dict[str, Callable[[jnp.ndarray], jnp.ndarray]] = {
        "sigmoid": jax.nn.sigmoid,
        "softmax2d": lambda x: jax.nn.softmax(x, axis=-1),  # channel softmax (NHWC)
        "softmax": lambda x: jax.nn.softmax(x, axis=-1),
        "logsoftmax": lambda x: jax.nn.log_softmax(x, axis=-1),
        "tanh": jnp.tanh,
        "argmax": lambda x: jnp.argmax(x, axis=-1),
        "argmax2d": lambda x: jnp.argmax(x, axis=-1),
        "clamp": lambda x: jnp.clip(x, 0.0, 1.0),
        "relu": nn.relu,
    }
    if name in table:
        return table[name]
    if hasattr(jax.nn, name):
        return getattr(jax.nn, name)
    raise ValueError(f"unknown activation: {name}")
