"""Remaining smp encoder families: Inception and the timm-backed zoo.

Rebuilds, TPU-native (NHWC Flax), of the reference's vendored families that
round 1 left out (reference: src/segmentation_models/encoders/):
- inceptionv4.py        (stage_idxs (3,5,9,15), all 3x3 convs re-padded to 1)
- inceptionresnetv2.py  (named-module stages, same padding patch)
- timm_resnest.py       (timm ResNet + ResNestBottleneck, deep stem, avg_down)
- timm_res2net.py       (timm ResNet + Bottle2neck multi-scale splits)
- timm_sknet.py         (selective-kernel basic/bottleneck blocks)
- timm_regnet.py        (parametric width schedule, X and Y (SE) variants)
- timm_gernet.py        (ByobNet basic/bottle blocks, depthwise 3x3 bottles)
- timm_mobilenetv3.py   (tf_ SAME-padding variants, hardswish + SE)

Module names mirror the torch layer names (features_0, branch1_0, layer2_1,
s2_b3, blocks_4_1 ...) so interop/torch_loader's rule-based key mapping
extends mechanically. This file registers everything via `register()`, called
from nn/encoders.py — no circular import.
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from hallucidet_tpu.nn.layers import BatchNorm, conv


# ---------------------------------------------------------------------------
# shared helpers
# ---------------------------------------------------------------------------


def make_divisible(v, divisor: int = 8, min_value=None, round_limit: float = 0.9):
    """timm's channel rounding (timm/models/layers/helpers.py)."""
    min_value = min_value if min_value is not None else divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < round_limit * v:
        new_v += divisor
    return new_v


def rconv(features, kh, kw, stride=1, ph=0, pw=0, use_bias=False, groups=1,
          name=None):
    """Rectangular-kernel conv with torch-style integer padding."""
    return nn.Conv(
        features=features, kernel_size=(kh, kw), strides=(stride, stride),
        padding=((ph, ph), (pw, pw)), use_bias=use_bias,
        feature_group_count=groups, name=name,
    )


def avg_pool_torch(x, window=3, stride=1, padding=1):
    """torch AvgPool2d(count_include_pad=False)."""
    return nn.avg_pool(
        x, (window, window), strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        count_include_pad=False,
    )


def avg_pool_ceil(x, window=2, stride=2):
    """torch AvgPool2d(window, stride, ceil_mode=True, count_include_pad=
    False) with no input padding — timm's avg_down shortcut pool."""
    h, w = x.shape[1:3]

    def pad_amount(dim):
        n_out = -(-(dim - window) // stride) + 1 if dim >= window else 1
        return max(0, (n_out - 1) * stride + window - dim)

    return nn.avg_pool(
        x, (window, window), strides=(stride, stride),
        padding=((0, pad_amount(h)), (0, pad_amount(w))),
        count_include_pad=False,
    )


class BasicConv2d(nn.Module):
    """conv(bias=False) + BN(eps=1e-3) + ReLU — pretrainedmodels' inception
    building block. Rectangular kernels/paddings supported."""

    features: int
    kernel: Tuple[int, int] = (3, 3)
    stride: int = 1
    padding: Tuple[int, int] = (0, 0)

    @nn.compact
    def __call__(self, x, train: bool = False):
        kh, kw = self.kernel
        ph, pw = self.padding
        x = rconv(self.features, kh, kw, self.stride, ph, pw, name="conv")(x)
        x = BatchNorm(self.features, eps=1e-3, name="bn")(x, train)
        return nn.relu(x)


def _mp3(x):
    """MaxPool(3, s2) with the smp inception padding patch (pad 1)."""
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))


# ---------------------------------------------------------------------------
# InceptionV4 (reference: encoders/inceptionv4.py; pretrainedmodels
# inceptionv4 with every 3x3 conv / maxpool re-padded to 1)
# ---------------------------------------------------------------------------


class Mixed3a(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        return jnp.concatenate(
            [_mp3(x), BasicConv2d(96, (3, 3), 2, (1, 1), name="conv")(x, train)],
            axis=-1,
        )


class Mixed4a(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        b0 = BasicConv2d(64, (1, 1), name="branch0_0")(x, train)
        b0 = BasicConv2d(96, (3, 3), 1, (1, 1), name="branch0_1")(b0, train)
        b1 = BasicConv2d(64, (1, 1), name="branch1_0")(x, train)
        b1 = BasicConv2d(64, (1, 7), 1, (0, 3), name="branch1_1")(b1, train)
        b1 = BasicConv2d(64, (7, 1), 1, (3, 0), name="branch1_2")(b1, train)
        b1 = BasicConv2d(96, (3, 3), 1, (1, 1), name="branch1_3")(b1, train)
        return jnp.concatenate([b0, b1], axis=-1)


class Mixed5a(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        return jnp.concatenate(
            [BasicConv2d(192, (3, 3), 2, (1, 1), name="conv")(x, train), _mp3(x)],
            axis=-1,
        )


class InceptionA(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        b0 = BasicConv2d(96, (1, 1), name="branch0")(x, train)
        b1 = BasicConv2d(64, (1, 1), name="branch1_0")(x, train)
        b1 = BasicConv2d(96, (3, 3), 1, (1, 1), name="branch1_1")(b1, train)
        b2 = BasicConv2d(64, (1, 1), name="branch2_0")(x, train)
        b2 = BasicConv2d(96, (3, 3), 1, (1, 1), name="branch2_1")(b2, train)
        b2 = BasicConv2d(96, (3, 3), 1, (1, 1), name="branch2_2")(b2, train)
        b3 = avg_pool_torch(x)
        b3 = BasicConv2d(96, (1, 1), name="branch3_1")(b3, train)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class ReductionA(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        b0 = BasicConv2d(384, (3, 3), 2, (1, 1), name="branch0")(x, train)
        b1 = BasicConv2d(192, (1, 1), name="branch1_0")(x, train)
        b1 = BasicConv2d(224, (3, 3), 1, (1, 1), name="branch1_1")(b1, train)
        b1 = BasicConv2d(256, (3, 3), 2, (1, 1), name="branch1_2")(b1, train)
        return jnp.concatenate([b0, b1, _mp3(x)], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        b0 = BasicConv2d(384, (1, 1), name="branch0")(x, train)
        b1 = BasicConv2d(192, (1, 1), name="branch1_0")(x, train)
        b1 = BasicConv2d(224, (1, 7), 1, (0, 3), name="branch1_1")(b1, train)
        b1 = BasicConv2d(256, (7, 1), 1, (3, 0), name="branch1_2")(b1, train)
        b2 = BasicConv2d(192, (1, 1), name="branch2_0")(x, train)
        b2 = BasicConv2d(192, (7, 1), 1, (3, 0), name="branch2_1")(b2, train)
        b2 = BasicConv2d(224, (1, 7), 1, (0, 3), name="branch2_2")(b2, train)
        b2 = BasicConv2d(224, (7, 1), 1, (3, 0), name="branch2_3")(b2, train)
        b2 = BasicConv2d(256, (1, 7), 1, (0, 3), name="branch2_4")(b2, train)
        b3 = avg_pool_torch(x)
        b3 = BasicConv2d(128, (1, 1), name="branch3_1")(b3, train)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class ReductionB(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        b0 = BasicConv2d(192, (1, 1), name="branch0_0")(x, train)
        b0 = BasicConv2d(192, (3, 3), 2, (1, 1), name="branch0_1")(b0, train)
        b1 = BasicConv2d(256, (1, 1), name="branch1_0")(x, train)
        b1 = BasicConv2d(256, (1, 7), 1, (0, 3), name="branch1_1")(b1, train)
        b1 = BasicConv2d(320, (7, 1), 1, (3, 0), name="branch1_2")(b1, train)
        b1 = BasicConv2d(320, (3, 3), 2, (1, 1), name="branch1_3")(b1, train)
        return jnp.concatenate([b0, b1, _mp3(x)], axis=-1)


class InceptionC(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        b0 = BasicConv2d(256, (1, 1), name="branch0")(x, train)
        b1 = BasicConv2d(384, (1, 1), name="branch1_0")(x, train)
        b1a = BasicConv2d(256, (1, 3), 1, (0, 1), name="branch1_1a")(b1, train)
        b1b = BasicConv2d(256, (3, 1), 1, (1, 0), name="branch1_1b")(b1, train)
        b2 = BasicConv2d(384, (1, 1), name="branch2_0")(x, train)
        b2 = BasicConv2d(448, (3, 1), 1, (1, 0), name="branch2_1")(b2, train)
        b2 = BasicConv2d(512, (1, 3), 1, (0, 1), name="branch2_2")(b2, train)
        b2a = BasicConv2d(256, (1, 3), 1, (0, 1), name="branch2_3a")(b2, train)
        b2b = BasicConv2d(256, (3, 1), 1, (1, 0), name="branch2_3b")(b2, train)
        b3 = avg_pool_torch(x)
        b3 = BasicConv2d(256, (1, 1), name="branch3_1")(b3, train)
        return jnp.concatenate([b0, b1a, b1b, b2a, b2b, b3], axis=-1)


class InceptionV4Encoder(nn.Module):
    """stage_idxs (3,5,9,15) over the 22-module feature stack
    (reference: encoders/inceptionv4.py:86-95)."""

    output_stride: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        if self.output_stride != 32:
            raise ValueError("InceptionV4 encoder does not support dilated mode")
        mods = (
            [lambda y, t: BasicConv2d(32, (3, 3), 2, (1, 1),
                                      name="features_0")(y, t)]
            + [lambda y, t: BasicConv2d(32, (3, 3), 1, (1, 1),
                                        name="features_1")(y, t)]
            + [lambda y, t: BasicConv2d(64, (3, 3), 1, (1, 1),
                                        name="features_2")(y, t)]
            + [lambda y, t: Mixed3a(name="features_3")(y, t)]
            + [lambda y, t: Mixed4a(name="features_4")(y, t)]
            + [lambda y, t: Mixed5a(name="features_5")(y, t)]
            + [
                (lambda i: lambda y, t: InceptionA(name=f"features_{i}")(y, t))(i)
                for i in range(6, 10)
            ]
            + [lambda y, t: ReductionA(name="features_10")(y, t)]
            + [
                (lambda i: lambda y, t: InceptionB(name=f"features_{i}")(y, t))(i)
                for i in range(11, 18)
            ]
            + [lambda y, t: ReductionB(name="features_18")(y, t)]
            + [
                (lambda i: lambda y, t: InceptionC(name=f"features_{i}")(y, t))(i)
                for i in range(19, 22)
            ]
        )
        stage_idxs = (0, 3, 5, 9, 15, 22)
        features = [x]
        y = x
        for si in range(5):
            for mi in range(stage_idxs[si], stage_idxs[si + 1]):
                y = mods[mi](y, train)
            features.append(y)
        return features


# ---------------------------------------------------------------------------
# InceptionResNetV2 (reference: encoders/inceptionresnetv2.py)
# ---------------------------------------------------------------------------


class Mixed5b(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        b0 = BasicConv2d(96, (1, 1), name="branch0")(x, train)
        b1 = BasicConv2d(48, (1, 1), name="branch1_0")(x, train)
        b1 = BasicConv2d(64, (5, 5), 1, (2, 2), name="branch1_1")(b1, train)
        b2 = BasicConv2d(64, (1, 1), name="branch2_0")(x, train)
        b2 = BasicConv2d(96, (3, 3), 1, (1, 1), name="branch2_1")(b2, train)
        b2 = BasicConv2d(96, (3, 3), 1, (1, 1), name="branch2_2")(b2, train)
        b3 = avg_pool_torch(x)
        b3 = BasicConv2d(64, (1, 1), name="branch3_1")(b3, train)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class Block35(nn.Module):
    scale: float = 0.17

    @nn.compact
    def __call__(self, x, train=False):
        b0 = BasicConv2d(32, (1, 1), name="branch0")(x, train)
        b1 = BasicConv2d(32, (1, 1), name="branch1_0")(x, train)
        b1 = BasicConv2d(32, (3, 3), 1, (1, 1), name="branch1_1")(b1, train)
        b2 = BasicConv2d(32, (1, 1), name="branch2_0")(x, train)
        b2 = BasicConv2d(48, (3, 3), 1, (1, 1), name="branch2_1")(b2, train)
        b2 = BasicConv2d(64, (3, 3), 1, (1, 1), name="branch2_2")(b2, train)
        up = rconv(320, 1, 1, use_bias=True, name="conv2d")(
            jnp.concatenate([b0, b1, b2], axis=-1)
        )
        return nn.relu(x + self.scale * up)


class Mixed6a(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        b0 = BasicConv2d(384, (3, 3), 2, (1, 1), name="branch0")(x, train)
        b1 = BasicConv2d(256, (1, 1), name="branch1_0")(x, train)
        b1 = BasicConv2d(256, (3, 3), 1, (1, 1), name="branch1_1")(b1, train)
        b1 = BasicConv2d(384, (3, 3), 2, (1, 1), name="branch1_2")(b1, train)
        return jnp.concatenate([b0, b1, _mp3(x)], axis=-1)


class Block17(nn.Module):
    scale: float = 0.10

    @nn.compact
    def __call__(self, x, train=False):
        b0 = BasicConv2d(192, (1, 1), name="branch0")(x, train)
        b1 = BasicConv2d(128, (1, 1), name="branch1_0")(x, train)
        b1 = BasicConv2d(160, (1, 7), 1, (0, 3), name="branch1_1")(b1, train)
        b1 = BasicConv2d(192, (7, 1), 1, (3, 0), name="branch1_2")(b1, train)
        up = rconv(1088, 1, 1, use_bias=True, name="conv2d")(
            jnp.concatenate([b0, b1], axis=-1)
        )
        return nn.relu(x + self.scale * up)


class Mixed7a(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        b0 = BasicConv2d(256, (1, 1), name="branch0_0")(x, train)
        b0 = BasicConv2d(384, (3, 3), 2, (1, 1), name="branch0_1")(b0, train)
        b1 = BasicConv2d(256, (1, 1), name="branch1_0")(x, train)
        b1 = BasicConv2d(288, (3, 3), 2, (1, 1), name="branch1_1")(b1, train)
        b2 = BasicConv2d(256, (1, 1), name="branch2_0")(x, train)
        b2 = BasicConv2d(288, (3, 3), 1, (1, 1), name="branch2_1")(b2, train)
        b2 = BasicConv2d(320, (3, 3), 2, (1, 1), name="branch2_2")(b2, train)
        return jnp.concatenate([b0, b1, b2, _mp3(x)], axis=-1)


class Block8(nn.Module):
    scale: float = 0.20
    no_relu: bool = False

    @nn.compact
    def __call__(self, x, train=False):
        b0 = BasicConv2d(192, (1, 1), name="branch0")(x, train)
        b1 = BasicConv2d(192, (1, 1), name="branch1_0")(x, train)
        b1 = BasicConv2d(224, (1, 3), 1, (0, 1), name="branch1_1")(b1, train)
        b1 = BasicConv2d(256, (3, 1), 1, (1, 0), name="branch1_2")(b1, train)
        up = rconv(2080, 1, 1, use_bias=True, name="conv2d")(
            jnp.concatenate([b0, b1], axis=-1)
        )
        out = x + self.scale * up
        return out if self.no_relu else nn.relu(out)


class InceptionResNetV2Encoder(nn.Module):
    """Stages: (1a,2a,2b) / (pool,3b,4a) / (pool,5b,repeat) / (6a,repeat_1) /
    (7a,repeat_2,block8,7b) — reference encoders/inceptionresnetv2.py:58-66."""

    output_stride: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        if self.output_stride != 32:
            raise ValueError(
                "InceptionResnetV2 encoder does not support dilated mode"
            )
        features = [x]
        y = BasicConv2d(32, (3, 3), 2, (1, 1), name="conv2d_1a")(x, train)
        y = BasicConv2d(32, (3, 3), 1, (1, 1), name="conv2d_2a")(y, train)
        y = BasicConv2d(64, (3, 3), 1, (1, 1), name="conv2d_2b")(y, train)
        features.append(y)
        y = _mp3(y)
        y = BasicConv2d(80, (1, 1), name="conv2d_3b")(y, train)
        y = BasicConv2d(192, (3, 3), 1, (1, 1), name="conv2d_4a")(y, train)
        features.append(y)
        y = _mp3(y)
        y = Mixed5b(name="mixed_5b")(y, train)
        for i in range(10):
            y = Block35(name=f"repeat_{i}")(y, train)
        features.append(y)
        y = Mixed6a(name="mixed_6a")(y, train)
        for i in range(20):
            y = Block17(name=f"repeat_1_{i}")(y, train)
        features.append(y)
        y = Mixed7a(name="mixed_7a")(y, train)
        for i in range(9):
            y = Block8(name=f"repeat_2_{i}")(y, train)
        y = Block8(scale=1.0, no_relu=True, name="block8")(y, train)
        y = BasicConv2d(1536, (1, 1), name="conv2d_7b")(y, train)
        features.append(y)
        return features


# ---------------------------------------------------------------------------
# timm ResNet base: deep/standard stem, avg_down shortcuts, pluggable block.
# (reference: timm_resnest.py / timm_res2net.py / timm_sknet.py get_stages)
# ---------------------------------------------------------------------------


class _AvgDownShortcut(nn.Module):
    out_ch: int
    stride: int = 1
    avg_down: bool = False

    @nn.compact
    def __call__(self, x, train=False):
        if self.avg_down:
            if self.stride > 1:
                x = avg_pool_ceil(x, 2, self.stride)
            x = conv(self.out_ch, 1, 1, 0, use_bias=False, name="downsample_0")(x)
            x = BatchNorm(self.out_ch, name="downsample_1")(x, train)
        else:
            x = conv(self.out_ch, 1, self.stride, 0, use_bias=False,
                     name="downsample_0")(x)
            x = BatchNorm(self.out_ch, name="downsample_1")(x, train)
        return x


class SplitAttnConv(nn.Module):
    """timm SplitAttn: grouped radix conv + radix-softmax channel gating."""

    out_ch: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    radix: int = 2

    @nn.compact
    def __call__(self, x, train=False):
        in_ch = x.shape[-1]
        radix, groups = self.radix, self.groups
        mid = self.out_ch * radix
        attn_chs = make_divisible(in_ch * radix * 0.25, divisor=8, min_value=32)
        y = conv(mid, self.kernel, self.stride, self.kernel // 2,
                 use_bias=False, groups=groups * radix, name="conv")(x)
        y = BatchNorm(mid, name="bn0")(y, train)
        y = nn.relu(y)
        b, h, w, _ = y.shape
        if radix > 1:
            y_r = y.reshape(b, h, w, radix, self.out_ch)
            gap = y_r.sum(axis=3)
        else:
            gap = y
        gap = gap.mean(axis=(1, 2), keepdims=True)
        gap = conv(attn_chs, 1, use_bias=True, groups=groups, name="fc1")(gap)
        gap = BatchNorm(attn_chs, name="bn1")(gap, train)
        gap = nn.relu(gap)
        attn = conv(mid, 1, use_bias=True, groups=groups, name="fc2")(gap)
        # radix softmax (channel layout is radix-major, matching the conv's
        # group order)
        if radix > 1:
            cpg = self.out_ch // groups
            a = attn.reshape(b, 1, 1, groups, radix, cpg)
            a = jax.nn.softmax(a, axis=4)
            a = a.reshape(b, 1, 1, groups, radix * cpg)
            # back to radix-major channel order
            a = a.reshape(b, 1, 1, groups, radix, cpg)
            a = jnp.transpose(a, (0, 1, 2, 4, 3, 5)).reshape(b, 1, 1, mid)
            out = (y.reshape(b, h, w, radix, self.out_ch)
                   * a.reshape(b, 1, 1, radix, self.out_ch)).sum(axis=3)
        else:
            out = y * jax.nn.sigmoid(attn)
        return out


class ResNestBottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    avg_down: bool = True
    cardinality: int = 1
    base_width: int = 64
    radix: int = 2
    avd: bool = True
    avd_first: bool = False

    @nn.compact
    def __call__(self, x, train=False):
        out_ch = self.planes * 4
        gw = int(self.planes * (self.base_width / 64.0)) * self.cardinality
        avd_stride = self.stride if (self.avd and self.stride > 1) else 0
        conv2_stride = 1 if avd_stride > 0 else self.stride
        y = conv(gw, 1, 1, 0, use_bias=False, name="conv1")(x)
        y = BatchNorm(gw, name="bn1")(y, train)
        y = nn.relu(y)
        if avd_stride > 0 and self.avd_first:
            y = avg_pool_torch(y, 3, avd_stride, 1)
        y = SplitAttnConv(gw, 3, conv2_stride, self.cardinality, self.radix,
                          name="conv2")(y, train)
        if avd_stride > 0 and not self.avd_first:
            y = avg_pool_torch(y, 3, avd_stride, 1)
        y = conv(out_ch, 1, 1, 0, use_bias=False, name="conv3")(y)
        y = BatchNorm(out_ch, name="bn3")(y, train)
        identity = x
        if self.downsample:
            identity = _AvgDownShortcut(out_ch, self.stride, self.avg_down,
                                        name="downsample")(x, train)
        return nn.relu(y + identity)


class Bottle2neck(nn.Module):
    """Res2Net multi-scale bottleneck (timm res2net.py)."""

    planes: int
    stride: int = 1
    downsample: bool = False
    cardinality: int = 1
    base_width: int = 26
    scale: int = 4

    @nn.compact
    def __call__(self, x, train=False):
        out_ch = self.planes * 4
        width = int(math.floor(self.planes * (self.base_width / 64.0))
                    ) * self.cardinality
        num_scales = max(1, self.scale - 1)
        is_first = self.stride > 1 or self.downsample
        y = conv(width * self.scale, 1, 1, 0, use_bias=False, name="conv1")(x)
        y = BatchNorm(width * self.scale, name="bn1")(y, train)
        y = nn.relu(y)
        spx = [y[..., i * width:(i + 1) * width] for i in range(self.scale)]
        spo = []
        sp = spx[0]
        for i in range(num_scales):
            sp = spx[i] if (i == 0 or is_first) else sp + spx[i]
            sp = conv(width, 3, self.stride, 1, use_bias=False,
                      groups=self.cardinality, name=f"convs_{i}")(sp)
            sp = BatchNorm(width, name=f"bns_{i}")(sp, train)
            sp = nn.relu(sp)
            spo.append(sp)
        if self.scale > 1:
            if is_first:
                spo.append(avg_pool_torch(spx[-1], 3, self.stride, 1))
            else:
                spo.append(spx[-1])
        y = jnp.concatenate(spo, axis=-1)
        y = conv(out_ch, 1, 1, 0, use_bias=False, name="conv3")(y)
        y = BatchNorm(out_ch, name="bn3")(y, train)
        identity = x
        if self.downsample:
            identity = _AvgDownShortcut(out_ch, self.stride, False,
                                        name="downsample")(x, train)
        return nn.relu(y + identity)


class SelectiveKernelConv(nn.Module):
    """timm SelectiveKernel: two 3x3 paths (dilation 1 and 2) + soft path
    attention."""

    out_ch: int
    stride: int = 1
    groups: int = 1
    rd_ratio: float = 1 / 16
    split_input: bool = False

    @nn.compact
    def __call__(self, x, train=False):
        num_paths = 2
        in_ch = x.shape[-1]
        groups = min(self.out_ch, self.groups)
        attn_chs = make_divisible(self.out_ch * self.rd_ratio, divisor=8)
        if self.split_input:
            xs = [x[..., : in_ch // 2], x[..., in_ch // 2:]]
        else:
            xs = [x, x]
        paths = []
        for i, (d, xi) in enumerate(zip((1, 2), xs)):
            p = conv(self.out_ch, 3, self.stride, d, use_bias=False,
                     groups=groups, dilation=d, name=f"paths_{i}_conv")(xi)
            p = BatchNorm(self.out_ch, name=f"paths_{i}_bn")(p, train)
            paths.append(nn.relu(p))
        stacked = jnp.stack(paths, axis=1)  # (B, P, H, W, C)
        gap = stacked.sum(axis=1).mean(axis=(1, 2), keepdims=True)
        a = conv(attn_chs, 1, use_bias=False, name="attn_fc_reduce")(gap)
        a = BatchNorm(attn_chs, name="attn_bn")(a, train)
        a = nn.relu(a)
        a = conv(self.out_ch * num_paths, 1, use_bias=False,
                 name="attn_fc_select")(a)
        b = a.shape[0]
        a = a.reshape(b, 1, 1, num_paths, self.out_ch)
        a = jax.nn.softmax(a, axis=3)
        a = jnp.transpose(a, (0, 3, 1, 2, 4))  # (B, P, 1, 1, C)
        return (stacked * a).sum(axis=1)


class SelectiveKernelBasic(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    rd_ratio: float = 1 / 8
    split_input: bool = True

    @nn.compact
    def __call__(self, x, train=False):
        y = SelectiveKernelConv(self.planes, self.stride,
                                rd_ratio=self.rd_ratio,
                                split_input=self.split_input,
                                name="conv1")(x, train)
        y = conv(self.planes, 3, 1, 1, use_bias=False, name="conv2")(y)
        y = BatchNorm(self.planes, name="bn2")(y, train)
        identity = x
        if self.downsample:
            identity = _AvgDownShortcut(self.planes, self.stride, False,
                                        name="downsample")(x, train)
        return nn.relu(y + identity)


class SelectiveKernelBottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    cardinality: int = 32
    base_width: int = 4

    @nn.compact
    def __call__(self, x, train=False):
        out_ch = self.planes * 4
        width = int(self.planes * (self.base_width / 64.0)) * self.cardinality
        y = conv(width, 1, 1, 0, use_bias=False, name="conv1")(x)
        y = BatchNorm(width, name="bn1")(y, train)
        y = nn.relu(y)
        y = SelectiveKernelConv(width, self.stride, groups=self.cardinality,
                                name="conv2")(y, train)
        y = conv(out_ch, 1, 1, 0, use_bias=False, name="conv3")(y)
        y = BatchNorm(out_ch, name="bn3")(y, train)
        identity = x
        if self.downsample:
            identity = _AvgDownShortcut(out_ch, self.stride, False,
                                        name="downsample")(x, train)
        return nn.relu(y + identity)


_TIMM_RESNET_CFG = {
    # reference: timm_resnest.py / timm_res2net.py / timm_sknet.py params
    "timm-resnest14d": dict(block="resnest", layers=(1, 1, 1, 1),
                            stem="deep", stem_width=32, avg_down=True,
                            cardinality=1, base_width=64, radix=2,
                            avd_first=False),
    "timm-resnest26d": dict(block="resnest", layers=(2, 2, 2, 2),
                            stem="deep", stem_width=32, avg_down=True,
                            cardinality=1, base_width=64, radix=2,
                            avd_first=False),
    "timm-resnest50d": dict(block="resnest", layers=(3, 4, 6, 3),
                            stem="deep", stem_width=32, avg_down=True,
                            cardinality=1, base_width=64, radix=2,
                            avd_first=False),
    "timm-resnest101e": dict(block="resnest", layers=(3, 4, 23, 3),
                             stem="deep", stem_width=64, avg_down=True,
                             cardinality=1, base_width=64, radix=2,
                             avd_first=False),
    "timm-resnest200e": dict(block="resnest", layers=(3, 24, 36, 3),
                             stem="deep", stem_width=64, avg_down=True,
                             cardinality=1, base_width=64, radix=2,
                             avd_first=False),
    "timm-resnest269e": dict(block="resnest", layers=(3, 30, 48, 8),
                             stem="deep", stem_width=64, avg_down=True,
                             cardinality=1, base_width=64, radix=2,
                             avd_first=False),
    "timm-resnest50d_4s2x40d": dict(block="resnest", layers=(3, 4, 6, 3),
                                    stem="deep", stem_width=32, avg_down=True,
                                    cardinality=2, base_width=40, radix=4,
                                    avd_first=True),
    "timm-resnest50d_1s4x24d": dict(block="resnest", layers=(3, 4, 6, 3),
                                    stem="deep", stem_width=32, avg_down=True,
                                    cardinality=4, base_width=24, radix=1,
                                    avd_first=True),
    "timm-res2net50_26w_4s": dict(block="res2net", layers=(3, 4, 6, 3),
                                  base_width=26, scale=4),
    "timm-res2net101_26w_4s": dict(block="res2net", layers=(3, 4, 23, 3),
                                   base_width=26, scale=4),
    "timm-res2net50_26w_6s": dict(block="res2net", layers=(3, 4, 6, 3),
                                  base_width=26, scale=6),
    "timm-res2net50_26w_8s": dict(block="res2net", layers=(3, 4, 6, 3),
                                  base_width=26, scale=8),
    "timm-res2net50_48w_2s": dict(block="res2net", layers=(3, 4, 6, 3),
                                  base_width=48, scale=2),
    "timm-res2net50_14w_8s": dict(block="res2net", layers=(3, 4, 6, 3),
                                  base_width=14, scale=8),
    "timm-res2next50": dict(block="res2net", layers=(3, 4, 6, 3),
                            base_width=4, cardinality=8, scale=4),
    "timm-skresnet18": dict(block="skbasic", layers=(2, 2, 2, 2)),
    "timm-skresnet34": dict(block="skbasic", layers=(3, 4, 6, 3)),
    "timm-skresnext50_32x4d": dict(block="skbottleneck", layers=(3, 4, 6, 3),
                                   cardinality=32, base_width=4),
}


class TimmResNetEncoder(nn.Module):
    """timm-style ResNet trunk serving ResNeSt / Res2Net / SKNet
    (stages per the reference get_stages: stem / pool+layer1 / layer2-4)."""

    arch: str = "timm-resnest50d"
    output_stride: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        if self.output_stride != 32:
            raise ValueError(f"{self.arch} encoder does not support dilated mode")
        cfg = _TIMM_RESNET_CFG[self.arch]
        features = [x]
        if cfg.get("stem") == "deep":
            sw = cfg["stem_width"]
            y = conv(sw, 3, 2, 1, use_bias=False, name="conv1_0")(x)
            y = BatchNorm(sw, name="conv1_1")(y, train)
            y = nn.relu(y)
            y = conv(sw, 3, 1, 1, use_bias=False, name="conv1_3")(y)
            y = BatchNorm(sw, name="conv1_4")(y, train)
            y = nn.relu(y)
            y = conv(sw * 2, 3, 1, 1, use_bias=False, name="conv1_6")(y)
            stem_ch = sw * 2
        else:
            y = conv(64, 7, 2, 3, use_bias=False, name="conv1")(x)
            stem_ch = 64
        y = BatchNorm(stem_ch, name="bn1")(y, train)
        y = nn.relu(y)
        features.append(y)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        block = cfg["block"]
        expansion = 1 if block == "skbasic" else 4
        planes = 64
        in_ch = stem_ch
        for li, n in enumerate(cfg["layers"], start=1):
            stride = 1 if li == 1 else 2
            for bi in range(n):
                s = stride if bi == 0 else 1
                needs_ds = bi == 0 and (s != 1 or in_ch != planes * expansion)
                name = f"layer{li}_{bi}"
                if block == "resnest":
                    y = ResNestBottleneck(
                        planes=planes, stride=s, downsample=needs_ds,
                        avg_down=cfg["avg_down"],
                        cardinality=cfg["cardinality"],
                        base_width=cfg["base_width"], radix=cfg["radix"],
                        avd_first=cfg["avd_first"], name=name,
                    )(y, train)
                elif block == "res2net":
                    y = Bottle2neck(
                        planes=planes, stride=s, downsample=needs_ds,
                        cardinality=cfg.get("cardinality", 1),
                        base_width=cfg["base_width"], scale=cfg["scale"],
                        name=name,
                    )(y, train)
                elif block == "skbasic":
                    y = SelectiveKernelBasic(
                        planes=planes, stride=s, downsample=needs_ds,
                        name=name,
                    )(y, train)
                else:
                    y = SelectiveKernelBottleneck(
                        planes=planes, stride=s, downsample=needs_ds,
                        cardinality=cfg["cardinality"],
                        base_width=cfg["base_width"], name=name,
                    )(y, train)
                in_ch = planes * expansion
            features.append(y)
            planes *= 2
        return features


# ---------------------------------------------------------------------------
# RegNet X/Y (reference: timm_regnet.py; timm regnet.py width schedule)
# ---------------------------------------------------------------------------

_REGNET_CFG = {
    # name -> (w0, wa, wm, group_w, depth, se_ratio)
    "timm-regnetx_002": (24, 36.44, 2.49, 8, 13, 0.0),
    "timm-regnetx_004": (24, 24.48, 2.54, 16, 22, 0.0),
    "timm-regnetx_006": (48, 36.97, 2.24, 24, 16, 0.0),
    "timm-regnetx_008": (56, 35.73, 2.28, 16, 16, 0.0),
    "timm-regnetx_016": (80, 34.01, 2.25, 24, 18, 0.0),
    "timm-regnetx_032": (88, 26.31, 2.25, 48, 25, 0.0),
    "timm-regnetx_040": (96, 38.65, 2.43, 40, 23, 0.0),
    "timm-regnetx_064": (184, 60.83, 2.07, 56, 17, 0.0),
    "timm-regnetx_080": (80, 49.56, 2.88, 120, 23, 0.0),
    "timm-regnetx_120": (168, 73.36, 2.37, 112, 19, 0.0),
    "timm-regnetx_160": (216, 55.59, 2.1, 128, 22, 0.0),
    "timm-regnetx_320": (320, 69.86, 2.0, 168, 23, 0.0),
    "timm-regnety_002": (24, 36.44, 2.49, 8, 13, 0.25),
    "timm-regnety_004": (48, 27.89, 2.09, 8, 16, 0.25),
    "timm-regnety_006": (48, 32.54, 2.32, 16, 15, 0.25),
    "timm-regnety_008": (56, 38.84, 2.4, 16, 14, 0.25),
    "timm-regnety_016": (48, 20.71, 2.65, 24, 27, 0.25),
    "timm-regnety_032": (80, 42.63, 2.66, 24, 21, 0.25),
    "timm-regnety_040": (96, 31.41, 2.24, 64, 22, 0.25),
    "timm-regnety_064": (112, 33.22, 2.27, 72, 25, 0.25),
    "timm-regnety_080": (192, 76.82, 2.19, 56, 17, 0.25),
    "timm-regnety_120": (168, 73.36, 2.37, 112, 19, 0.25),
    "timm-regnety_160": (200, 106.23, 2.48, 112, 18, 0.25),
    "timm-regnety_320": (232, 115.89, 2.53, 232, 20, 0.25),
}


def regnet_stage_params(w0, wa, wm, group_w, depth, q=8):
    """pycls/timm generate_regnet + group-width adjustment."""
    widths_cont = np.arange(depth) * wa + w0
    width_exps = np.round(np.log(widths_cont / w0) / np.log(wm))
    widths = w0 * np.power(wm, width_exps)
    widths = (np.round(widths / q) * q).astype(int)
    stage_widths, stage_depths = np.unique(widths, return_counts=True)
    # adjust widths for group compatibility (bottle_ratio = 1)
    groups = [min(group_w, w) for w in stage_widths]
    stage_widths = [int(round(w / g) * g) for w, g in zip(stage_widths, groups)]
    return list(stage_widths), [int(d) for d in stage_depths], groups


class RegNetBottleneck(nn.Module):
    out_ch: int
    stride: int = 1
    group_width: int = 8
    se_ratio: float = 0.0
    downsample: bool = False

    @nn.compact
    def __call__(self, x, train=False):
        in_ch = x.shape[-1]
        w_b = self.out_ch  # bottle_ratio = 1.0 for all Reg-X/Y
        groups = w_b // self.group_width
        y = conv(w_b, 1, 1, 0, use_bias=False, name="conv1_conv")(x)
        y = BatchNorm(w_b, name="conv1_bn")(y, train)
        y = nn.relu(y)
        y = conv(w_b, 3, self.stride, 1, use_bias=False, groups=groups,
                 name="conv2_conv")(y)
        y = BatchNorm(w_b, name="conv2_bn")(y, train)
        y = nn.relu(y)
        if self.se_ratio > 0:
            rd = int(round(in_ch * self.se_ratio))
            s = y.mean(axis=(1, 2), keepdims=True)
            s = conv(rd, 1, use_bias=True, name="se_fc1")(s)
            s = nn.relu(s)
            s = conv(w_b, 1, use_bias=True, name="se_fc2")(s)
            y = y * jax.nn.sigmoid(s)
        y = conv(self.out_ch, 1, 1, 0, use_bias=False, name="conv3_conv")(y)
        y = BatchNorm(self.out_ch, name="conv3_bn")(y, train)
        identity = x
        if self.downsample:
            identity = conv(self.out_ch, 1, self.stride, 0, use_bias=False,
                            name="downsample_conv")(x)
            identity = BatchNorm(self.out_ch, name="downsample_bn")(
                identity, train)
        return nn.relu(y + identity)


class RegNetEncoder(nn.Module):
    arch: str = "timm-regnetx_002"
    output_stride: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        if self.output_stride != 32:
            raise ValueError("RegNet encoder does not support dilated mode here")
        w0, wa, wm, group_w, depth, se_ratio = _REGNET_CFG[self.arch]
        widths, depths, groups = regnet_stage_params(w0, wa, wm, group_w, depth)
        features = [x]
        y = conv(32, 3, 2, 1, use_bias=False, name="stem_conv")(x)
        y = BatchNorm(32, name="stem_bn")(y, train)
        y = nn.relu(y)
        features.append(y)
        in_ch = 32
        for si, (w, d, g) in enumerate(zip(widths, depths, groups), start=1):
            for bi in range(d):
                stride = 2 if bi == 0 else 1
                y = RegNetBottleneck(
                    out_ch=w, stride=stride, group_width=g, se_ratio=se_ratio,
                    downsample=bi == 0 and (stride != 1 or in_ch != w),
                    name=f"s{si}_b{bi + 1}",
                )(y, train)
                in_ch = w
            features.append(y)
        return features


def regnet_out_channels(arch: str) -> Tuple[int, ...]:
    w0, wa, wm, group_w, depth, _ = _REGNET_CFG[arch]
    widths, _, _ = regnet_stage_params(w0, wa, wm, group_w, depth)
    return (3, 32) + tuple(widths)


# ---------------------------------------------------------------------------
# GERNet (reference: timm_gernet.py; timm ByobNet basic/bottle blocks)
# ---------------------------------------------------------------------------

_GERNET_CFG = {
    # blocks: (type, depth, channels, stride, group_size(0=1 group,
    # 1=depthwise), bottle_ratio)
    "timm-gernet_s": dict(
        blocks=(
            ("basic", 1, 48, 2, 0, 1.0),
            ("basic", 3, 48, 2, 0, 1.0),
            ("bottle", 7, 384, 2, 0, 0.25),
            ("bottle", 2, 560, 2, 1, 3.0),
            ("bottle", 1, 256, 1, 1, 3.0),
        ),
        stem_chs=13, num_features=1920,
        out_channels=(3, 13, 48, 48, 384, 1920),
    ),
    "timm-gernet_m": dict(
        blocks=(
            ("basic", 1, 128, 2, 0, 1.0),
            ("basic", 2, 192, 2, 0, 1.0),
            ("bottle", 6, 640, 2, 0, 0.25),
            ("bottle", 4, 640, 2, 1, 3.0),
            ("bottle", 1, 640, 1, 1, 3.0),
        ),
        stem_chs=32, num_features=2560,
        out_channels=(3, 32, 128, 192, 640, 2560),
    ),
    "timm-gernet_l": dict(
        blocks=(
            ("basic", 1, 128, 2, 0, 1.0),
            ("basic", 2, 192, 2, 0, 1.0),
            ("bottle", 6, 640, 2, 0, 0.25),
            ("bottle", 5, 640, 2, 1, 3.0),
            ("bottle", 4, 640, 1, 1, 3.0),
        ),
        stem_chs=32, num_features=2560,
        out_channels=(3, 32, 128, 192, 640, 2560),
    ),
}


class ByobBlock(nn.Module):
    kind: str  # basic | bottle
    out_ch: int
    stride: int = 1
    group_size: int = 0
    bottle_ratio: float = 1.0

    @nn.compact
    def __call__(self, x, train=False):
        in_ch = x.shape[-1]
        mid = make_divisible(self.out_ch * self.bottle_ratio)
        groups = 1 if self.group_size == 0 else mid // self.group_size
        if self.kind == "basic":
            y = conv(mid, 3, self.stride, 1, use_bias=False, name="conv1_conv")(x)
            y = BatchNorm(mid, name="conv1_bn")(y, train)
            y = nn.relu(y)
            y = conv(self.out_ch, 3, 1, 1, use_bias=False, groups=groups,
                     name="conv2_conv")(y)
            y = BatchNorm(self.out_ch, name="conv2_bn")(y, train)
        else:
            y = conv(mid, 1, 1, 0, use_bias=False, name="conv1_conv")(x)
            y = BatchNorm(mid, name="conv1_bn")(y, train)
            y = nn.relu(y)
            y = conv(mid, 3, self.stride, 1, use_bias=False, groups=groups,
                     name="conv2_conv")(y)
            y = BatchNorm(mid, name="conv2_bn")(y, train)
            y = nn.relu(y)
            y = conv(self.out_ch, 1, 1, 0, use_bias=False, name="conv3_conv")(y)
            y = BatchNorm(self.out_ch, name="conv3_bn")(y, train)
        identity = x
        if self.stride != 1 or in_ch != self.out_ch:
            identity = conv(self.out_ch, 1, self.stride, 0, use_bias=False,
                            name="shortcut_conv")(x)
            identity = BatchNorm(self.out_ch, name="shortcut_bn")(
                identity, train)
        return nn.relu(y + identity)


class GERNetEncoder(nn.Module):
    """Stages: stem / stages 0,1,2 / (stages 3,4 + final_conv)
    (reference: timm_gernet.py get_stages)."""

    arch: str = "timm-gernet_s"
    output_stride: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        if self.output_stride != 32:
            raise ValueError("GERNet encoder does not support dilated mode")
        cfg = _GERNET_CFG[self.arch]
        features = [x]
        y = conv(cfg["stem_chs"], 3, 2, 1, use_bias=False, name="stem_conv")(x)
        y = BatchNorm(cfg["stem_chs"], name="stem_bn")(y, train)
        y = nn.relu(y)
        features.append(y)
        for si, (kind, d, c, s, gs, br) in enumerate(cfg["blocks"]):
            for bi in range(d):
                y = ByobBlock(kind, c, s if bi == 0 else 1, gs, br,
                              name=f"stages_{si}_{bi}")(y, train)
            if si < 3:
                features.append(y)
        y = conv(cfg["num_features"], 1, 1, 0, use_bias=False,
                 name="final_conv")(y)
        y = BatchNorm(cfg["num_features"], name="final_bn")(y, train)
        y = nn.relu(y)
        features.append(y)
        return features


# ---------------------------------------------------------------------------
# MobileNetV3 (reference: timm_mobilenetv3.py; tf_ SAME-padding variants)
# ---------------------------------------------------------------------------


def hard_sigmoid(x):
    return nn.relu6(x + 3.0) / 6.0


def hard_swish(x):
    return x * hard_sigmoid(x)


def _sconv(features, kernel, stride=1, groups=1, name=None):
    """TF SAME-padding conv (the tf_ checkpoints' asymmetric padding)."""
    return nn.Conv(features=features, kernel_size=(kernel, kernel),
                   strides=(stride, stride), padding="SAME", use_bias=False,
                   feature_group_count=groups, name=name)


class MnV3Block(nn.Module):
    """timm InvertedResidual / DepthwiseSeparable for MobileNetV3."""

    out_ch: int
    kernel: int = 3
    stride: int = 1
    exp_ratio: float = 1.0
    se: bool = False
    act: str = "relu"  # relu | hswish
    depthwise_sep: bool = False  # 'ds' block: no expansion conv

    @nn.compact
    def __call__(self, x, train=False):
        act = nn.relu if self.act == "relu" else hard_swish
        in_ch = x.shape[-1]
        y = x
        if self.depthwise_sep:
            mid = in_ch
        else:
            mid = make_divisible(in_ch * self.exp_ratio)
            y = _sconv(mid, 1, name="conv_pw")(y)
            y = BatchNorm(mid, eps=1e-3, name="bn1")(y, train)
            y = act(y)
        y = _sconv(mid, self.kernel, self.stride, groups=mid, name="conv_dw")(y)
        y = BatchNorm(mid, eps=1e-3,
                      name="bn2" if not self.depthwise_sep else "bn1")(y, train)
        y = act(y)
        if self.se:
            rd = make_divisible(mid * 0.25)
            s = y.mean(axis=(1, 2), keepdims=True)
            s = nn.Conv(rd, (1, 1), padding="SAME", name="se_conv_reduce")(s)
            s = nn.relu(s)
            s = nn.Conv(mid, (1, 1), padding="SAME", name="se_conv_expand")(s)
            y = y * hard_sigmoid(s)
        y = _sconv(self.out_ch, 1,
                   name="conv_pwl" if not self.depthwise_sep else "conv_pw")(y)
        y = BatchNorm(self.out_ch, eps=1e-3,
                      name="bn3" if not self.depthwise_sep else "bn2")(y, train)
        if self.stride == 1 and in_ch == self.out_ch:
            y = y + x
        return y


# block tables: (kind, kernel, stride, exp, ch, se, act) per block; one tuple
# list per timm `blocks` stage. kind: ds | ir | cn.
_MNV3_LARGE = [
    [("ds", 3, 1, 1.0, 16, False, "relu")],
    [("ir", 3, 2, 4.0, 24, False, "relu"), ("ir", 3, 1, 3.0, 24, False, "relu")],
    [("ir", 5, 2, 3.0, 40, True, "relu"),
     ("ir", 5, 1, 3.0, 40, True, "relu"),
     ("ir", 5, 1, 3.0, 40, True, "relu")],
    [("ir", 3, 2, 6.0, 80, False, "hswish"),
     ("ir", 3, 1, 2.5, 80, False, "hswish"),
     ("ir", 3, 1, 2.3, 80, False, "hswish"),
     ("ir", 3, 1, 2.3, 80, False, "hswish")],
    [("ir", 3, 1, 6.0, 112, True, "hswish"),
     ("ir", 3, 1, 6.0, 112, True, "hswish")],
    [("ir", 5, 2, 6.0, 160, True, "hswish"),
     ("ir", 5, 1, 6.0, 160, True, "hswish"),
     ("ir", 5, 1, 6.0, 160, True, "hswish")],
    [("cn", 1, 1, 1.0, 960, False, "hswish")],
]
_MNV3_SMALL = [
    [("ds", 3, 2, 1.0, 16, True, "relu")],
    [("ir", 3, 2, 4.5, 24, False, "relu"),
     ("ir", 3, 1, 3.67, 24, False, "relu")],
    [("ir", 5, 2, 4.0, 40, True, "hswish"),
     ("ir", 5, 1, 6.0, 40, True, "hswish"),
     ("ir", 5, 1, 6.0, 40, True, "hswish")],
    [("ir", 5, 1, 3.0, 48, True, "hswish"),
     ("ir", 5, 1, 3.0, 48, True, "hswish")],
    [("ir", 5, 2, 6.0, 96, True, "hswish"),
     ("ir", 5, 1, 6.0, 96, True, "hswish"),
     ("ir", 5, 1, 6.0, 96, True, "hswish")],
    [("cn", 1, 1, 1.0, 576, False, "hswish")],
]


def _minimalize(table):
    """minimal_100 variants: all relu, k3, no SE (timm _gen_mobilenet_v3)."""
    out = []
    for stage in table:
        out.append([("ds" if k == "ds" else k, 3 if k != "cn" else 1, s, e, c,
                     False, "relu") for (k, _, s, e, c, _, _) in stage])
    return out


class MobileNetV3Encoder(nn.Module):
    mode: str = "large"  # large | small
    width_mult: float = 1.0
    minimal: bool = False
    output_stride: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        if self.output_stride != 32:
            raise ValueError("MobileNetV3 encoder does not support dilated mode")
        table = _MNV3_LARGE if self.mode == "large" else _MNV3_SMALL
        if self.minimal:
            table = _minimalize(table)
        stem_act = "relu" if self.minimal else "hswish"
        act = nn.relu if stem_act == "relu" else hard_swish
        stem_ch = make_divisible(16 * self.width_mult)
        features = [x]
        y = _sconv(stem_ch, 3, 2, name="conv_stem")(x)
        y = BatchNorm(stem_ch, eps=1e-3, name="bn1")(y, train)
        y = act(y)
        # smp stage boundaries (reference timm_mobilenetv3.py get_stages):
        # large: [stem+b0] [b1] [b2] [b3:5] [b5:]; small: [stem] [b0] [b1]
        # [b2:4] [b4:]
        if self.mode == "small":
            features.append(y)
        for si, stage in enumerate(table):
            for bi, (kind, k, s, e, c, se, a) in enumerate(stage):
                ch = make_divisible(c * self.width_mult)
                if kind == "cn":
                    y = _sconv(ch, k, s, name=f"blocks_{si}_{bi}_conv")(y)
                    y = BatchNorm(ch, eps=1e-3,
                                  name=f"blocks_{si}_{bi}_bn1")(y, train)
                    y = (nn.relu if a == "relu" else hard_swish)(y)
                else:
                    y = MnV3Block(
                        out_ch=ch, kernel=k, stride=s, exp_ratio=e, se=se,
                        act=a, depthwise_sep=kind == "ds",
                        name=f"blocks_{si}_{bi}",
                    )(y, train)
            if (self.mode == "large" and si in (0, 1, 2, 4)) or (
                    self.mode == "small" and si in (0, 1, 3)):
                features.append(y)
        features.append(y)
        return features[:6]


def mnv3_out_channels(mode: str, width_mult: float) -> Tuple[int, ...]:
    base = [16, 16, 24, 48, 576] if mode == "small" else [16, 24, 40, 112, 960]
    # reference uses ceil-based rounding (timm_mobilenetv3.py _make_divisible)
    return (3,) + tuple(int(np.ceil(c * width_mult / 8) * 8) for c in base)


# ---------------------------------------------------------------------------
# registration
# ---------------------------------------------------------------------------

_TIMM_RESNET_OUT = {
    name: (3,
           128 if cfg.get("stem_width", 64) == 64 and cfg.get("stem") == "deep"
           else 64,
           64 if cfg["block"] == "skbasic" else 256,
           128 if cfg["block"] == "skbasic" else 512,
           256 if cfg["block"] == "skbasic" else 1024,
           512 if cfg["block"] == "skbasic" else 2048)
    for name, cfg in _TIMM_RESNET_CFG.items()
}


def register(registry: dict) -> None:
    registry["inceptionv4"] = (
        lambda output_stride=32: InceptionV4Encoder(output_stride=output_stride),
        (3, 64, 192, 384, 1024, 1536), False,
    )
    registry["inceptionresnetv2"] = (
        lambda output_stride=32: InceptionResNetV2Encoder(
            output_stride=output_stride),
        (3, 64, 192, 320, 1088, 1536), False,
    )
    for name in _TIMM_RESNET_CFG:
        registry[name] = (
            (lambda n: (lambda output_stride=32: TimmResNetEncoder(
                arch=n, output_stride=output_stride)))(name),
            _TIMM_RESNET_OUT[name], False,
        )
    for name in _REGNET_CFG:
        registry[name] = (
            (lambda n: (lambda output_stride=32: RegNetEncoder(
                arch=n, output_stride=output_stride)))(name),
            regnet_out_channels(name), False,
        )
    for name, cfg in _GERNET_CFG.items():
        registry[name] = (
            (lambda n: (lambda output_stride=32: GERNetEncoder(
                arch=n, output_stride=output_stride)))(name),
            cfg["out_channels"], False,
        )
    for name, mode, mult, minimal in (
        ("timm-mobilenetv3_large_075", "large", 0.75, False),
        ("timm-mobilenetv3_large_100", "large", 1.0, False),
        ("timm-mobilenetv3_large_minimal_100", "large", 1.0, True),
        ("timm-mobilenetv3_small_075", "small", 0.75, False),
        ("timm-mobilenetv3_small_100", "small", 1.0, False),
        ("timm-mobilenetv3_small_minimal_100", "small", 1.0, True),
    ):
        registry[name] = (
            (lambda m, w, mi: (lambda output_stride=32: MobileNetV3Encoder(
                mode=m, width_mult=w, minimal=mi,
                output_stride=output_stride)))(mode, mult, minimal),
            mnv3_out_channels(mode, mult), False,
        )
