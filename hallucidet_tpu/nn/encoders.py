"""Encoder-family zoo + registry (the smp `encoders/` surface).

Rebuild of the reference's vendored encoder families (reference:
src/segmentation_models/encoders/: resnet.py (incl. resnext), vgg.py,
mobilenet.py, densenet.py, efficientnet.py, mix_transformer.py, plus the
registry/get_encoder machinery of encoders/__init__.py:26-85 and the
EncoderMixin behaviors of _base.py: staged features, make_dilated via
output_stride, set_in_channels via patch_first_conv).

Every encoder returns the smp staged-feature list (6 entries, deepest last).
ResNet-family lists start with the input tensor; VGG starts at full-res conv
features; MiT pads a zero-channel dummy at stage 1 — all exactly as the
reference slices them, so decoder channel wiring matches checkpoint-for-
checkpoint.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from hallucidet_tpu.nn.layers import BatchNorm, conv
from hallucidet_tpu.nn.resnet import ENCODER_OUT_CHANNELS, ResNet

IMAGENET_PREPROCESS = {"mean": (0.485, 0.456, 0.406), "std": (0.229, 0.224, 0.225)}


def preprocess_input(x, mean=None, std=None, input_space="RGB", input_range=(0, 1)):
    """(reference: encoders/_preprocessing.py:4-21)"""
    if input_space == "BGR":
        x = x[..., ::-1]
    if input_range is not None and x.max() > 1 and input_range[1] == 1:
        x = x / 255.0
    if mean is not None:
        x = x - jnp.asarray(mean)
    if std is not None:
        x = x / jnp.asarray(std)
    return x


# ---------------------------------------------------------------------------
# VGG (reference: encoders/vgg.py) — stages split at MaxPool boundaries,
# each stage *starts* with the previous boundary's pool.
# ---------------------------------------------------------------------------

_VGG_CFG = {
    "vgg11": [64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"],
    "vgg13": [64, 64, "M", 128, 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"],
    "vgg16": [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M",
              512, 512, 512, "M"],
    "vgg19": [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
              512, 512, 512, 512, "M", 512, 512, 512, 512, "M"],
}


class VGGEncoder(nn.Module):
    cfg_name: str = "vgg16"
    batch_norm: bool = False
    output_stride: int = 32  # dilation unsupported (pooling), like the reference

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        if self.output_stride != 32:
            raise ValueError("VGG encoders do not support dilated mode")
        cfg = _VGG_CFG[self.cfg_name.replace("_bn", "")]
        features = []
        idx = 0
        for item in cfg:
            if item == "M":
                features.append(x)
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = conv(item, 3, 1, 1, name=f"conv_{idx}")(x)
                if self.batch_norm:
                    x = BatchNorm(item, name=f"bn_{idx}")(x, train)
                x = nn.relu(x)
                idx += 1
        features.append(x)
        return features


# ---------------------------------------------------------------------------
# MobileNetV2 (reference: encoders/mobilenet.py; stages [:2],[2:4],[4:7],
# [7:14],[14:])
# ---------------------------------------------------------------------------


class InvertedResidual(nn.Module):
    out_ch: int
    stride: int
    expand: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        hidden = in_ch * self.expand
        y = x
        if self.expand != 1:
            y = conv(hidden, 1, use_bias=False, name="expand")(y)
            y = BatchNorm(hidden, name="expand_bn")(y, train)
            y = nn.relu6(y)
        y = conv(
            hidden, 3, self.stride, 1, use_bias=False, groups=hidden, name="dw"
        )(y)
        y = BatchNorm(hidden, name="dw_bn")(y, train)
        y = nn.relu6(y)
        y = conv(self.out_ch, 1, use_bias=False, name="project")(y)
        y = BatchNorm(self.out_ch, name="project_bn")(y, train)
        if self.stride == 1 and in_ch == self.out_ch:
            y = y + x
        return y


_MBV2_SETTING = [
    # t, c, n, s
    (1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
    (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1),
]


class MobileNetV2Encoder(nn.Module):
    output_stride: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        features = [x]
        # stem = features[0]
        y = conv(32, 3, 2, 1, use_bias=False, name="stem")(x)
        y = BatchNorm(32, name="stem_bn")(y, train)
        y = nn.relu6(y)
        block_idx = 1
        # smp stage boundaries in torchvision feature indices: 2, 4, 7, 14, 18
        boundaries = {2, 4, 7, 14}
        feat_idx = 1
        for t, c, n, s in _MBV2_SETTING:
            for i in range(n):
                if feat_idx in boundaries:
                    features.append(y)
                y = InvertedResidual(
                    c, s if i == 0 else 1, t, name=f"block_{block_idx}"
                )(y, train)
                block_idx += 1
                feat_idx += 1
        if feat_idx in boundaries:
            features.append(y)
        # final 1x1 conv to 1280 (torchvision features[18])
        y = conv(1280, 1, use_bias=False, name="head")(y)
        y = BatchNorm(1280, name="head_bn")(y, train)
        y = nn.relu6(y)
        features.append(y)
        return features


# ---------------------------------------------------------------------------
# DenseNet (reference: encoders/densenet.py; transitions yield pre-pool skips)
# ---------------------------------------------------------------------------

_DENSENET_BLOCKS = {
    "densenet121": (6, 12, 24, 16),
    "densenet169": (6, 12, 32, 32),
    "densenet201": (6, 12, 48, 32),
    "densenet161": (6, 12, 36, 24),  # growth 48, init 96
}


class DenseLayer(nn.Module):
    growth: int = 32
    bn_size: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = BatchNorm(x.shape[-1], name="norm1")(x, train)
        y = nn.relu(y)
        y = conv(self.bn_size * self.growth, 1, use_bias=False, name="conv1")(y)
        y = BatchNorm(y.shape[-1], name="norm2")(y, train)
        y = nn.relu(y)
        y = conv(self.growth, 3, 1, 1, use_bias=False, name="conv2")(y)
        return jnp.concatenate([x, y], axis=-1)


class DenseNetEncoder(nn.Module):
    arch: str = "densenet121"
    growth: int = 32
    init_features: int = 64
    output_stride: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        if self.output_stride != 32:
            raise ValueError(
                "DenseNet encoders do not support dilated mode due to pooling"
            )
        blocks = _DENSENET_BLOCKS[self.arch]
        features = [x]
        y = conv(self.init_features, 7, 2, 3, use_bias=False, name="conv0")(x)
        y = BatchNorm(self.init_features, name="norm0")(y, train)
        y = nn.relu(y)
        features.append(y)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for bi, n_layers in enumerate(blocks, start=1):
            for li in range(n_layers):
                y = DenseLayer(self.growth, name=f"db{bi}_l{li}")(y, train)
            if bi < len(blocks):
                # transition: norm+relu (skip taken here) -> conv1x1/2 -> pool
                y = BatchNorm(y.shape[-1], name=f"trans{bi}_norm")(y, train)
                y = nn.relu(y)
                features.append(y)  # pre-downsample skip
                y = conv(y.shape[-1] // 2, 1, use_bias=False, name=f"trans{bi}_conv")(y)
                y = nn.avg_pool(y, (2, 2), strides=(2, 2))
            else:
                y = BatchNorm(y.shape[-1], name="norm5")(y, train)
                features.append(y)
        return features


# ---------------------------------------------------------------------------
# EfficientNet B0-B2 (reference: encoders/efficientnet.py; stage_idxs split)
# ---------------------------------------------------------------------------

_EFFNET_BASE = [
    # expand, channels, repeats, stride, kernel
    (1, 16, 1, 1, 3), (6, 24, 2, 2, 3), (6, 40, 2, 2, 5), (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5), (6, 192, 4, 2, 5), (6, 320, 1, 1, 3),
]
_EFFNET_SCALE = {
    # width, depth, smp stage_idxs (feature collected before these block
    # idxs) — reference: encoders/efficientnet.py:106-176
    "efficientnet-b0": (1.0, 1.0, (3, 5, 9, 16)),
    "efficientnet-b1": (1.0, 1.1, (5, 8, 16, 23)),
    "efficientnet-b2": (1.1, 1.2, (5, 8, 16, 23)),
    "efficientnet-b3": (1.2, 1.4, (5, 8, 18, 26)),
    "efficientnet-b4": (1.4, 1.8, (6, 10, 22, 32)),
    "efficientnet-b5": (1.6, 2.2, (8, 13, 27, 39)),
    "efficientnet-b6": (1.8, 2.6, (9, 15, 31, 45)),
    "efficientnet-b7": (2.0, 3.1, (11, 18, 38, 55)),
}


def _round_filters(ch, width):
    ch *= width
    new = max(8, int(ch + 4) // 8 * 8)
    if new < 0.9 * ch:
        new += 8
    return int(new)


def _round_repeats(r, depth):
    return int(math.ceil(depth * r))


class MBConv(nn.Module):
    out_ch: int
    stride: int
    expand: int
    kernel: int = 3
    se_ratio: float = 0.25

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        hidden = in_ch * self.expand
        y = x
        if self.expand != 1:
            y = conv(hidden, 1, use_bias=False, name="expand")(y)
            y = BatchNorm(hidden, name="expand_bn")(y, train)
            y = nn.silu(y)
        y = conv(
            hidden, self.kernel, self.stride, self.kernel // 2,
            use_bias=False, groups=hidden, name="dw",
        )(y)
        y = BatchNorm(hidden, name="dw_bn")(y, train)
        y = nn.silu(y)
        # squeeze-excite on input-channel basis
        se_ch = max(1, int(in_ch * self.se_ratio))
        s = jnp.mean(y, axis=(1, 2), keepdims=True)
        s = conv(se_ch, 1, name="se_reduce")(s)
        s = nn.silu(s)
        s = conv(hidden, 1, name="se_expand")(s)
        y = y * jax.nn.sigmoid(s)
        y = conv(self.out_ch, 1, use_bias=False, name="project")(y)
        y = BatchNorm(self.out_ch, name="project_bn")(y, train)
        if self.stride == 1 and in_ch == self.out_ch:
            y = y + x
        return y


class EfficientNetEncoder(nn.Module):
    arch: str = "efficientnet-b0"
    output_stride: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        width, depth, stage_idxs = _EFFNET_SCALE[self.arch]
        features = [x]
        stem_ch = _round_filters(32, width)
        y = conv(stem_ch, 3, 2, 1, use_bias=False, name="stem")(x)
        y = BatchNorm(stem_ch, name="stem_bn")(y, train)
        y = nn.silu(y)
        features.append(y)
        bi = 0
        for expand, ch, reps, stride, kernel in _EFFNET_BASE:
            out_ch = _round_filters(ch, width)
            for i in range(_round_repeats(reps, depth)):
                if bi in stage_idxs[:-1]:  # smp stage boundary
                    features.append(y)
                s = stride if i == 0 else 1
                y = MBConv(out_ch, s, expand, kernel, name=f"block_{bi}")(y, train)
                bi += 1
        features.append(y)
        return features[:6]


# ---------------------------------------------------------------------------
# Mix Vision Transformer (SegFormer MiT; reference: encoders/mix_transformer.py)
# ---------------------------------------------------------------------------

_MIT_CFG = {
    "mit_b0": dict(dims=(32, 64, 160, 256), depths=(2, 2, 2, 2)),
    "mit_b1": dict(dims=(64, 128, 320, 512), depths=(2, 2, 2, 2)),
    "mit_b2": dict(dims=(64, 128, 320, 512), depths=(3, 4, 6, 3)),
    "mit_b3": dict(dims=(64, 128, 320, 512), depths=(3, 4, 18, 3)),
    "mit_b4": dict(dims=(64, 128, 320, 512), depths=(3, 8, 27, 3)),
    "mit_b5": dict(dims=(64, 128, 320, 512), depths=(3, 6, 40, 3)),
}
_MIT_HEADS = (1, 2, 5, 8)
_MIT_SR = (8, 4, 2, 1)


class EfficientSelfAttention(nn.Module):
    dim: int
    heads: int
    sr_ratio: int

    @nn.compact
    def __call__(self, x, hw):
        h, w = hw
        b, n, c = x.shape
        q = nn.Dense(self.dim, name="q")(x).reshape(
            b, n, self.heads, c // self.heads
        )
        kv_in = x
        if self.sr_ratio > 1:
            spatial = x.reshape(b, h, w, c)
            spatial = conv(
                self.dim, self.sr_ratio, self.sr_ratio, 0, name="sr"
            )(spatial)
            kv_in = nn.LayerNorm(name="sr_norm")(
                spatial.reshape(b, -1, c)
            )
        k = nn.Dense(self.dim, name="k")(kv_in).reshape(
            b, -1, self.heads, c // self.heads
        )
        v = nn.Dense(self.dim, name="v")(kv_in).reshape(
            b, -1, self.heads, c // self.heads
        )
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) / math.sqrt(c // self.heads)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, n, c)
        return nn.Dense(self.dim, name="proj")(out)


class MixFFN(nn.Module):
    dim: int
    ratio: int = 4

    @nn.compact
    def __call__(self, x, hw):
        h, w = hw
        b, n, c = x.shape
        hidden = self.dim * self.ratio
        y = nn.Dense(hidden, name="fc1")(x)
        # depthwise 3x3 on the spatial layout (the "Mix" part)
        y = y.reshape(b, h, w, hidden)
        y = conv(hidden, 3, 1, 1, groups=hidden, name="dwconv")(y)
        y = y.reshape(b, n, hidden)
        y = nn.gelu(y)
        return nn.Dense(self.dim, name="fc2")(y)


class MiTBlock(nn.Module):
    dim: int
    heads: int
    sr_ratio: int

    @nn.compact
    def __call__(self, x, hw):
        y = nn.LayerNorm(name="norm1")(x)
        x = x + EfficientSelfAttention(
            self.dim, self.heads, self.sr_ratio, name="attn"
        )(y, hw)
        y = nn.LayerNorm(name="norm2")(x)
        x = x + MixFFN(self.dim, name="mlp")(y, hw)
        return x


class MixVisionTransformerEncoder(nn.Module):
    arch: str = "mit_b0"
    output_stride: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        cfg = _MIT_CFG[self.arch]
        b, h0, w0, _ = x.shape
        # smp pads a zero-channel dummy for the stride-2 stage
        dummy = jnp.zeros((b, h0 // 2, w0 // 2, 0), x.dtype)
        features = [x, dummy]
        y = x
        for si, (dim, depth) in enumerate(zip(cfg["dims"], cfg["depths"])):
            patch = 7 if si == 0 else 3
            stride = 4 if si == 0 else 2
            y = conv(dim, patch, stride, patch // 2, name=f"patch_embed{si}")(y)
            bh, bw = y.shape[1:3]
            y = nn.LayerNorm(name=f"embed_norm{si}")(y.reshape(b, -1, dim))
            for bi in range(depth):
                y = MiTBlock(
                    dim, _MIT_HEADS[si], _MIT_SR[si], name=f"stage{si}_block{bi}"
                )(y, (bh, bw))
            y = nn.LayerNorm(name=f"stage_norm{si}")(y)
            y = y.reshape(b, bh, bw, dim)
            features.append(y)
        return features[:6]


# ---------------------------------------------------------------------------
# registry (reference: encoders/__init__.py:26-85)
# ---------------------------------------------------------------------------

ENCODER_REGISTRY = {
    # name -> (factory, out_channels, needs_center)
    **{
        name: ((lambda n: (lambda output_stride=32: ResNet(
            arch=n, output_stride=output_stride)))(name),
            ENCODER_OUT_CHANNELS[name], False)
        for name in ("resnet18", "resnet34", "resnet50", "resnet101", "resnet152")
    },
    "resnext50_32x4d": (
        lambda output_stride=32: ResNet(
            arch="resnext50_32x4d", output_stride=output_stride
        ),
        (3, 64, 256, 512, 1024, 2048), False,
    ),
    # resnext101 group widths incl. Instagram-WSL 16d/32d/48d (reference:
    # encoders/resnet.py:183-230)
    **{
        name: ((lambda n: (lambda output_stride=32: ResNet(
            arch=n, output_stride=output_stride)))(name),
            (3, 64, 256, 512, 1024, 2048), False)
        for name in (
            "resnext101_32x4d", "resnext101_32x8d", "resnext101_32x16d",
            "resnext101_32x32d", "resnext101_32x48d",
        )
    },
    **{
        name: ((lambda n, bn: (lambda output_stride=32: VGGEncoder(
            cfg_name=n, batch_norm=bn, output_stride=output_stride)))(
                name.replace("_bn", ""), name.endswith("_bn")),
            (64, 128, 256, 512, 512, 512), True)
        for name in ("vgg11", "vgg13", "vgg16", "vgg19",
                     "vgg11_bn", "vgg13_bn", "vgg16_bn", "vgg19_bn")
    },
    "mobilenet_v2": (
        lambda output_stride=32: MobileNetV2Encoder(output_stride=output_stride),
        (3, 16, 24, 32, 96, 1280), False,
    ),
    "densenet121": (
        lambda output_stride=32: DenseNetEncoder(
            arch="densenet121", output_stride=output_stride
        ),
        (3, 64, 256, 512, 1024, 1024), False,
    ),
    "densenet169": (
        lambda output_stride=32: DenseNetEncoder(
            arch="densenet169", output_stride=output_stride
        ),
        (3, 64, 256, 512, 1280, 1664), False,
    ),
    "densenet201": (
        lambda output_stride=32: DenseNetEncoder(
            arch="densenet201", output_stride=output_stride
        ),
        (3, 64, 256, 512, 1792, 1920), False,
    ),
    "densenet161": (
        lambda output_stride=32: DenseNetEncoder(
            arch="densenet161", growth=48, init_features=96,
            output_stride=output_stride
        ),
        (3, 96, 384, 768, 2112, 2208), False,
    ),
    **{
        name: ((lambda n: (lambda output_stride=32: EfficientNetEncoder(
            arch=n, output_stride=output_stride)))(name), chs, False)
        for name, chs in {
            "efficientnet-b0": (3, 32, 24, 40, 112, 320),
            "efficientnet-b1": (3, 32, 24, 40, 112, 320),
            "efficientnet-b2": (3, 32, 24, 48, 120, 352),
            "efficientnet-b3": (3, 40, 32, 48, 136, 384),
            "efficientnet-b4": (3, 48, 32, 56, 160, 448),
            "efficientnet-b5": (3, 48, 40, 64, 176, 512),
            "efficientnet-b6": (3, 56, 40, 72, 200, 576),
            "efficientnet-b7": (3, 64, 48, 80, 224, 640),
        }.items()
    },
    **{
        name: ((lambda n: (lambda output_stride=32:
                           MixVisionTransformerEncoder(
                               arch=n, output_stride=output_stride)))(name),
               (3, 0) + _MIT_CFG[name]["dims"], False)
        for name in _MIT_CFG
    },
}


def get_encoder(name: str, output_stride: int = 32):
    """-> (flax module, out_channels tuple, needs_center). The module's
    __call__(x, train) returns the staged feature list.

    `tu-<name>` (the reference's TimmUniversalEncoder passthrough,
    encoders/__init__.py:47-57) resolves against this native registry: any
    timm model we have a native build for works; others raise."""
    if name.startswith("tu-"):
        base = name[3:]
        for candidate in (base, f"timm-{base}"):
            if candidate in ENCODER_REGISTRY:
                name = candidate
                break
        else:
            raise KeyError(
                f"tu-{base}: no native equivalent of this timm model; "
                f"supported encoders: {sorted(ENCODER_REGISTRY)}"
            )
    if name not in ENCODER_REGISTRY:
        raise KeyError(
            f"Wrong encoder name `{name}`, supported encoders: "
            f"{sorted(ENCODER_REGISTRY)}"
        )
    factory, channels, needs_center = ENCODER_REGISTRY[name]
    return factory(output_stride=output_stride), channels, needs_center


def encoder_names():
    return sorted(ENCODER_REGISTRY)


# ---------------------------------------------------------------------------
# SE-ResNet / SE-ResNeXt (reference: encoders/senet.py) — ResNet bottlenecks
# with squeeze-excitation; SEResNet puts the stride on conv1.
# ---------------------------------------------------------------------------


class SEModule(nn.Module):
    channels: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = conv(self.channels // self.reduction, 1, name="fc1")(s)
        s = nn.relu(s)
        s = conv(self.channels, 1, name="fc2")(s)
        return x * jax.nn.sigmoid(s)


def ceil_mode_max_pool(y, window: int = 3, stride: int = 2):
    """torch MaxPool2d(window, stride, ceil_mode=True) with NO padding:
    windows start at 0 and the input is padded only at the bottom/right
    (with -inf) so the window count is ceil((dim-window)/stride)+1.
    pretrainedmodels' SENet stem uses exactly this (chosen over padding=1
    for Caffe-weight compatibility), so pooling windows are NOT shifted
    like a padding=1 pool would be."""
    h, w = y.shape[1:3]

    def pad_amount(dim):
        n_out = -(-(dim - window) // stride) + 1
        return max(0, (n_out - 1) * stride + window - dim)

    return nn.max_pool(
        y, (window, window), strides=(stride, stride),
        padding=((0, pad_amount(h)), (0, pad_amount(w))),
    )


class SEBottleneck(nn.Module):
    """The three pretrainedmodels SENet bottlenecks:
    - variant='senet'    (SEBottleneck, senet154): 1x1 -> planes*2,
      3x3(stride, groups) -> planes*4, 1x1 -> planes*4.
    - variant='seresnet' (SEResNetBottleneck): stride on conv1.
    - variant='seresnext'(SEResNeXtBottleneck): width from base_width,
      stride on conv2."""

    planes: int
    variant: str = "seresnet"
    stride: int = 1
    downsample: bool = False
    downsample_kernel: int = 1
    groups: int = 1
    base_width: int = 64
    reduction: int = 16

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_ch = self.planes * 4
        if self.variant == "senet":
            w1, w2 = self.planes * 2, self.planes * 4
            s1, s2 = 1, self.stride
        elif self.variant == "seresnext":
            w1 = w2 = int(
                math.floor(self.planes * (self.base_width / 64.0))
            ) * self.groups
            s1, s2 = 1, self.stride
        else:  # seresnet
            w1 = w2 = self.planes
            s1, s2 = self.stride, 1
        y = conv(w1, 1, s1, 0, use_bias=False, name="conv1")(x)
        y = BatchNorm(w1, name="bn1")(y, train)
        y = nn.relu(y)
        y = conv(w2, 3, s2, 1, use_bias=False, groups=self.groups, name="conv2")(y)
        y = BatchNorm(w2, name="bn2")(y, train)
        y = nn.relu(y)
        y = conv(out_ch, 1, use_bias=False, name="conv3")(y)
        y = BatchNorm(out_ch, name="bn3")(y, train)
        y = SEModule(out_ch, self.reduction, name="se_module")(y)
        identity = x
        if self.downsample:
            k = self.downsample_kernel
            identity = conv(out_ch, k, self.stride, k // 2, use_bias=False,
                            name="downsample_0")(x)
            identity = BatchNorm(out_ch, name="downsample_1")(identity, train)
        return nn.relu(y + identity)


_SENET_CFG = {
    # reference registry params: encoders/senet.py:77-175
    "senet154": dict(variant="senet", layers=(3, 8, 36, 3), groups=64,
                     base_width=64, input_3x3=True, ds_kernel=3),
    "se_resnet50": dict(variant="seresnet", layers=(3, 4, 6, 3), groups=1,
                        base_width=64, input_3x3=False, ds_kernel=1),
    "se_resnet101": dict(variant="seresnet", layers=(3, 4, 23, 3), groups=1,
                         base_width=64, input_3x3=False, ds_kernel=1),
    "se_resnet152": dict(variant="seresnet", layers=(3, 8, 36, 3), groups=1,
                         base_width=64, input_3x3=False, ds_kernel=1),
    "se_resnext50_32x4d": dict(variant="seresnext", layers=(3, 4, 6, 3),
                               groups=32, base_width=4, input_3x3=False,
                               ds_kernel=1),
    "se_resnext101_32x4d": dict(variant="seresnext", layers=(3, 4, 23, 3),
                                groups=32, base_width=4, input_3x3=False,
                                ds_kernel=1),
}


class SENetEncoder(nn.Module):
    arch: str = "se_resnet50"
    output_stride: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        if self.output_stride != 32:
            raise ValueError("SENet dilated mode not implemented")
        cfg = _SENET_CFG[self.arch]
        features = [x]
        if cfg["input_3x3"]:
            # senet154 stem: three 3x3 convs (64, 64, 128)
            y = conv(64, 3, 2, 1, use_bias=False, name="layer0_conv1")(x)
            y = BatchNorm(64, name="layer0_bn1")(y, train)
            y = nn.relu(y)
            y = conv(64, 3, 1, 1, use_bias=False, name="layer0_conv2")(y)
            y = BatchNorm(64, name="layer0_bn2")(y, train)
            y = nn.relu(y)
            y = conv(128, 3, 1, 1, use_bias=False, name="layer0_conv3")(y)
            y = BatchNorm(128, name="layer0_bn3")(y, train)
            y = nn.relu(y)
        else:
            y = conv(64, 7, 2, 3, use_bias=False, name="layer0_conv1")(x)
            y = BatchNorm(64, name="layer0_bn1")(y, train)
            y = nn.relu(y)
        features.append(y)
        y = ceil_mode_max_pool(y)
        planes = 64
        for li, n in enumerate(cfg["layers"], start=1):
            stride = 1 if li == 1 else 2
            # layer1's downsample is always a 1x1 (pretrainedmodels
            # _make_layer hardcodes it); later layers use ds_kernel.
            ds_kernel = 1 if li == 1 else cfg["ds_kernel"]
            for bi in range(n):
                y = SEBottleneck(
                    planes=planes,
                    variant=cfg["variant"],
                    stride=stride if bi == 0 else 1,
                    downsample=bi == 0,
                    downsample_kernel=ds_kernel,
                    groups=cfg["groups"],
                    base_width=cfg["base_width"],
                    name=f"layer{li}_{bi}",
                )(y, train)
            features.append(y)
            planes *= 2
        return features


# ---------------------------------------------------------------------------
# Xception (reference: encoders/xception.py) — separable convs with strided
# residual shortcuts. out_channels (3, 64, 128, 256, 728, 2048).
# ---------------------------------------------------------------------------


class SeparableConv(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        x = conv(cin, 3, self.stride, 1, use_bias=False, groups=cin, name="dw")(x)
        return conv(self.features, 1, use_bias=False, name="pw")(x)


class XceptionBlock(nn.Module):
    out_ch: int
    reps: int
    stride: int = 1
    start_with_relu: bool = True
    grow_first: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        skip = x
        if self.out_ch != x.shape[-1] or self.stride != 1:
            skip = conv(self.out_ch, 1, self.stride, 0, use_bias=False, name="skip")(x)
            skip = BatchNorm(self.out_ch, name="skip_bn")(skip, train)
        y = x
        ch = x.shape[-1]
        for r in range(self.reps):
            if r > 0 or self.start_with_relu:
                y = nn.relu(y)
            target = self.out_ch if (self.grow_first or r == self.reps - 1) else ch
            y = SeparableConv(target, 1, name=f"sep{r}")(y)
            y = BatchNorm(target, name=f"bn{r}")(y, train)
        if self.stride != 1:
            y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        return y + skip


class XceptionEncoder(nn.Module):
    output_stride: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        if self.output_stride != 32:
            raise ValueError("Xception dilated mode not implemented (pooling)")
        features = [x]
        y = conv(32, 3, 2, 1, use_bias=False, name="conv1")(x)
        y = BatchNorm(32, name="bn1")(y, train)
        y = nn.relu(y)
        y = conv(64, 3, 1, 1, use_bias=False, name="conv2")(y)
        y = BatchNorm(64, name="bn2")(y, train)
        y = nn.relu(y)
        features.append(y)  # 64 @ /2
        y = XceptionBlock(128, 2, 2, start_with_relu=False, name="block1")(y, train)
        features.append(y)  # 128 @ /4
        y = XceptionBlock(256, 2, 2, name="block2")(y, train)
        features.append(y)  # 256 @ /8
        y = XceptionBlock(728, 2, 2, name="block3")(y, train)
        for i in range(4, 12):  # middle flow
            y = XceptionBlock(728, 3, 1, name=f"block{i}")(y, train)
        features.append(y)  # 728 @ /16
        y = XceptionBlock(1024, 2, 2, grow_first=False, name="block12")(y, train)
        y = SeparableConv(1536, 1, name="conv3")(y)
        y = BatchNorm(1536, name="bn3")(y, train)
        y = nn.relu(y)
        y = SeparableConv(2048, 1, name="conv4")(y)
        # smp's stage 5 is Sequential(block12, conv3, bn3, relu, conv4, bn4):
        # it ends at bn4 with NO trailing ReLU (reference:
        # encoders/xception.py get_stages), so the deepest feature keeps
        # negative values.
        y = BatchNorm(2048, name="bn4")(y, train)
        features.append(y)  # 2048 @ /32
        return features


ENCODER_REGISTRY.update(
    {
        **{
            name: (
                (lambda n: (lambda output_stride=32: SENetEncoder(
                    arch=n, output_stride=output_stride)))(name),
                (3, 128 if name == "senet154" else 64, 256, 512, 1024, 2048),
                False,
            )
            for name in _SENET_CFG
        },
        "xception": (
            lambda output_stride=32: XceptionEncoder(output_stride=output_stride),
            (3, 64, 128, 256, 728, 2048), False,
        ),
    }
)


# ---------------------------------------------------------------------------
# DPN (dual-path networks; reference: encoders/dpn.py / pretrainedmodels DPN):
# each block carries a fixed-width residual path plus a growing dense path;
# staged features are relu(concat(paths)) at the reference's stage_idxs.
# ---------------------------------------------------------------------------


class _BnActConv(nn.Module):
    features: int
    kernel: int = 1
    stride: int = 1
    groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = BatchNorm(x.shape[-1], name="bn")(x, train)
        x = nn.relu(x)
        return conv(
            self.features, self.kernel, self.stride, self.kernel // 2,
            use_bias=False, groups=self.groups, name="conv",
        )(x)


class DualPathBlock(nn.Module):
    num_1x1_a: int
    num_3x3_b: int
    num_1x1_c: int
    inc: int
    groups: int
    block_type: str = "normal"  # proj | down | normal
    b: bool = False  # dpn68b-style: BnAct + two separate 1x1s instead of a slice

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (residual, dense) tuple or single tensor
        x_in = jnp.concatenate(x, axis=-1) if isinstance(x, tuple) else x
        stride = 2 if self.block_type == "down" else 1
        if self.block_type in ("proj", "down"):
            s = _BnActConv(
                self.num_1x1_c + 2 * self.inc, 1, stride, name="c1x1_w"
            )(x_in, train)
            s_res = s[..., : self.num_1x1_c]
            s_dense = s[..., self.num_1x1_c :]
        else:
            s_res, s_dense = x
        y = _BnActConv(self.num_1x1_a, 1, 1, name="c1x1_a")(x_in, train)
        y = _BnActConv(
            self.num_3x3_b, 3, stride, groups=self.groups, name="c3x3_b"
        )(y, train)
        if self.b:
            # pretrainedmodels' b-variant: CatBnAct then two parallel 1x1s
            y = BatchNorm(y.shape[-1], name="c1x1_c_bn")(y, train)
            y = nn.relu(y)
            out1 = conv(self.num_1x1_c, 1, use_bias=False, name="c1x1_c1")(y)
            out2 = conv(self.inc, 1, use_bias=False, name="c1x1_c2")(y)
        else:
            y = _BnActConv(self.num_1x1_c + self.inc, 1, 1, name="c1x1_c")(y, train)
            out1 = y[..., : self.num_1x1_c]
            out2 = y[..., self.num_1x1_c :]
        resid = s_res + out1
        dense = jnp.concatenate([s_dense, out2], axis=-1)
        return resid, dense


_DPN_CFG = {
    # reference registry params: encoders/dpn.py:79-170
    "dpn68": dict(
        num_init_features=10, k_r=128, groups=32,
        k_sec=(3, 4, 12, 3), inc_sec=(16, 32, 32, 64),
        small=True, b=False,
    ),
    "dpn68b": dict(
        num_init_features=10, k_r=128, groups=32,
        k_sec=(3, 4, 12, 3), inc_sec=(16, 32, 32, 64),
        small=True, b=True,
    ),
    "dpn92": dict(
        num_init_features=64, k_r=96, groups=32,
        k_sec=(3, 4, 20, 3), inc_sec=(16, 32, 24, 128),
        small=False, b=False,
    ),
    "dpn98": dict(
        num_init_features=96, k_r=160, groups=40,
        k_sec=(3, 6, 20, 3), inc_sec=(16, 32, 32, 128),
        small=False, b=False,
    ),
    "dpn107": dict(
        num_init_features=128, k_r=200, groups=50,
        k_sec=(4, 8, 20, 3), inc_sec=(20, 64, 64, 128),
        small=False, b=False,
    ),
    "dpn131": dict(
        num_init_features=128, k_r=160, groups=40,
        k_sec=(4, 8, 28, 3), inc_sec=(16, 32, 32, 128),
        small=False, b=False,
    ),
}


class DPNEncoder(nn.Module):
    arch: str = "dpn68"
    output_stride: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        if self.output_stride != 32:
            raise ValueError("DPN dilated mode not implemented")
        cfg = _DPN_CFG[self.arch]
        features = [x]
        stem_k = 3 if cfg["small"] else 7
        y = conv(
            cfg["num_init_features"], stem_k, 2, stem_k // 2,
            use_bias=False, name="stem_conv",
        )(x)
        y = BatchNorm(cfg["num_init_features"], name="stem_bn")(y, train)
        y = nn.relu(y)
        features.append(y)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        bw_base = 64 if cfg["small"] else 256
        for si in range(4):
            bw = bw_base * (2**si)
            inc = cfg["inc_sec"][si]
            r = (cfg["k_r"] * bw) // bw_base
            block_type = "proj" if si == 0 else "down"
            pair = DualPathBlock(
                r, r, bw, inc, cfg["groups"], block_type, b=cfg["b"],
                name=f"s{si}_b0",
            )(y, train)
            for bi in range(1, cfg["k_sec"][si]):
                pair = DualPathBlock(
                    r, r, bw, inc, cfg["groups"], "normal", b=cfg["b"],
                    name=f"s{si}_b{bi}",
                )(pair, train)
            y = pair
            cat = jnp.concatenate(pair, axis=-1)
            if si == 3:
                # smp stage_idxs include pretrainedmodels' trailing CatBnAct
                # (`conv5_bn_ac`): the deepest feature is relu(bn(concat)),
                # not a bare relu(concat) (reference: encoders/dpn.py:48-68).
                cat = BatchNorm(cat.shape[-1], name="conv5_bn_ac_bn")(cat, train)
            features.append(nn.relu(cat))
        return features[:6]


_DPN_OUT_CHANNELS = {
    "dpn68": (3, 10, 144, 320, 704, 832),
    "dpn68b": (3, 10, 144, 320, 704, 832),
    "dpn92": (3, 64, 336, 704, 1552, 2688),
    "dpn98": (3, 96, 336, 768, 1728, 2688),
    "dpn107": (3, 128, 376, 1152, 2432, 2688),
    "dpn131": (3, 128, 352, 832, 1984, 2688),
}

ENCODER_REGISTRY.update(
    {
        name: (
            (lambda n: (lambda output_stride=32: DPNEncoder(
                arch=n, output_stride=output_stride)))(name),
            _DPN_OUT_CHANNELS[name], False,
        )
        for name in _DPN_CFG
    }
)


# ---------------------------------------------------------------------------
# Inception + timm families (inceptionv4, inceptionresnetv2, resnest,
# res2net, sknet, regnet, gernet, mobilenetv3) live in encoders_extra.py.
# ---------------------------------------------------------------------------

from hallucidet_tpu.nn import encoders_extra as _extra  # noqa: E402

_extra.register(ENCODER_REGISTRY)
