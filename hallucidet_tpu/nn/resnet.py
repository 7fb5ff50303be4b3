"""ResNet encoders/backbones (18/34/50/101/152), NHWC Flax.

One implementation serves both consumers of the reference:
- smp-style encoder for the hallucination U-Net, returning the 6 staged
  features (reference: src/segmentation_models/encoders/resnet.py:37-70),
  with trainable BatchNorm;
- torchvision-style detector backbone with FrozenBatchNorm feeding the FPN
  (reference detectors are *_resnet50_fpn; SURVEY.md §3.4).

Param naming mirrors torch (`conv1`, `bn1`, `layer{n}_{i}`, `downsample_*`)
so checkpoint conversion is a mechanical key map (interop/torch_loader.py).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

import jax

from hallucidet_tpu.nn.layers import BatchNorm, ConvParams, FrozenBatchNorm, conv


def _norm(frozen: bool, features: int, name: str):
    if frozen:
        return FrozenBatchNorm(features, name=name)
    return BatchNorm(features, name=name)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    frozen_bn: bool = False
    dilation: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        identity = x
        d = self.dilation
        out = conv(
            self.planes, 3, self.stride, d, use_bias=False, dilation=d, name="conv1"
        )(x)
        out = _apply_norm(_norm(self.frozen_bn, self.planes, "bn1"), out, train)
        out = nn.relu(out)
        # materialize conv2's input (see HFoldBasicBlock: XLA's in-fusion
        # bn+relu input chain ran the conv 2.6x slower; round-5 HLO finding)
        out = jax.lax.optimization_barrier(out)
        out = conv(self.planes, 3, 1, d, use_bias=False, dilation=d, name="conv2")(out)
        out = _apply_norm(_norm(self.frozen_bn, self.planes, "bn2"), out, train)
        if self.downsample:
            identity = conv(
                self.planes, 1, self.stride, 0, use_bias=False, name="downsample_0"
            )(x)
            identity = _apply_norm(
                _norm(self.frozen_bn, self.planes, "downsample_1"), identity, train
            )
        return nn.relu(out + identity)


class HFoldBasicBlock(nn.Module):
    """BasicBlock computed on the (fold, 1) H-folded view: both 3x3 convs run
    as [3,3,fold*C,fold*C] packed convs (s2d_conv_kernel_f), BN normalizes the
    fold axis reshaped out (exact stats — the fold positions partition H), and
    the residual add/relu stay in folded space. Param tree identical to
    BasicBlock (conv1/bn1/conv2/bn2).

    Purpose: layer1's Cin=64 convs fill only half the MXU's 128 lanes (the
    round-4 b64 trace: 41 ms/step at 56 GF/ms; the folded kernel class probes
    at 191 GF/ms, PERF.md). Stride-1, no-downsample blocks only (all of
    resnet18/34 layer1)."""

    planes: int
    fold: int = 2
    frozen_bn: bool = False

    @nn.compact
    def __call__(self, x_f: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        from hallucidet_tpu.ops.fused_upsample import s2d_conv_kernel_f

        f, p = self.fold, self.planes
        k1, _ = ConvParams((3, 3, p, p), use_bias=False, name="conv1")()
        k2, _ = ConvParams((3, 3, p, p), use_bias=False, name="conv2")()

        def bn(name, y):
            b_, h_, w_, _ = y.shape
            y5 = y.reshape(b_, h_, w_, f, p)
            y5 = _apply_norm(_norm(self.frozen_bn, p, name), y5, train)
            return y5.reshape(b_, h_, w_, f * p)

        dn = ("NHWC", "HWIO", "NHWC")
        out = jax.lax.conv_general_dilated(
            x_f, s2d_conv_kernel_f(k1, f, 1).astype(x_f.dtype), (1, 1),
            ((1, 1), (1, 1)),
            dimension_numbers=jax.lax.conv_dimension_numbers(
                x_f.shape, (3, 3, f * p, f * p), dn
            ),
        )
        out = nn.relu(bn("bn1", out))
        # Materialize conv2's input instead of letting XLA fuse the bn+relu
        # chain INTO the conv fusion: the in-fusion input chain forces
        # per-tile halo recomputation through the elementwise ops and the
        # conv emitter's fused-operand mode ran these convs at 10.6 ms vs
        # the 4.1 ms of their materialized-input peers (round-5 HLO
        # dissection of fused_computation.164 vs .225; exact — the barrier
        # is an identity).
        out = jax.lax.optimization_barrier(out)
        out = jax.lax.conv_general_dilated(
            out, s2d_conv_kernel_f(k2, f, 1).astype(out.dtype), (1, 1),
            ((1, 1), (1, 1)),
            dimension_numbers=jax.lax.conv_dimension_numbers(
                out.shape, (3, 3, f * p, f * p), dn
            ),
        )
        return nn.relu(bn("bn2", out) + x_f)


class FoldConsumeBasicBlock(nn.Module):
    """The stride-2 + downsample BasicBlock (layer2_0) consuming its
    producer's (2,1) H-FOLDED output directly: conv1 runs with a
    fold2_stride2_consume_kernel ([2,3,2C,O], strides (1,2)) and the 1x1
    downsample with fold2_stride2_consume_1x1_kernel — both read the folded
    layout natively, so the folded-layer1 chain needs no unfold copy. The
    block's OUTPUT is ordinary (layer2 geometry); bn1/conv2/bn2 are standard.
    Param tree identical to BasicBlock(stride=2, downsample=True)."""

    planes: int
    frozen_bn: bool = False

    @nn.compact
    def __call__(self, x_f: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        from hallucidet_tpu.ops.fused_upsample import (
            fold2_stride2_consume_1x1_kernel,
            fold2_stride2_consume_kernel,
        )

        p = self.planes
        c_in = x_f.shape[-1] // 2
        k1, _ = ConvParams((3, 3, c_in, p), use_bias=False, name="conv1")()
        kd, _ = ConvParams((1, 1, c_in, p), use_bias=False, name="downsample_0")()

        def fconv(x, kt, pad, strides):
            dn = jax.lax.conv_dimension_numbers(
                x.shape, kt.shape, ("NHWC", "HWIO", "NHWC")
            )
            return jax.lax.conv_general_dilated(
                x, kt.astype(x.dtype), strides, pad, dimension_numbers=dn
            )

        out = fconv(
            x_f, fold2_stride2_consume_kernel(k1), ((1, 0), (1, 1)), (1, 2)
        )
        out = _apply_norm(_norm(self.frozen_bn, p, "bn1"), out, train)
        out = nn.relu(out)
        # materialize conv2's input (round-5 finding, see HFoldBasicBlock)
        out = jax.lax.optimization_barrier(out)
        out = conv(p, 3, 1, 1, use_bias=False, name="conv2")(out)
        out = _apply_norm(_norm(self.frozen_bn, p, "bn2"), out, train)
        identity = fconv(
            x_f, fold2_stride2_consume_1x1_kernel(kd), ((0, 0), (0, 0)), (1, 2)
        )
        identity = _apply_norm(
            _norm(self.frozen_bn, p, "downsample_1"), identity, train
        )
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    frozen_bn: bool = False
    expansion: int = 4
    dilation: int = 1
    groups: int = 1
    base_width: int = 64

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        identity = x
        out_ch = self.planes * self.expansion
        d = self.dilation
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        out = conv(width, 1, 1, 0, use_bias=False, name="conv1")(x)
        out = _apply_norm(_norm(self.frozen_bn, width, "bn1"), out, train)
        out = nn.relu(out)
        # materialize the 3x3's input (round-5 finding, see HFoldBasicBlock)
        out = jax.lax.optimization_barrier(out)
        # stride lives on the 3x3 (torchvision placement)
        out = conv(
            width, 3, self.stride, d, use_bias=False, dilation=d,
            groups=self.groups, name="conv2",
        )(out)
        out = _apply_norm(_norm(self.frozen_bn, width, "bn2"), out, train)
        out = nn.relu(out)
        out = conv(out_ch, 1, 1, 0, use_bias=False, name="conv3")(out)
        out = _apply_norm(_norm(self.frozen_bn, out_ch, "bn3"), out, train)
        if self.downsample:
            identity = conv(
                out_ch, 1, self.stride, 0, use_bias=False, name="downsample_0"
            )(x)
            identity = _apply_norm(
                _norm(self.frozen_bn, out_ch, "downsample_1"), identity, train
            )
        return nn.relu(out + identity)


def _apply_norm(mod, x, train):
    if isinstance(mod, BatchNorm):
        return mod(x, train)
    return mod(x)


RESNET_SPECS = {
    # block, layer sizes, expansion, groups, base_width
    "resnet18": (BasicBlock, (2, 2, 2, 2), 1, 1, 64),
    "resnet34": (BasicBlock, (3, 4, 6, 3), 1, 1, 64),
    "resnet50": (Bottleneck, (3, 4, 6, 3), 4, 1, 64),
    "resnet101": (Bottleneck, (3, 4, 23, 3), 4, 1, 64),
    "resnet152": (Bottleneck, (3, 8, 36, 3), 4, 1, 64),
    "resnext50_32x4d": (Bottleneck, (3, 4, 6, 3), 4, 32, 4),
    # resnext101 group-width family incl. the Instagram-WSL variants
    # (reference: src/segmentation_models/encoders/resnet.py:183-230)
    "resnext101_32x4d": (Bottleneck, (3, 4, 23, 3), 4, 32, 4),
    "resnext101_32x8d": (Bottleneck, (3, 4, 23, 3), 4, 32, 8),
    "resnext101_32x16d": (Bottleneck, (3, 4, 23, 3), 4, 32, 16),
    "resnext101_32x32d": (Bottleneck, (3, 4, 23, 3), 4, 32, 32),
    "resnext101_32x48d": (Bottleneck, (3, 4, 23, 3), 4, 32, 48),
}

# smp encoder out_channels, index 0 = the input itself.
ENCODER_OUT_CHANNELS = {
    "resnet18": (3, 64, 64, 128, 256, 512),
    "resnet34": (3, 64, 64, 128, 256, 512),
    "resnet50": (3, 64, 256, 512, 1024, 2048),
    "resnet101": (3, 64, 256, 512, 1024, 2048),
    "resnet152": (3, 64, 256, 512, 1024, 2048),
    "resnext50_32x4d": (3, 64, 256, 512, 1024, 2048),
    "resnext101_32x4d": (3, 64, 256, 512, 1024, 2048),
    "resnext101_32x8d": (3, 64, 256, 512, 1024, 2048),
    "resnext101_32x16d": (3, 64, 256, 512, 1024, 2048),
    "resnext101_32x32d": (3, 64, 256, 512, 1024, 2048),
    "resnext101_32x48d": (3, 64, 256, 512, 1024, 2048),
}


class ResNet(nn.Module):
    """Staged ResNet trunk. `__call__` returns the smp 6-feature list:
    [x, stem(x), layer1, layer2, layer3, layer4]; detector backbones use
    [2:] (C2..C5)."""

    arch: str = "resnet50"
    frozen_bn: bool = False
    # rematerialize each residual block in the backward pass (trade ~30%
    # extra forward FLOPs for O(block-outputs) activation memory — required
    # to train megapixel inputs in 16G HBM)
    remat: bool = False
    # 32 (default), 16 or 8: smaller strides replace the last layers' stride
    # with dilation (smp make_dilated semantics, reference:
    # src/segmentation_models/encoders/_base.py / _utils.py:41-51)
    output_stride: int = 32
    # compute the 7x7/2 stem as a 4x4/1 conv on the 2x2 space-to-depth input
    # (exact; XLA's C=3 conv at megapixel sizes is ~6x off its roofline —
    # PERF.md). Param layout unchanged.
    s2d_stem: bool = True
    # a 1-channel input against the 3-channel stem params is interpreted as
    # replicated grayscale: conv(replicate3(x), W) == conv(x, W.sum(ch)) —
    # EXACT, and skips 2/3 of the stem traffic plus the megapixel 1->3
    # expand (the HalluciDet IR path). True-1-channel-native params come
    # from interop.patch_first_conv instead; set gray_fold=False to opt out.
    gray_fold: bool = True
    # run layer1's BasicBlocks on the (2,1) H-folded view as a COPY-FREE
    # chain: the stem maxpool emits the folded layout natively
    # (max_pool3x3s2_fold2), layer1 runs as HFoldBasicBlocks, and layer2_0
    # consumes the folded output directly (FoldConsumeBasicBlock) — no
    # fold/unfold copy anywhere. The layer1 FEATURE in the returned list is
    # then (2,1)-H-FOLDED [B, H/8, W/4, 128]; callers must either consume it
    # fold-aware (UnetDecoder skip_folds) or unfold_h it. Earlier fold
    # attempts with explicit fold/unfold copies at the boundary measured
    # neutral-to-negative (PERF.md rounds 3-4); the copy-free chain is the
    # only winning form. BasicBlock archs at output_stride 32 with
    # stem-height % 4 == 0 only; OFF by default (translation/unet.py opts
    # the product U-Net in and coordinates the decoder).
    h_fold_layer1: bool = False

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False
    ) -> List[jnp.ndarray]:
        block_cls, layer_sizes, expansion, groups, base_width = RESNET_SPECS[
            self.arch
        ]
        dilate_from = {32: 5, 16: 4, 8: 3}[self.output_stride]
        features = [x]

        fold = self.gray_fold and x.shape[-1] == 1
        stem_ch = 3 if fold else x.shape[-1]
        # The copy-free folded chain decision, made BEFORE the stem so the
        # stem conv can emit the folded layout directly (round 5): BasicBlock
        # archs at output_stride 32 with stem height % 4 == 0.
        fold_l1 = (
            self.h_fold_layer1
            and block_cls is BasicBlock
            and dilate_from == 5  # layer2 keeps its stride (no dilation)
            and ((x.shape[1] + 1) // 2) % 4 == 0  # folded maxpool: stem H % 4
        )
        # fold-4 stem: emit the stem conv output (4,1)-H-folded straight from
        # an (8,2) space-to-depth of the input (ops/fused_upsample.
        # stem_fold4_conv_kernel). The folded maxpool then runs as pure
        # channel maxes (max_pool3x3s2_fold4_to_fold2) and the stem FEATURE
        # is returned (4,1)-folded — exactly the fold the decoder's block
        # consumes natively (skip_folds; stem_fold_factor coordinates).
        stem_f4 = (
            fold_l1 and self.s2d_stem
            and x.shape[1] % 8 == 0 and x.shape[2] % 2 == 0
        )
        if stem_f4:
            from hallucidet_tpu.ops.fused_upsample import (
                max_pool3x3s2_fold4_to_fold2,
                space_to_depth,
                stem_fold4_conv_kernel,
            )

            kernel, _ = ConvParams((7, 7, stem_ch, 64), name="conv1")()
            if fold:
                kernel = jnp.sum(kernel, axis=2, keepdims=True)
            kt = stem_fold4_conv_kernel(kernel).astype(x.dtype)
            xs = space_to_depth(x, 8, 2)
            dn = jax.lax.conv_dimension_numbers(
                xs.shape, kt.shape, ("NHWC", "HWIO", "NHWC")
            )
            out = jax.lax.conv_general_dilated(
                xs, kt, (1, 1), ((1, 1), (2, 1)), dimension_numbers=dn
            )
            b_, hq_, w_, _ = out.shape
            norm = _norm(self.frozen_bn, 64, "bn1")
            out = _apply_norm(norm, out.reshape(b_, hq_, w_, 4, 64), train)
            out = nn.relu(out.reshape(b_, hq_, w_, 256))
            features.append(out)  # (4,1)-H-folded stem feature
            out = max_pool3x3s2_fold4_to_fold2(out)
        elif self.s2d_stem and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
            from hallucidet_tpu.ops.fused_upsample import (
                s2d_stride2_conv_kernel,
                space_to_depth2,
            )

            kernel, _ = ConvParams((7, 7, stem_ch, 64), name="conv1")()
            if fold:
                kernel = jnp.sum(kernel, axis=2, keepdims=True)
            kt = s2d_stride2_conv_kernel(kernel).astype(x.dtype)
            xs = space_to_depth2(x)
            dn = jax.lax.conv_dimension_numbers(
                xs.shape, kt.shape, ("NHWC", "HWIO", "NHWC")
            )
            out = jax.lax.conv_general_dilated(
                xs, kt, (1, 1), ((2, 1), (2, 1)), dimension_numbers=dn
            )
        elif fold:
            kernel, _ = ConvParams((7, 7, stem_ch, 64), name="conv1")()
            kernel = jnp.sum(kernel, axis=2, keepdims=True).astype(x.dtype)
            dn = jax.lax.conv_dimension_numbers(
                x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC")
            )
            out = jax.lax.conv_general_dilated(
                x, kernel, (2, 2), ((3, 3), (3, 3)), dimension_numbers=dn
            )
        else:
            out = conv(64, 7, 2, 3, use_bias=False, name="conv1")(x)
        if not stem_f4:
            out = _apply_norm(_norm(self.frozen_bn, 64, "bn1"), out, train)
            out = nn.relu(out)
            features.append(out)
            if fold_l1:
                from hallucidet_tpu.ops.fused_upsample import (
                    max_pool3x3s2_fold2,
                )

                out = max_pool3x3s2_fold2(out)
            else:
                out = nn.max_pool(
                    out, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1))
                )
        planes = 64
        dilation = 1
        for li, n_blocks in enumerate(layer_sizes, start=1):
            stride = 1 if li == 1 else 2
            if li + 1 > dilate_from:  # this layer trades stride for dilation
                dilation *= stride
                stride = 1
            if li == 1 and fold_l1:
                for bi in range(n_blocks):
                    cls = (
                        nn.remat(HFoldBasicBlock, static_argnums=(2,))
                        if self.remat
                        else HFoldBasicBlock
                    )
                    out = cls(
                        planes=planes, fold=2, frozen_bn=self.frozen_bn,
                        name=f"layer1_{bi}",
                    )(out, train)
                features.append(out)  # (2,1)-H-FOLDED (see h_fold_layer1)
                planes *= 2
                continue
            if li == 2 and fold_l1:
                # layer2_0 consumes the folded layer1 natively; the rest of
                # layer2 is ordinary
                cls0 = (
                    nn.remat(FoldConsumeBasicBlock, static_argnums=(2,))
                    if self.remat
                    else FoldConsumeBasicBlock
                )
                out = cls0(
                    planes=planes, frozen_bn=self.frozen_bn, name="layer2_0"
                )(out, train)
                for bi in range(1, n_blocks):
                    cls = (
                        nn.remat(block_cls, static_argnums=(2,))
                        if self.remat
                        else block_cls
                    )
                    out = cls(
                        planes=planes, stride=1, downsample=False,
                        frozen_bn=self.frozen_bn, dilation=dilation,
                        name=f"layer2_{bi}",
                    )(out, train)
                features.append(out)
                planes *= 2
                continue
            for bi in range(n_blocks):
                # downsample when the block changes stride or channel count
                needs_ds = bi == 0 and (
                    stride != 1
                    or (li == 1 and expansion != 1)
                    or (li + 1 > dilate_from)
                )
                kwargs = (
                    dict(groups=groups, base_width=base_width)
                    if block_cls is Bottleneck
                    else {}
                )
                cls = (
                    nn.remat(block_cls, static_argnums=(2,))
                    if self.remat
                    else block_cls
                )
                out = cls(
                    planes=planes,
                    stride=stride if bi == 0 else 1,
                    downsample=needs_ds,
                    frozen_bn=self.frozen_bn,
                    dilation=dilation,
                    name=f"layer{li}_{bi}",
                    **kwargs,
                )(out, train)
            features.append(out)
            planes *= 2
        return features


def layer1_fold_factor(arch: str, input_h: int, output_stride: int = 32) -> int:
    """The (static) H-fold factor ResNet(h_fold_layer1=True) will apply to
    its layer1 feature for this geometry — 2 when the copy-free folded chain
    engages (BasicBlock arch, output_stride 32, stem height % 4 == 0), else
    1. Mirrors the trace-time condition in ResNet.__call__ so coordinators
    (translation/unet.py) can size the decoder's skip_folds."""
    spec = RESNET_SPECS.get(arch)
    if spec is None or spec[0] is not BasicBlock or output_stride != 32:
        return 1
    stem_h = (input_h + 1) // 2  # 7x7/s2/p3 output height
    return 2 if stem_h % 4 == 0 else 1


def stem_fold_factor(
    arch: str, input_h: int, input_w: int, output_stride: int = 32
) -> int:
    """The (static) H-fold factor of the STEM feature under the same flags —
    4 when the fold-4 stem engages (the folded chain active, s2d-compatible
    H % 8 == 0 and W % 2 == 0 geometry; ResNet.__call__ `stem_f4`), else 1.
    Assumes the encoder's default s2d_stem=True."""
    if layer1_fold_factor(arch, input_h, output_stride) != 2:
        return 1
    return 4 if input_h % 8 == 0 and input_w % 2 == 0 else 1


def encoder_out_channels(arch: str) -> Tuple[int, ...]:
    return ENCODER_OUT_CHANNELS[arch]


def backbone_out_channels(arch: str) -> Tuple[int, ...]:
    """C2..C5 channels for the FPN."""
    return ENCODER_OUT_CHANNELS[arch][2:]
