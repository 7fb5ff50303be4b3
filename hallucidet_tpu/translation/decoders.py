"""The remaining smp decoder architectures, NHWC Flax.

Rebuild of the reference's vendored decoder zoo (reference:
src/segmentation_models/decoders/{unetplusplus,linknet,fpn,pspnet,manet,pan,
deeplabv3}/decoder.py). Upsampling modes mirror the fork exactly:
UnetPlusPlus/MAnet nearest, FPN laterals bilinear align_corners=True with
nearest segmentation upsampling, PSP/PAN bilinear align_corners=True,
DeepLabV3 bilinear align_corners=False, Linknet transposed convs.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from hallucidet_tpu.nn.layers import Attention, BatchNorm, ConvBnReLU, conv
from hallucidet_tpu.nn.unet_decoder import DecoderBlock
from hallucidet_tpu.ops.image_ops import (
    adaptive_avg_pool2d,
    resize_bilinear,
    resize_bilinear_align_corners,
    upsample_nearest,
)


# ---------------------------------------------------------------------------
# Unet++ (reference: decoders/unetplusplus/decoder.py)
# ---------------------------------------------------------------------------


class UnetPlusPlusDecoder(nn.Module):
    encoder_channels: Sequence[int]  # smp 6-tuple incl. input
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    use_batchnorm: bool = True
    attention_type: Optional[str] = None

    @nn.compact
    def __call__(self, features: List[jnp.ndarray], train: bool = False):
        enc = list(self.encoder_channels)[1:][::-1]  # deepest first
        head_ch = enc[0]
        in_channels = [head_ch] + list(self.decoder_channels[:-1])
        skip_channels = enc[1:] + [0]
        out_channels = list(self.decoder_channels)
        depth = len(in_channels) - 1

        feats = features[1:][::-1]

        def block(name, out_ch, skip_ch):
            return DecoderBlock(
                out_channels=out_ch,
                skip_channels=skip_ch,
                use_batchnorm=self.use_batchnorm,
                attention_type=self.attention_type,
                name=name,
            )

        dense = {}
        for layer_idx in range(depth):
            for depth_idx in range(depth - layer_idx):
                if layer_idx == 0:
                    out = block(
                        f"x_{depth_idx}_{depth_idx}",
                        out_channels[depth_idx]
                        if depth_idx == 0
                        else skip_channels[depth_idx - 1],
                        skip_channels[depth_idx],
                    )(feats[depth_idx], feats[depth_idx + 1], train)
                    dense[f"x_{depth_idx}_{depth_idx}"] = out
                else:
                    dense_l_i = depth_idx + layer_idx
                    cat = jnp.concatenate(
                        [
                            dense[f"x_{idx}_{dense_l_i}"]
                            for idx in range(depth_idx + 1, dense_l_i + 1)
                        ]
                        + [feats[dense_l_i + 1]],
                        axis=-1,
                    )
                    out_ch = (
                        out_channels[layer_idx]
                        if depth_idx == 0
                        else skip_channels[layer_idx - 1]
                    )
                    dense[f"x_{depth_idx}_{dense_l_i}"] = block(
                        f"x_{depth_idx}_{dense_l_i}", out_ch, cat.shape[-1]
                    )(dense[f"x_{depth_idx}_{dense_l_i - 1}"], cat, train)
        final = block(f"x_0_{depth}", out_channels[-1], 0)(
            dense[f"x_0_{depth - 1}"], None, train
        )
        return final


# ---------------------------------------------------------------------------
# Linknet (reference: decoders/linknet/decoder.py)
# ---------------------------------------------------------------------------


class TransposeX2(nn.Module):
    features: int
    use_batchnorm: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.ConvTranspose(
            self.features, (4, 4), strides=(2, 2), padding=((2, 2), (2, 2)),
            use_bias=not self.use_batchnorm,
            transpose_kernel=True,
            name="0",
        )(x)
        if self.use_batchnorm:
            x = BatchNorm(self.features, name="1")(x, train)
        return nn.relu(x)


class LinknetDecoderBlock(nn.Module):
    out_channels: int
    use_batchnorm: bool = True

    @nn.compact
    def __call__(self, x, skip=None, train: bool = False):
        mid = x.shape[-1] // 4
        x = ConvBnReLU(
            mid, kernel_size=1, padding=0, use_batchnorm=self.use_batchnorm,
            name="conv1",
        )(x, train)
        x = TransposeX2(mid, self.use_batchnorm, name="transpose")(x, train)
        x = ConvBnReLU(
            self.out_channels, kernel_size=1, padding=0,
            use_batchnorm=self.use_batchnorm, name="conv2",
        )(x, train)
        if skip is not None:
            x = x + skip
        return x


class LinknetDecoder(nn.Module):
    encoder_channels: Sequence[int]
    prefinal_channels: int = 32
    use_batchnorm: bool = True

    @nn.compact
    def __call__(self, features: List[jnp.ndarray], train: bool = False):
        feats = features[1:][::-1]
        x = feats[0]
        skips = feats[1:]
        channels = list(self.encoder_channels)[1:][::-1][1:] + [self.prefinal_channels]
        for i, out_ch in enumerate(channels):
            skip = skips[i] if i < len(skips) else None
            x = LinknetDecoderBlock(
                out_ch, self.use_batchnorm, name=f"block_{i}"
            )(x, skip, train)
        return x


# ---------------------------------------------------------------------------
# FPN decoder (reference: decoders/fpn/decoder.py)
# ---------------------------------------------------------------------------


class Conv3x3GNReLU(nn.Module):
    features: int
    upsample: bool = False

    @nn.compact
    def __call__(self, x):
        x = conv(self.features, 3, 1, 1, use_bias=False, name="conv")(x)
        x = nn.GroupNorm(num_groups=32, name="gn")(x)
        x = nn.relu(x)
        if self.upsample:
            x = upsample_nearest(x, 2)
        return x


class FPNDecoder(nn.Module):
    encoder_channels: Sequence[int]
    pyramid_channels: int = 256
    segmentation_channels: int = 128
    dropout: float = 0.2
    merge_policy: str = "add"  # add | cat

    @nn.compact
    def __call__(self, features: List[jnp.ndarray], train: bool = False,
                 dropout_rng=None):
        c2, c3, c4, c5 = features[-4:]
        p5 = conv(self.pyramid_channels, 1, name="p5")(c5)
        # lateral + bilinear(align_corners=True) upsample (this fork's mode)
        def fpn_block(p, c, name):
            skip = conv(self.pyramid_channels, 1, name=name)(c)
            up = resize_bilinear_align_corners(p, skip.shape[1:3])
            return up + skip

        p4 = fpn_block(p5, c4, "p4")
        p3 = fpn_block(p4, c3, "p3")
        p2 = fpn_block(p3, c2, "p2")

        outs = []
        for i, (p, ups) in enumerate(zip([p5, p4, p3, p2], [3, 2, 1, 0])):
            x = p
            for j in range(max(ups, 1) if ups != 0 else 1):
                x = Conv3x3GNReLU(
                    self.segmentation_channels, upsample=ups > 0,
                    name=f"seg_{i}_{j}",
                )(x)
                if ups == 0:
                    break
            outs.append(x)
        if self.merge_policy == "add":
            x = sum(outs)
        else:
            x = jnp.concatenate(outs, axis=-1)
        if train and self.dropout > 0:
            x = nn.Dropout(rate=self.dropout, deterministic=False)(
                x, rng=dropout_rng
            )
        return x


# ---------------------------------------------------------------------------
# PSPNet (reference: decoders/pspnet/decoder.py)
# ---------------------------------------------------------------------------


class PSPDecoder(nn.Module):
    out_channels: int = 512
    sizes: Tuple[int, ...] = (1, 2, 3, 6)
    use_batchnorm: bool = True
    dropout: float = 0.2

    @nn.compact
    def __call__(self, features: List[jnp.ndarray], train: bool = False,
                 dropout_rng=None):
        x = features[-1]
        h, w = x.shape[1:3]
        in_ch = x.shape[-1]
        branch_ch = in_ch // len(self.sizes)
        branches = [x]
        for i, s in enumerate(self.sizes):
            b = adaptive_avg_pool2d(x, (s, s))
            b = ConvBnReLU(
                branch_ch, kernel_size=1, padding=0,
                use_batchnorm=self.use_batchnorm, name=f"psp_{i}",
            )(b, train)
            branches.append(resize_bilinear_align_corners(b, (h, w)))
        x = jnp.concatenate(branches, axis=-1)
        x = ConvBnReLU(
            self.out_channels, kernel_size=1, padding=0,
            use_batchnorm=self.use_batchnorm, name="conv",
        )(x, train)
        if train and self.dropout > 0:
            x = nn.Dropout(rate=self.dropout, deterministic=False)(
                x, rng=dropout_rng
            )
        return x


# ---------------------------------------------------------------------------
# MAnet (reference: decoders/manet/decoder.py)
# ---------------------------------------------------------------------------


class PAB(nn.Module):
    """Position attention block on the deepest feature."""

    in_channels: int
    pab_channels: int = 64

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        q = conv(self.pab_channels, 1, name="top")(x).reshape(b, h * w, -1)
        k = conv(self.pab_channels, 1, name="center")(x).reshape(b, h * w, -1)
        v = conv(c, 1, name="bottom")(x).reshape(b, h * w, c)
        attn = jax.nn.softmax(
            jnp.einsum("bnc,bmc->bnm", q, k), axis=-1
        )
        out = jnp.einsum("bnm,bmc->bnc", attn, v).reshape(b, h, w, c)
        return out + x


class MFAB(nn.Module):
    """Multi-scale fusion attention block: channel attention on the skip."""

    out_channels: int
    use_batchnorm: bool = True
    reduction: int = 16

    @nn.compact
    def __call__(self, x, skip=None, train: bool = False):
        x = ConvBnReLU(
            self.out_channels, use_batchnorm=self.use_batchnorm, name="hl_conv0"
        )(x, train)
        x = ConvBnReLU(
            self.out_channels, kernel_size=1, padding=0,
            use_batchnorm=self.use_batchnorm, name="hl_conv1",
        )(x, train)
        x = upsample_nearest(x, 2)
        attn = x
        if skip is not None:
            # channel attention over (x + skip-projected)
            pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
            a = conv(max(1, self.out_channels // self.reduction), 1, name="se_1")(
                pooled
            )
            a = nn.relu(a)
            a = conv(self.out_channels, 1, name="se_2")(a)
            attn = x * jax.nn.sigmoid(a)
            skip_p = ConvBnReLU(
                self.out_channels, kernel_size=1, padding=0,
                use_batchnorm=self.use_batchnorm, name="skip_conv",
            )(skip, train)
            attn = jnp.concatenate([attn, skip_p], axis=-1)
        x = ConvBnReLU(
            self.out_channels, use_batchnorm=self.use_batchnorm, name="conv1"
        )(attn, train)
        x = ConvBnReLU(
            self.out_channels, use_batchnorm=self.use_batchnorm, name="conv2"
        )(x, train)
        return x


class MAnetDecoder(nn.Module):
    encoder_channels: Sequence[int]
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    use_batchnorm: bool = True
    pab_channels: int = 64

    @nn.compact
    def __call__(self, features: List[jnp.ndarray], train: bool = False):
        feats = features[1:][::-1]
        x = PAB(feats[0].shape[-1], self.pab_channels, name="center")(feats[0])
        skips = feats[1:]
        for i, out_ch in enumerate(self.decoder_channels):
            skip = skips[i] if i < len(skips) else None
            if skip is not None:
                x = MFAB(
                    out_ch, self.use_batchnorm, name=f"block_{i}"
                )(x, skip, train)
            else:
                x = DecoderBlock(
                    out_channels=out_ch, use_batchnorm=self.use_batchnorm,
                    name=f"block_{i}",
                )(x, None, train)
        return x


# ---------------------------------------------------------------------------
# PAN (reference: decoders/pan/decoder.py)
# ---------------------------------------------------------------------------


class FPA(nn.Module):
    """Feature pyramid attention on the deepest feature."""

    out_channels: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        up_kw = dict()
        # global branch
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = ConvBnReLU(self.out_channels, 1, 0, name="branch1")(g, train)
        g = resize_bilinear_align_corners(g, (h, w))
        # mid branch
        mid = ConvBnReLU(self.out_channels, 1, 0, name="mid")(x, train)
        # pyramid: 7x7, 5x5, 3x3 convs at /2, /4, /8 (adaptive pooling keeps
        # tiny feature maps legal)
        h2, w2 = max(h // 2, 1), max(w // 2, 1)
        h4, w4 = max(h // 4, 1), max(w // 4, 1)
        h8, w8 = max(h // 8, 1), max(w // 8, 1)
        x1 = adaptive_avg_pool2d(x, (h2, w2))
        x1 = ConvBnReLU(1, kernel_size=7, padding=3, name="down1_0")(x1, train)
        x2 = adaptive_avg_pool2d(x1, (h4, w4))
        x2 = ConvBnReLU(1, kernel_size=5, padding=2, name="down2_0")(x2, train)
        x3 = adaptive_avg_pool2d(x2, (h8, w8))
        x3 = ConvBnReLU(1, kernel_size=3, padding=1, name="down3_0")(x3, train)
        x3 = ConvBnReLU(1, kernel_size=3, padding=1, name="down3_1")(x3, train)
        x3 = resize_bilinear_align_corners(x3, (h4, w4))
        x2 = ConvBnReLU(1, kernel_size=5, padding=2, name="down2_1")(x2, train)
        xm = x2 + x3
        xm = resize_bilinear_align_corners(xm, (h2, w2))
        x1 = ConvBnReLU(1, kernel_size=7, padding=3, name="down1_1")(x1, train)
        xm = xm + x1
        xm = resize_bilinear_align_corners(xm, (h, w))
        out = mid * xm + g
        return out


class GAU(nn.Module):
    """Global attention upsample."""

    out_channels: int

    @nn.compact
    def __call__(self, x, y, train: bool = False):
        """x: low-level (big), y: high-level (small)."""
        h, w = x.shape[1:3]
        x_c = ConvBnReLU(self.out_channels, 3, 1, name="conv2")(x, train)
        g = jnp.mean(y, axis=(1, 2), keepdims=True)
        g = conv(self.out_channels, 1, name="conv1_0")(g)
        g = BatchNorm(self.out_channels, name="conv1_1")(g, train)
        g = jax.nn.sigmoid(g)
        y_up = resize_bilinear_align_corners(y, (h, w))
        return y_up + x_c * g


class PANDecoder(nn.Module):
    encoder_channels: Sequence[int]
    decoder_channels: int = 32

    @nn.compact
    def __call__(self, features: List[jnp.ndarray], train: bool = False):
        c2, c3, c4, c5 = features[-4:]
        x5 = FPA(self.decoder_channels, name="fpa")(c5, train)
        x4 = GAU(self.decoder_channels, name="gau3")(c4, x5, train)
        x3 = GAU(self.decoder_channels, name="gau2")(c3, x4, train)
        x2 = GAU(self.decoder_channels, name="gau1")(c2, x3, train)
        return x2


# ---------------------------------------------------------------------------
# DeepLabV3 / V3+ (reference: decoders/deeplabv3/decoder.py)
# ---------------------------------------------------------------------------


class ASPP(nn.Module):
    out_channels: int = 256
    atrous_rates: Tuple[int, int, int] = (12, 24, 36)
    separable: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        h, w = x.shape[1:3]
        branches = [
            ConvBnReLU(self.out_channels, 1, 0, name="b0")(x, train)
        ]
        for i, rate in enumerate(self.atrous_rates):
            if self.separable:
                y = conv(
                    x.shape[-1], 3, 1, rate, use_bias=False,
                    groups=x.shape[-1], dilation=rate, name=f"b{i+1}_dw",
                )(x)
                y = conv(self.out_channels, 1, use_bias=False, name=f"b{i+1}_pw")(y)
                y = BatchNorm(self.out_channels, name=f"b{i+1}_bn")(y, train)
                y = nn.relu(y)
            else:
                y = conv(
                    self.out_channels, 3, 1, rate, use_bias=False,
                    dilation=rate, name=f"b{i+1}_conv",
                )(x)
                y = BatchNorm(self.out_channels, name=f"b{i+1}_bn")(y, train)
                y = nn.relu(y)
            branches.append(y)
        # image pooling branch
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = ConvBnReLU(self.out_channels, 1, 0, name="pool")(g, train)
        g = resize_bilinear(g, (h, w))
        branches.append(g)
        y = jnp.concatenate(branches, axis=-1)
        y = ConvBnReLU(self.out_channels, 1, 0, name="project")(y, train)
        return y


class DeepLabV3Decoder(nn.Module):
    out_channels: int = 256
    atrous_rates: Tuple[int, int, int] = (12, 24, 36)

    @nn.compact
    def __call__(self, features: List[jnp.ndarray], train: bool = False):
        x = ASPP(self.out_channels, self.atrous_rates, name="aspp")(
            features[-1], train
        )
        x = ConvBnReLU(self.out_channels, 3, 1, name="conv")(x, train)
        return x


class DeepLabV3PlusDecoder(nn.Module):
    out_channels: int = 256
    atrous_rates: Tuple[int, int, int] = (12, 24, 36)
    output_stride: int = 16

    @nn.compact
    def __call__(self, features: List[jnp.ndarray], train: bool = False):
        x = ASPP(
            self.out_channels, self.atrous_rates, separable=True, name="aspp"
        )(features[-1], train)
        scale = self.output_stride // 4
        high = resize_bilinear(
            x, (x.shape[1] * scale, x.shape[2] * scale)
        )
        low = features[-4]  # C2 (stride 4)
        low = ConvBnReLU(48, 1, 0, name="block1")(low, train)
        y = jnp.concatenate([high, low], axis=-1)
        # separable 3x3
        y = conv(
            y.shape[-1], 3, 1, 1, use_bias=False, groups=y.shape[-1],
            name="block2_dw",
        )(y)
        y = conv(self.out_channels, 1, use_bias=False, name="block2_pw")(y)
        y = BatchNorm(self.out_channels, name="block2_bn")(y, train)
        return nn.relu(y)
