"""U-Net decoder with deterministic nearest upsampling, NHWC Flax.

Rebuild of the reference's vendored smp UnetDecoder — including its one
behavioral fork from upstream smp: all upsampling is the deterministic
pixel-repeat (reference: src/segmentation_models/decoders/unet/decoder.py:7-8)
— plus the skip-less `UnetModifiedDecoder` variant (reference:
src/segmentation_models/decoders/unetmodified/decoder.py).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from flax import linen as fnn

from hallucidet_tpu.nn.layers import Attention, BatchNorm, ConvBnReLU
from hallucidet_tpu.ops.fused_upsample import upsample2_concat_conv3x3
from hallucidet_tpu.ops.image_ops import upsample_nearest


class _UpConcatConv(nn.Module):
    """Param-holder for the fused upsample+concat+conv3x3 (ops/fused_upsample).
    Parameter layout is identical to nn.Conv ('kernel'[3,3,Cin,O], 'bias'),
    so checkpoints are interchangeable with the unfused path."""

    features: int
    use_bias: bool = False

    @nn.compact
    def __call__(self, x_coarse, skip):
        cin = x_coarse.shape[-1] + (0 if skip is None else skip.shape[-1])
        kernel = self.param(
            "kernel", fnn.initializers.lecun_normal(), (3, 3, cin, self.features)
        )
        bias = (
            self.param("bias", fnn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        return upsample2_concat_conv3x3(x_coarse, skip, kernel, bias)


class FusedUpConvBnReLU(nn.Module):
    """Fused upsample+concat+conv -> BN -> ReLU with the same param tree as
    ConvBnReLU ('0' conv, '1' batchnorm)."""

    features: int
    use_batchnorm: bool = True

    @nn.compact
    def __call__(self, x_coarse, skip, train: bool = False):
        x = _UpConcatConv(
            self.features, use_bias=not self.use_batchnorm, name="0"
        )(x_coarse, skip)
        if self.use_batchnorm:
            x = BatchNorm(self.features, name="1")(x, train)
        return nn.relu(x)


class DecoderBlock(nn.Module):
    """upsample x2 -> [concat skip -> attention1] -> conv1 -> conv2 -> attention2
    (reference: src/segmentation_models/decoders/unet/decoder.py:11-46).

    With no attention (the HalluciDet config), the upsample+concat+conv1 runs
    as the exact fused phase-conv (ops/fused_upsample.py) — no full-resolution
    intermediates; same parameters, same output up to float reassociation.
    """

    out_channels: int
    skip_channels: int = 0
    use_batchnorm: bool = True
    attention_type: Optional[str] = None
    # Exact fused phase-conv path exists (ops/fused_upsample.py) but measured
    # slower than XLA's own fusion on v5e; off by default.
    fused: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        skip: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        if self.fused and self.attention_type is None:
            x = FusedUpConvBnReLU(
                self.out_channels, use_batchnorm=self.use_batchnorm, name="conv1"
            )(x, skip, train)
        else:
            x = upsample_nearest(x, 2)
            if skip is not None:
                x = jnp.concatenate([x, skip], axis=-1)
                x = Attention(
                    self.attention_type, in_channels=x.shape[-1], name="attention1"
                )(x)
            x = ConvBnReLU(
                self.out_channels, use_batchnorm=self.use_batchnorm, name="conv1"
            )(x, train)
        x = ConvBnReLU(
            self.out_channels, use_batchnorm=self.use_batchnorm, name="conv2"
        )(x, train)
        x = Attention(
            self.attention_type, in_channels=self.out_channels, name="attention2"
        )(x)
        return x


class CenterBlock(nn.Module):
    """Two ConvBnReLU, used only for VGG-style encoders (center=True)."""

    out_channels: int
    use_batchnorm: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = ConvBnReLU(self.out_channels, use_batchnorm=self.use_batchnorm, name="0")(
            x, train
        )
        x = ConvBnReLU(self.out_channels, use_batchnorm=self.use_batchnorm, name="1")(
            x, train
        )
        return x


class UnetDecoder(nn.Module):
    """Takes the smp 6-feature encoder list; deepest feature is the head,
    shallower ones are skips, the final block upsamples skip-less to input
    resolution (reference: src/segmentation_models/decoders/unet/decoder.py:
    78-124)."""

    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    use_batchnorm: bool = True
    attention_type: Optional[str] = None
    center: bool = False
    use_skips: bool = True  # False => UnetModified (skip connections removed)
    fused: bool = False  # exact fused upsample+concat+conv (ops/fused_upsample)
    remat: bool = False  # rematerialize blocks (see nn/resnet.py ResNet.remat)

    @nn.compact
    def __call__(
        self, features: List[jnp.ndarray], train: bool = False
    ) -> jnp.ndarray:
        feats = features[1:][::-1]  # drop input image, deepest first
        head, skips = feats[0], feats[1:]
        x = head
        if self.center:
            x = CenterBlock(
                head.shape[-1], use_batchnorm=self.use_batchnorm, name="center"
            )(x, train)
        block_cls = (
            nn.remat(DecoderBlock, static_argnums=(3,))
            if self.remat
            else DecoderBlock
        )
        for i, out_ch in enumerate(self.decoder_channels):
            skip = skips[i] if (self.use_skips and i < len(skips)) else None
            x = block_cls(
                out_channels=out_ch,
                skip_channels=0 if skip is None else skip.shape[-1],
                use_batchnorm=self.use_batchnorm,
                attention_type=self.attention_type,
                fused=self.fused,
                name=f"block_{i}",
            )(x, skip, train)
        return x
