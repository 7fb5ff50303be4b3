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

from hallucidet_tpu.nn.layers import Attention, ConvBnReLU
from hallucidet_tpu.ops.image_ops import upsample_nearest


class DecoderBlock(nn.Module):
    """upsample x2 -> [concat skip -> attention1] -> conv1 -> conv2 -> attention2
    (reference: src/segmentation_models/decoders/unet/decoder.py:11-46)."""

    out_channels: int
    skip_channels: int = 0
    use_batchnorm: bool = True
    attention_type: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        skip: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
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
        for i, out_ch in enumerate(self.decoder_channels):
            skip = skips[i] if (self.use_skips and i < len(skips)) else None
            x = DecoderBlock(
                out_channels=out_ch,
                skip_channels=0 if skip is None else skip.shape[-1],
                use_batchnorm=self.use_batchnorm,
                attention_type=self.attention_type,
                name=f"block_{i}",
            )(x, skip, train)
        return x
