"""The full smp model-zoo surface: one generic SegmentationModel assembling
encoder -> decoder -> segmentation head for every architecture the reference
vendors (reference: src/segmentation_models/__init__.py:7-15 exports Unet,
UnetModified, UnetPlusPlus, MAnet, Linknet, FPN, PSPNet, PAN, DeepLabV3,
DeepLabV3Plus).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from hallucidet_tpu.nn.heads import ClassificationHead, SegmentationHead
from hallucidet_tpu.nn.resnet import ENCODER_OUT_CHANNELS, ResNet
from hallucidet_tpu.nn.unet_decoder import UnetDecoder
from hallucidet_tpu.translation.decoders import (
    DeepLabV3Decoder,
    DeepLabV3PlusDecoder,
    FPNDecoder,
    LinknetDecoder,
    MAnetDecoder,
    PANDecoder,
    PSPDecoder,
    UnetPlusPlusDecoder,
)

# arch -> (decoder factory, head upsampling factor, encoder output_stride)
_SPECS = {
    "unetplusplus": dict(upsampling=1, output_stride=32),
    "manet": dict(upsampling=1, output_stride=32),
    "linknet": dict(upsampling=1, output_stride=32, head_kernel=1),
    "fpn": dict(upsampling=4, output_stride=32),
    "pspnet": dict(upsampling=32, output_stride=32),
    "pan": dict(upsampling=4, output_stride=16),
    "deeplabv3": dict(upsampling=8, output_stride=8),
    "deeplabv3plus": dict(upsampling=4, output_stride=16),
}


class SegmentationModel(nn.Module):
    """Generic encoder-decoder-head assembly (reference:
    src/segmentation_models/base/model.py:5-56)."""

    arch: str
    encoder_name: str = "resnet34"
    classes: int = 3
    head: str = "sigmoid"
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    decoder_use_batchnorm: bool = True
    decoder_attention_type: Optional[str] = None
    aux_classes: Optional[int] = None

    def _check_input_shape(self, x):
        spec = _SPECS[self.arch]
        stride = 32  # encoders are full-depth; dilated ones need /32 too
        h, w = x.shape[1:3]
        if h % stride != 0 or w % stride != 0:
            raise ValueError(
                f"input H/W ({h}, {w}) must be divisible by {stride}"
            )

    @nn.compact
    def __call__(self, x, train: bool = False, dropout_rng=None):
        from hallucidet_tpu.nn.encoders import get_encoder

        self._check_input_shape(x)
        spec = _SPECS[self.arch]
        encoder, enc_channels, _ = get_encoder(
            self.encoder_name, output_stride=spec["output_stride"]
        )
        features: List[jnp.ndarray] = encoder.copy(name="encoder")(x, train)

        if self.arch == "unetplusplus":
            decoded = UnetPlusPlusDecoder(
                encoder_channels=enc_channels,
                decoder_channels=self.decoder_channels,
                use_batchnorm=self.decoder_use_batchnorm,
                attention_type=self.decoder_attention_type,
                name="decoder",
            )(features, train)
        elif self.arch == "manet":
            decoded = MAnetDecoder(
                encoder_channels=enc_channels,
                decoder_channels=self.decoder_channels,
                use_batchnorm=self.decoder_use_batchnorm,
                name="decoder",
            )(features, train)
        elif self.arch == "linknet":
            decoded = LinknetDecoder(
                encoder_channels=enc_channels,
                use_batchnorm=self.decoder_use_batchnorm,
                name="decoder",
            )(features, train)
        elif self.arch == "fpn":
            decoded = FPNDecoder(
                encoder_channels=enc_channels, name="decoder"
            )(features, train, dropout_rng)
        elif self.arch == "pspnet":
            decoded = PSPDecoder(name="decoder")(features, train, dropout_rng)
        elif self.arch == "pan":
            decoded = PANDecoder(
                encoder_channels=enc_channels, name="decoder"
            )(features, train)
        elif self.arch == "deeplabv3":
            decoded = DeepLabV3Decoder(name="decoder")(features, train)
        elif self.arch == "deeplabv3plus":
            decoded = DeepLabV3PlusDecoder(name="decoder")(features, train)
        else:
            raise ValueError(f"unknown arch {self.arch}")

        masks = SegmentationHead(
            out_channels=self.classes,
            upsampling=spec["upsampling"],
            kernel_size=spec.get("head_kernel", 3),
            head=self.head,
            name="segmentation_head",
        )(decoded, train, dropout_rng)
        if self.aux_classes is not None:
            labels = ClassificationHead(
                classes=self.aux_classes, name="classification_head"
            )(features[-1], train, dropout_rng)
            return masks, labels
        return masks
