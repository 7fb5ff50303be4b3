"""EncoderDecoder — the hallucination-network wrapper + model factory.

Rebuild of the reference wrapper (reference: src/models/encoder_decoder.py:8-53)
and the smp `create_model` factory (reference:
src/segmentation_models/__init__.py:24-64). Returns a Flax module plus helpers
for init and ImageNet normalization.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from hallucidet_tpu.ops.image_ops import imagenet_normalize
from hallucidet_tpu.translation.unet import Unet

_UNET_ARCHS = {
    "unet": dict(use_skips=True),
    "unetmodified": dict(use_skips=False),
}
_ZOO_ARCHS = (
    "unetplusplus", "manet", "linknet", "fpn", "pspnet", "pan",
    "deeplabv3", "deeplabv3plus",
)


def create_model(
    arch: str = "unet",
    encoder_name: str = "resnet34",
    in_channels: int = 3,
    classes: int = 3,
    **kwargs: Any,
):
    """smp-style factory over the full decoder zoo (reference:
    src/segmentation_models/__init__.py:24-64). `in_channels` must be 3 (IR
    input is expanded 1ch->3ch upstream, reference: src/utils/utils.py:51-53)."""
    arch = arch.lower().replace("++", "plusplus")
    # Flax convs infer input channels at init, so any in_channels works
    # structurally; adapting converted ImageNet weights to != 3 channels is
    # interop.patch_first_conv (smp _utils.patch_first_conv semantics).
    if in_channels <= 0:
        raise ValueError("in_channels must be positive")
    if arch in _UNET_ARCHS:
        return Unet(
            encoder_name=encoder_name, classes=classes, **_UNET_ARCHS[arch], **kwargs
        )
    if arch in _ZOO_ARCHS:
        from hallucidet_tpu.translation.models import SegmentationModel

        return SegmentationModel(
            arch=arch, encoder_name=encoder_name, classes=classes, **kwargs
        )
    raise ValueError(
        f"unknown translation arch '{arch}'; available: "
        f"{sorted(_UNET_ARCHS) + sorted(_ZOO_ARCHS)}"
    )


class EncoderDecoder:
    """Convenience wrapper mirroring the reference constructor surface
    (name/encoder_depth/decoder_attention_type/in_channels/output_channels/
    segmentation_head/dropout/avg2d_flag)."""

    def __init__(
        self,
        name: str = "resnet34",
        encoder_depth: int = 5,
        encoder_weights: Optional[str] = None,
        decoder_attention_type: Optional[str] = None,
        in_channels: int = 3,
        output_channels: int = 3,
        segmentation_head: str = "sigmoid",
        dropout: float = 0.2,
        avg2d_flag: bool = True,
        arch: str = "unet",
    ):
        if not 3 <= encoder_depth <= 5:
            raise ValueError("encoder_depth must be in [3, 5]")
        # depth < 5: the default decoder_channels prefix, matching smp's
        # documented pairing (e.g. depth 4 -> (256, 128, 64, 32)); the
        # reference wrapper itself never passes decoder_channels, so this is
        # the only self-consistent choice (decoders/unet/model.py:21-28).
        depth_kw = (
            {"encoder_depth": encoder_depth,
             "decoder_channels": (256, 128, 64, 32, 16)[:encoder_depth]}
            if encoder_depth != 5 else {}
        )
        self.module = create_model(
            arch=arch,
            encoder_name=name,
            in_channels=in_channels,
            classes=output_channels,
            decoder_attention_type=decoder_attention_type,
            head=segmentation_head,
            **depth_kw,
        )
        # The reference's encoder_weights='imagenet' downloads upstream
        # checkpoints at construction (encoders/__init__.py:62-85). Zero-
        # egress equivalent: a path to a scripts/convert_encoder.py .npz
        # artifact, merged into the init tree below; the literal string
        # 'imagenet' raises with instructions rather than silently running
        # random weights.
        self.encoder_weights = encoder_weights
        self.encoder_name = name

    def init(self, rng: jax.Array, sample_hw: Tuple[int, int] = (512, 640)):
        x = jnp.zeros((1, sample_hw[0], sample_hw[1], 3), jnp.float32)
        variables = self.module.init(rng, x, False)
        if self.encoder_weights:
            if not str(self.encoder_weights).endswith(".npz"):
                raise ValueError(
                    "encoder_weights must be a scripts/convert_encoder.py "
                    ".npz artifact in this zero-egress build (got "
                    f"{self.encoder_weights!r}); convert the upstream "
                    "checkpoint offline first"
                )
            from hallucidet_tpu.interop import (
                load_encoder_npz, merge_encoder_variables,
            )

            variables = merge_encoder_variables(
                dict(variables), load_encoder_npz(self.encoder_weights)
            )
        return variables

    def apply(self, variables, images, train: bool = False, rngs=None, **kw):
        return self.module.apply(
            variables,
            images,
            train,
            rngs=rngs,
            mutable=["batch_stats"] if train else False,
            **kw,
        )

    @staticmethod
    def normalization(images: jnp.ndarray) -> jnp.ndarray:
        """ImageNet normalization (reference: src/models/encoder_decoder.py:47-53)."""
        return imagenet_normalize(images)
