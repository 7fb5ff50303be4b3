"""hallucidet_tpu.translation — hallucination (modality-translation) nets."""

from hallucidet_tpu.translation.unet import Unet  # noqa: F401
from hallucidet_tpu.translation.encoder_decoder import (  # noqa: F401
    EncoderDecoder,
    create_model,
)
