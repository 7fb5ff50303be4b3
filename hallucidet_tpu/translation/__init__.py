"""hallucidet_tpu.translation — hallucination (modality-translation) nets and
the full smp model-zoo surface (SURVEY.md §2.5): 10 decoder archs, seg
losses/metrics, generic train utils, classic IR preprocessing baseline."""

from hallucidet_tpu.translation.unet import Unet  # noqa: F401
from hallucidet_tpu.translation.encoder_decoder import (  # noqa: F401
    EncoderDecoder,
    create_model,
)
from hallucidet_tpu.translation.models import SegmentationModel  # noqa: F401
from hallucidet_tpu.translation.cnn_based_da import (  # noqa: F401
    CnnBasedThermalInfraredDA,
)
from hallucidet_tpu.translation import (  # noqa: F401
    decoders,
    ir_preproc,
    seg_losses,
    seg_metrics,
    train_utils,
)
