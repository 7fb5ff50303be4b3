"""hallucidet_tpu.data — dataset discovery, XML parsing, padded batching,
TPU-feeding loaders (SURVEY.md §2.6)."""

from hallucidet_tpu.data.annotations import get_bbox  # noqa: F401
from hallucidet_tpu.data.datasets import (  # noqa: F401
    MultiModalDetectionDataset,
    SingleModalDetectionDataset,
)
from hallucidet_tpu.data.loader import (  # noqa: F401
    DataLoader,
    MultiModalDataModule,
    SingleModalDataModule,
    split_dataset,
    split_indices,
)
from hallucidet_tpu.data.transforms import DetectorAugmentation  # noqa: F401
