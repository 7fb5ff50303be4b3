"""hallucidet_tpu.metrics — COCO-style detection metrics (host-side numpy)."""

from hallucidet_tpu.metrics.mean_ap import (  # noqa: F401
    Detection,
    MeanAveragePrecision,
    iou_bboxes,
)
