"""hallucidet_tpu.detection — frozen-detector heads with loss+detections in
one pure jitted function (the reference's L4 'privileged information' layer,
SURVEY.md §2.4, without the train/eval forward fork)."""

from hallucidet_tpu.detection.targets import Targets, Detections, pad_targets  # noqa: F401
from hallucidet_tpu.detection.transform import DetectionTransform  # noqa: F401
from hallucidet_tpu.detection.faster_rcnn import (  # noqa: F401
    FasterRCNN,
    FasterRCNNConfig,
)
from hallucidet_tpu.detection.retinanet import RetinaNet, RetinaNetConfig  # noqa: F401
from hallucidet_tpu.detection.fcos import FCOS, FCOSConfig  # noqa: F401
from hallucidet_tpu.detection.detector import Detector  # noqa: F401
