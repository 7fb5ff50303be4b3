"""hallucidet_tpu.ops — XLA/Pallas detection op substrate.

TPU-native replacements for the torchvision C++/CUDA kernels the reference
consumes (SURVEY.md §2.4): boxes/IoU/box-coder, anchors, NMS, RoIAlign,
matcher/sampler, loss primitives, and on-device image ops.
"""

from hallucidet_tpu.ops import boxes, anchors, nms, roi_align, sampling, losses, image_ops  # noqa: F401
from hallucidet_tpu.ops.boxes import (  # noqa: F401
    box_area,
    box_iou,
    generalized_box_iou,
    clip_boxes_to_image,
    encode_boxes,
    decode_boxes,
    resize_boxes,
    remove_small_boxes_mask,
)
from hallucidet_tpu.ops.nms import nms_padded, batched_nms_padded, nms_keep_mask  # noqa: F401
from hallucidet_tpu.ops.roi_align import roi_align as roi_align_op  # noqa: F401
from hallucidet_tpu.ops.roi_align import multiscale_roi_align  # noqa: F401
