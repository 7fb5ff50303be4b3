"""hallucidet_tpu.nn — Flax building blocks (NHWC, TPU-first)."""

from hallucidet_tpu.nn import layers, resnet, fpn, unet_decoder, heads  # noqa: F401
from hallucidet_tpu.nn.resnet import ResNet, encoder_out_channels  # noqa: F401
from hallucidet_tpu.nn.fpn import FPN  # noqa: F401
from hallucidet_tpu.nn.unet_decoder import UnetDecoder  # noqa: F401
from hallucidet_tpu.nn.heads import SegmentationHead, ClassificationHead  # noqa: F401
