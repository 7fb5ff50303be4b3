"""hallucidet_tpu — TPU-native (JAX/XLA/Pallas) rebuild of HalluciDet.

An IR→RGB modality-translation framework trained through frozen RGB-pretrained
object detectors (Faster R-CNN / RetinaNet / FCOS), re-designed TPU-first:
static shapes, padded box tensors, one fused XLA program for the whole
translate+detect graph, and shard_map data parallelism over a device mesh.

Reference capability surface: heitorrapela/HalluciDet (see SURVEY.md).
"""

__version__ = "0.1.0"
