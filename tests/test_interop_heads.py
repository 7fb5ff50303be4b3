"""Converter key-map totality for RetinaNet and FCOS variable trees."""

import numpy as np
import jax
import jax.numpy as jnp

from hallucidet_tpu.detection import FCOS, FCOSConfig, RetinaNet, RetinaNetConfig
from hallucidet_tpu.interop import torch_loader as tl
from hallucidet_tpu.interop.torch_loader import convert_into_variables


def _roundtrip(variables, detector):
    fcos_gn = detector == "fcos"
    sd = {}
    flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    for kp, leaf in flat:
        segs = [p.key for p in kp]
        tkey = (
            tl._segments_to_torch(segs[:-1], detector=detector, fcos_gn=fcos_gn)
            + "."
            + tl._PARAM_SUFFIX.get(segs[-1], segs[-1])
        )
        arr = np.asarray(leaf)
        tf = tl._leaf_transform(segs[:-1], segs[-1], arr.shape)
        if tf == "conv":
            arr = arr.transpose(3, 2, 0, 1)
        elif tf in ("dense", "fc6"):
            arr = arr.transpose(1, 0)
        assert tkey not in sd, f"duplicate torch key {tkey}"
        sd[tkey] = arr
    new_vars, loaded, missing = convert_into_variables(
        dict(variables), sd, detector=detector
    )
    assert missing == [], missing[:10]
    for a, b in zip(
        jax.tree_util.tree_leaves(variables), jax.tree_util.tree_leaves(new_vars)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    return sd


def test_retinanet_key_map_total():
    det = RetinaNet(
        RetinaNetConfig(num_classes=2, backbone="resnet18"), image_size=(64, 64)
    )
    sd = _roundtrip(det.init(jax.random.PRNGKey(0)), "retinanet")
    assert "head.classification_head.conv.0.weight" in sd
    assert "head.classification_head.cls_logits.weight" in sd
    assert "head.regression_head.bbox_reg.bias" in sd
    assert "backbone.fpn.extra_blocks.p6.weight" in sd


def test_fcos_key_map_total():
    det = FCOS(FCOSConfig(num_classes=2, backbone="resnet18"), image_size=(64, 64))
    sd = _roundtrip(det.init(jax.random.PRNGKey(0)), "fcos")
    # GroupNorm interleaved towers: conv at 3i, gn at 3i+1
    assert "head.classification_head.conv.0.weight" in sd
    assert "head.classification_head.conv.1.weight" in sd  # GN scale
    assert "head.regression_head.bbox_ctrness.weight" in sd
