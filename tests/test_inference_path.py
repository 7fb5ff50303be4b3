"""Serving (no-target) inference path tests for all three detector families."""

import numpy as np
import jax
import jax.numpy as jnp

from hallucidet_tpu.detection import (
    FCOS, FCOSConfig, FasterRCNN, FasterRCNNConfig, RetinaNet, RetinaNetConfig,
)

SMALL_FRCNN = FasterRCNNConfig(
    num_classes=2, backbone="resnet18",
    rpn_pre_nms_top_n_test=64, rpn_post_nms_top_n_test=32,
    rpn_nms_candidate_cap=128, box_detections_per_img=5,
)


def test_fasterrcnn_infer():
    det = FasterRCNN(SMALL_FRCNN, image_size=(64, 64))
    v = det.init(jax.random.PRNGKey(0))
    images = jax.random.uniform(jax.random.PRNGKey(1), (2, 96, 96, 3))
    dets = jax.jit(lambda v, im: det.infer(v, im))(v, images)
    assert dets.boxes.shape == (2, 5, 4)
    ob = np.asarray(dets.boxes)
    assert ob[..., 2].max() <= 96 + 1e-3  # original frame coords
    assert np.asarray(dets.scores).min() >= 0


def test_fasterrcnn_infer_fast_serving():
    """fast=True shrinks the post-NMS pool to serving_post_nms_top_n."""
    import dataclasses

    det = FasterRCNN(SMALL_FRCNN, image_size=(64, 64))
    v = det.init(jax.random.PRNGKey(0))
    images = jax.random.uniform(jax.random.PRNGKey(1), (2, 96, 96, 3))
    # fast=True == stock infer with rpn_post_nms_top_n_test replaced by the
    # serving pool
    fast = det.infer(v, images, fast=True)
    det_eq = FasterRCNN(
        dataclasses.replace(
            SMALL_FRCNN,
            rpn_post_nms_top_n_test=SMALL_FRCNN.serving_post_nms_top_n,
        ),
        image_size=(64, 64),
    )
    want = det_eq.infer(v, images)
    np.testing.assert_allclose(
        np.asarray(fast.boxes), np.asarray(want.boxes), atol=1e-5
    )
    # a genuinely smaller pool still yields valid detections
    det2 = FasterRCNN(
        dataclasses.replace(SMALL_FRCNN, serving_post_nms_top_n=8),
        image_size=(64, 64),
    )
    small = det2.infer(v, images, fast=True)
    assert small.boxes.shape == (2, 5, 4)
    assert np.isfinite(np.asarray(small.scores)).all()
    # Detector wrapper surface
    from hallucidet_tpu.detection import Detector

    d = Detector(name="fasterrcnn", n_classes=2, size=64)
    d.impl = det
    out = d.predict(v, images, fast=True)
    assert out.boxes.shape == (2, 5, 4)


def test_retinanet_infer():
    det = RetinaNet(
        RetinaNetConfig(num_classes=2, backbone="resnet18", topk_candidates=20,
                        detections_per_img=5, nms_candidate_cap=128),
        image_size=(64, 64),
    )
    v = det.init(jax.random.PRNGKey(0))
    images = jax.random.uniform(jax.random.PRNGKey(1), (1, 96, 96, 3))
    dets = det.infer(v, images)
    assert dets.boxes.shape == (1, 5, 4)


def test_fcos_infer():
    det = FCOS(
        FCOSConfig(num_classes=2, backbone="resnet18", topk_candidates=20,
                   detections_per_img=5, nms_candidate_cap=128),
        image_size=(64, 64),
    )
    v = det.init(jax.random.PRNGKey(0))
    images = jax.random.uniform(jax.random.PRNGKey(1), (1, 96, 96, 3))
    dets = det.infer(v, images)
    assert dets.boxes.shape == (1, 5, 4)


def test_detector_predict_flag_matrix():
    """Detector.predict accepts every (fast, half) combination for every
    family — fast is Faster-R-CNN-only (others have no proposal pool) and
    must be silently inert for them; half runs everywhere (round 5)."""
    from hallucidet_tpu.detection.detector import Detector

    images = jax.random.uniform(jax.random.PRNGKey(1), (1, 96, 96, 3))
    for family in ("fasterrcnn", "retinanet", "fcos"):
        det = Detector(name=family, n_classes=2, size=64)
        v = det.init(jax.random.PRNGKey(0))
        for fast in (False, True):
            for half in (False, True):
                dets = det.predict(v, images, fast=fast, half=half)
                assert dets.boxes.dtype == jnp.float32, (family, fast, half)
                assert bool(jnp.all(jnp.isfinite(dets.scores))), (
                    family, fast, half)
