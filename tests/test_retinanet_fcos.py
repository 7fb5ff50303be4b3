"""RetinaNet and FCOS pipeline smoke tests (small geometry for CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from hallucidet_tpu.detection import (
    FCOS,
    FCOSConfig,
    RetinaNet,
    RetinaNetConfig,
    pad_targets,
)

RN_SMALL = RetinaNetConfig(
    num_classes=2,
    backbone="resnet18",
    topk_candidates=50,
    detections_per_img=20,
    nms_candidate_cap=256,
)
FCOS_SMALL = FCOSConfig(
    num_classes=2,
    backbone="resnet18",
    topk_candidates=50,
    detections_per_img=20,
    nms_candidate_cap=256,
)


def make_inputs(batch=1, hw=(96, 96)):
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(batch, *hw, 3).astype(np.float32))
    targets = pad_targets(
        [np.array([[10, 20, 60, 80]], np.float32)] * batch,
        [np.array([1])] * batch,
        capacity=4,
    )
    return images, targets


def test_retinanet_forward():
    det = RetinaNet(RN_SMALL, image_size=(64, 64))
    assert det.level_shapes() == [(8, 8), (4, 4), (2, 2), (1, 1), (1, 1)]
    images, targets = make_inputs()
    v = det.init(jax.random.PRNGKey(0))
    losses, dets = det.forward(v, images, targets)
    assert set(losses) == {"classification", "bbox_regression"}
    for k, val in losses.items():
        assert np.isfinite(float(val)), k
    assert dets.boxes.shape == (1, 20, 4)


def test_retinanet_gradient_to_image():
    det = RetinaNet(RN_SMALL, image_size=(64, 64))
    images, targets = make_inputs()
    v = det.init(jax.random.PRNGKey(0))

    def loss_fn(im):
        losses, _ = det.forward(jax.lax.stop_gradient(v), im, targets)
        return sum(losses.values())

    g = jax.grad(loss_fn)(images)
    assert np.isfinite(float(jnp.linalg.norm(g))) and float(jnp.abs(g).max()) > 0


def test_fcos_forward():
    det = FCOS(FCOS_SMALL, image_size=(64, 64))
    images, targets = make_inputs()
    v = det.init(jax.random.PRNGKey(0))
    losses, dets = det.forward(v, images, targets)
    assert set(losses) == {"classification", "bbox_regression", "bbox_ctrness"}
    for k, val in losses.items():
        assert np.isfinite(float(val)), k
    assert dets.boxes.shape == (1, 20, 4)


def test_fcos_empty_targets():
    det = FCOS(FCOS_SMALL, image_size=(64, 64))
    images, _ = make_inputs()
    targets = pad_targets([np.zeros((0, 4), np.float32)], [np.zeros(0)], capacity=4)
    v = det.init(jax.random.PRNGKey(0))
    losses, _ = det.forward(v, images, targets)
    for k, val in losses.items():
        assert np.isfinite(float(val)), k


def test_phase_form_transform_equality_retinanet_fcos():
    """phase_form=True through the detector wrapper matches the
    full-resolution path for the anchor-free detectors too."""
    import numpy as np
    from hallucidet_tpu.ops.fused_upsample import space_to_depth2

    img = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
    ph = space_to_depth2(img)
    t = pad_targets([np.array([[8, 8, 40, 48]], np.float32)], [[1]], 4)
    for det in (
        RetinaNet(RN_SMALL, image_size=(32, 32)),
        FCOS(FCOS_SMALL, image_size=(32, 32)),
    ):
        v = det.init(jax.random.PRNGKey(1))
        la, da = det.forward(v, img, t)
        lb, db = det.forward(v, ph, t, phase_form=True)
        for k in la:
            np.testing.assert_allclose(
                float(lb[k]), float(la[k]), rtol=1e-5, atol=1e-6, err_msg=k
            )
        np.testing.assert_allclose(
            np.asarray(db.boxes), np.asarray(da.boxes), atol=1e-3
        )
