"""Faster R-CNN pipeline tests: shapes, loss validity, gradient flow into the
input image (the property HalluciDet training depends on)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hallucidet_tpu.detection import FasterRCNN, FasterRCNNConfig, pad_targets

# Small geometry to keep CPU-test compile times sane.
SMALL = FasterRCNNConfig(
    num_classes=2,
    backbone="resnet18",
    rpn_pre_nms_top_n_train=200,
    rpn_pre_nms_top_n_test=100,
    rpn_post_nms_top_n_train=100,
    rpn_post_nms_top_n_test=50,
    rpn_nms_candidate_cap=512,
    box_batch_size_per_image=64,
    box_detections_per_img=20,
)


def make_detector():
    return FasterRCNN(SMALL, image_size=(64, 64))


def make_inputs(batch=2, hw=(128, 160)):
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(batch, *hw, 3).astype(np.float32))
    targets = pad_targets(
        [
            np.array([[10, 20, 60, 90], [50, 30, 100, 120]], np.float32),
            np.array([[5, 5, 40, 40]], np.float32),
        ],
        [np.array([1, 1]), np.array([1])],
        capacity=8,
    )
    return images, targets


def test_level_shapes_and_anchors():
    det = make_detector()
    shapes = det.level_shapes()
    assert shapes == [(16, 16), (8, 8), (4, 4), (2, 2), (1, 1)]
    anchors = det.anchors()
    assert anchors.shape == (3 * (256 + 64 + 16 + 4 + 1), 4)


def test_forward_losses_and_detections():
    det = make_detector()
    images, targets = make_inputs()
    variables = det.init(jax.random.PRNGKey(0))

    losses, dets = jax.jit(
        lambda v, im, tg: det.forward(v, im, tg, train_det=False,
                                      rng=jax.random.PRNGKey(1))
    )(variables, images, targets)

    assert set(losses) == {
        "loss_classifier",
        "loss_box_reg",
        "loss_objectness",
        "loss_rpn_box_reg",
    }
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
        assert float(v) >= 0, k
    b, d = dets.boxes.shape[:2]
    assert (b, d) == (2, SMALL.box_detections_per_img)
    # detections are in ORIGINAL image coords (128x160)
    ob = np.asarray(dets.boxes)
    assert ob[..., 0].min() >= 0 and ob[..., 2].max() <= 160 + 1e-3
    assert ob[..., 3].max() <= 128 + 1e-3
    # scores sorted desc among valid
    ov, os_ = np.asarray(dets.valid), np.asarray(dets.scores)
    for i in range(2):
        s = os_[i][ov[i]]
        assert (np.diff(s) <= 1e-6).all()


def test_gradient_flows_to_image_not_detector():
    det = make_detector()
    images, targets = make_inputs(batch=1, hw=(96, 96))
    targets = jax.tree_util.tree_map(lambda x: x[:1], targets)
    variables = det.init(jax.random.PRNGKey(0))

    def loss_fn(im):
        losses, _ = det.forward(
            jax.lax.stop_gradient(variables), im, targets, rng=jax.random.PRNGKey(1)
        )
        return sum(losses.values())

    g = jax.grad(loss_fn)(images)
    gnorm = float(jnp.linalg.norm(g))
    assert np.isfinite(gnorm) and gnorm > 0  # loss differentiates w.r.t. pixels


def test_empty_targets_no_nan():
    det = make_detector()
    images, _ = make_inputs(batch=1, hw=(96, 96))
    targets = pad_targets([np.zeros((0, 4), np.float32)], [np.zeros(0)], capacity=8)
    losses, dets = det.forward(
        det.init(jax.random.PRNGKey(0)), images, targets, rng=jax.random.PRNGKey(1)
    )
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
