"""Trainer.fit_hallucidet with cfg.train_det=True (advisor r2 medium):
the combined {ed, det} param state must build, train, evaluate with the
UPDATED detector params, and checkpoint-split back into ed/det."""

import numpy as np
import jax
import jax.numpy as jnp

from hallucidet_tpu.detection import FasterRCNN, FasterRCNNConfig, pad_targets
from hallucidet_tpu.train import HalluciDetModule, HalluciDetTrainConfig
from hallucidet_tpu.train.trainer import Trainer

SMALL_DET = FasterRCNNConfig(
    num_classes=2, backbone="resnet18",
    rpn_pre_nms_top_n_train=64, rpn_pre_nms_top_n_test=64,
    rpn_post_nms_top_n_train=32, rpn_post_nms_top_n_test=32,
    rpn_nms_candidate_cap=128, box_batch_size_per_image=16,
    box_detections_per_img=5,
)


class _FakeDM:
    def __init__(self, batch):
        self._batch = batch

    def train_dataloader(self):
        return [self._batch]

    def val_dataloader(self):
        return [self._batch]

    def test_dataloader(self):
        return [self._batch]


def _batch(b=1):
    rng = np.random.RandomState(0)
    rgb = jnp.asarray(rng.rand(b, 64, 64, 3).astype(np.float32))
    ir = jnp.asarray(rng.rand(b, 64, 64, 1).astype(np.float32))
    t = pad_targets(
        [np.array([[8, 8, 40, 48]], np.float32)] * b, [np.array([1])] * b, 4
    )
    return rgb, t, ir, t


def _module(train_det):
    cfg = HalluciDetTrainConfig(
        detector="fasterrcnn", decoder_backbone="resnet18", input_size=64,
        train_det=train_det,
    )
    m = HalluciDetModule(cfg, jax.random.PRNGKey(0), sample_hw=(64, 64))
    m.detector.impl = FasterRCNN(SMALL_DET, image_size=(64, 64))
    m.det_variables = m.detector.impl.init(jax.random.PRNGKey(1))
    # rebuild the optimizer state over the detector actually under test
    if train_det:
        m.opt_state = m.tx.init(
            {"ed": m.ed_variables["params"], "det": m.det_variables["params"]}
        )
    return m


def test_fit_hallucidet_train_det_true():
    m = _module(train_det=True)
    det_before = jax.tree_util.tree_map(
        lambda t: np.asarray(t), m.det_variables["params"]
    )
    trainer = Trainer(max_epochs=1)
    history = trainer.fit_hallucidet(m, _FakeDM(_batch()))
    assert np.isfinite(history["valid/loss/total"])
    # detector params were trained and written back to the module
    moved = any(
        float(jnp.abs(jnp.asarray(a) - b).max()) > 0
        for a, b in zip(
            jax.tree_util.tree_leaves(m.det_variables["params"]),
            jax.tree_util.tree_leaves(det_before),
        )
    )
    assert moved, "train_det=True did not update detector params via Trainer"
    # test path consumes the trained detector without error
    res = trainer.test_hallucidet(m, _FakeDM(_batch()))
    assert "map_hall" in res


def test_fit_hallucidet_train_det_false_still_works():
    m = _module(train_det=False)
    trainer = Trainer(max_epochs=1)
    history = trainer.fit_hallucidet(m, _FakeDM(_batch()))
    assert np.isfinite(history["valid/loss/total"])
