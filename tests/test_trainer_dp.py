"""Trainer(n_devices=8): the PRODUCT epoch loop (fit/test) runs data-parallel
over the mesh — params replicated, batches sharded, identical metrics to the
single-device loop (the CLI `--n-devices` path)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hallucidet_tpu.detection import FasterRCNN, FasterRCNNConfig, pad_targets
from hallucidet_tpu.train import HalluciDetModule, HalluciDetTrainConfig
from hallucidet_tpu.train.trainer import Trainer

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the CPU-8 mesh"
)

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


def _batch(b=8):
    rng = np.random.RandomState(0)
    rgb = jnp.asarray(rng.rand(b, 64, 64, 3).astype(np.float32))
    ir = jnp.asarray(rng.rand(b, 64, 64, 1).astype(np.float32))
    t = pad_targets(
        [np.array([[8, 8, 40, 48]], np.float32)] * b, [np.array([1])] * b, 4
    )
    return rgb, t, ir, t


def _module():
    cfg = HalluciDetTrainConfig(
        detector="fasterrcnn", decoder_backbone="resnet18", input_size=64,
    )
    m = HalluciDetModule(cfg, jax.random.PRNGKey(0), sample_hw=(64, 64))
    m.detector.impl = FasterRCNN(SMALL_DET, image_size=(64, 64))
    m.det_variables = m.detector.impl.init(jax.random.PRNGKey(1))
    return m


def test_trainer_dp_matches_single_device():
    dm = _FakeDM(_batch())
    h1 = Trainer(max_epochs=1, n_devices=1).fit_hallucidet(_module(), dm)
    h8 = Trainer(max_epochs=1, n_devices=8).fit_hallucidet(_module(), dm)
    np.testing.assert_allclose(
        h8["valid/loss/total"], h1["valid/loss/total"], rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        h8["valid/metrics/map_hall"], h1["valid/metrics/map_hall"],
        rtol=1e-6, atol=1e-9,
    )


def test_trainer_dp_test_path():
    m = _module()
    dm = _FakeDM(_batch())
    r1 = Trainer(max_epochs=0, n_devices=1).test_hallucidet(m, dm)
    r8 = Trainer(max_epochs=0, n_devices=8).test_hallucidet(m, dm)
    np.testing.assert_allclose(
        r8["map_hall"]["map_50"], r1["map_hall"]["map_50"], atol=1e-9
    )
