"""FLIR dataset discovery/remapping/filter tests (the trickiest data path)."""

import numpy as np
import pytest

from hallucidet_tpu.data import MultiModalDetectionDataset, SingleModalDetectionDataset

from data_fixtures import make_flir


@pytest.fixture(scope="module")
def flir_root(tmp_path_factory):
    return make_flir(str(tmp_path_factory.mktemp("flir")))


def test_flir_multimodal_train(flir_root):
    ds = MultiModalDetectionDataset(
        "flir", flir_root, flir_root, ext=".jpg", train=True
    )
    assert len(ds) == 4
    rgb, t_rgb, ir, t_ir = ds[0]
    assert rgb.shape == (64, 80, 3)
    assert ir.shape == (64, 80, 1)
    # train filter: area > 10 keeps the two larger person boxes
    assert t_ir["boxes"].shape == (2, 4)


def test_flir_test_height_filter(flir_root):
    ds = MultiModalDetectionDataset(
        "flir", flir_root, flir_root, ext=".jpg", train=False
    )
    assert len(ds) == 3
    _, t_rgb, _, t_ir = ds[0]
    # test filter: height > 50 keeps only the tall box
    assert t_ir["boxes"].shape == (1, 4)
    np.testing.assert_allclose(t_ir["boxes"][0], [4, 4, 30, 60])


def test_flir_single_modal_rgb(flir_root):
    ds = SingleModalDetectionDataset(
        "flir", flir_root, modality="rgb", ext=".jpg", train=True
    )
    img, target = ds[0]
    assert img.shape == (64, 80, 3)
    assert (target["labels"] == 1).all()
