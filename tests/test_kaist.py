"""KAIST dataset tests: list discovery, xywh->xyxy, empty-frame filter."""

import numpy as np
import pytest

from hallucidet_tpu.data import SingleModalDetectionDataset
from hallucidet_tpu.data.annotations import get_bbox

from data_fixtures import make_kaist


@pytest.fixture(scope="module")
def kaist_root(tmp_path_factory):
    return make_kaist(str(tmp_path_factory.mktemp("kaist")))


def test_kaist_train_filters_empty_frames(kaist_root):
    ds = SingleModalDetectionDataset(
        "kaist", kaist_root, modality="rgb", ext=".png", train=True
    )
    # 4 train frames, every 2nd has no person -> 2 kept (the reference
    # hardcodes the equivalent keep list; here it is computed)
    assert len(ds) == 2
    img, target = ds[0]
    assert img.shape == (64, 80, 3)
    # xywh (5,5,20,30) -> xyxy (5,5,25,35); cyclist filtered (person-only)
    np.testing.assert_allclose(target["boxes"], [[5, 5, 25, 35]])
    assert (target["labels"] == 1).all()


def test_kaist_test_no_filter(kaist_root):
    ds = SingleModalDetectionDataset(
        "kaist", kaist_root, modality="ir", ext=".png", train=False
    )
    assert len(ds) == 2
    img, target = ds[0]
    assert img.shape == (64, 80, 1)


def test_kaist_xywh_parsing(kaist_root):
    import glob, os

    xml = sorted(glob.glob(os.path.join(kaist_root, "images", "train_rgb_0000.xml")))[0]
    out = get_bbox(xml, "kaist", True)
    np.testing.assert_allclose(out["bboxes"], [[5, 5, 25, 35]])
