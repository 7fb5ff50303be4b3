"""Data layer tests on a synthetic LLVIP-format dataset."""

import numpy as np
import pytest

from hallucidet_tpu.data import (
    MultiModalDataModule,
    MultiModalDetectionDataset,
    SingleModalDataModule,
    SingleModalDetectionDataset,
    split_indices,
)
from hallucidet_tpu.data.transforms import equalize, invert, check_range

from data_fixtures import make_llvip


@pytest.fixture(scope="module")
def llvip_root(tmp_path_factory):
    return make_llvip(str(tmp_path_factory.mktemp("data")))


def test_single_modal_discovery_and_filters(llvip_root):
    ds = SingleModalDetectionDataset(
        "llvip", llvip_root, modality="rgb", ext=".jpg", train=True
    )
    assert len(ds) == 6
    img, target = ds[0]
    assert img.shape == (96, 128, 3) and img.dtype == np.float32
    assert 0.0 <= img.min() and img.max() <= 1.0
    # 2 person boxes kept; dog and tiny person filtered out
    assert target["boxes"].shape == (2, 4)
    assert (target["labels"] == 1).all()


def test_ir_modality_single_channel(llvip_root):
    ds = SingleModalDetectionDataset(
        "llvip", llvip_root, modality="ir", ext=".jpg", train=False
    )
    assert len(ds) == 4
    img, _ = ds[0]
    assert img.shape == (96, 128, 1)


def test_multimodal_pairs(llvip_root):
    ds = MultiModalDetectionDataset(
        "llvip", llvip_root, llvip_root, ext=".jpg", train=True
    )
    rgb, t_rgb, ir, t_ir = ds[1]
    assert rgb.shape == (96, 128, 3) and ir.shape == (96, 128, 1)
    np.testing.assert_allclose(t_rgb["boxes"], t_ir["boxes"])  # aligned dataset


def test_split_matches_torch_random_split():
    import torch

    tr, va = split_indices(10, 0.8, seed=123)
    g = torch.Generator().manual_seed(123)
    perm = torch.randperm(10, generator=g).tolist()
    assert tr == perm[:8] and va == perm[8:]
    # deterministic across calls
    assert split_indices(10, 0.8, 123)[0] == tr


def test_datamodule_batches(llvip_root):
    dm = MultiModalDataModule(
        dataset="llvip",
        path_images_train_rgb=llvip_root,
        path_images_train_ir=llvip_root,
        path_images_test_rgb=llvip_root,
        path_images_test_ir=llvip_root,
        batch_size=2,
        ext=".jpg",
        seed=123,
        max_boxes=8,
    )
    # 6 train imgs -> split 4/2 -> 2 train batches of 2
    batches = list(dm.train_dataloader())
    assert len(batches) == 2
    rgb, t_rgb, ir, t_ir = batches[0]
    assert rgb.shape == (2, 96, 128, 3)
    assert ir.shape == (2, 96, 128, 1)
    assert t_ir.boxes.shape == (2, 8, 4)
    assert t_ir.valid.shape == (2, 8)
    assert np.asarray(t_ir.valid).sum(axis=1).tolist() == [2, 2]

    test_batches = list(dm.test_dataloader())
    assert len(test_batches) == 2


def test_shuffle_is_seeded_and_epoch_varying(llvip_root):
    dm = SingleModalDataModule(
        dataset="llvip", path_images_train=llvip_root, path_images_test=llvip_root,
        batch_size=2, ext=".jpg", seed=7, modality="rgb", max_boxes=8,
    )
    loader = dm.train_dataloader()
    e0 = [np.asarray(b[0]).sum() for b in loader]
    e1 = [np.asarray(b[0]).sum() for b in loader]
    loader2 = dm.train_dataloader()
    f0 = [np.asarray(b[0]).sum() for b in loader2]
    assert e0 == f0  # same seed, same epoch -> identical order
    assert e0 != e1  # epoch advances the shuffle


def test_transform_ops():
    img = np.arange(256, dtype=np.uint8).reshape(16, 16)
    assert invert(img)[0, 0] == 255
    eq = equalize(img)
    assert eq.dtype == np.uint8
    with pytest.raises(AssertionError):
        check_range(np.array([[-1.0, 2.0]]) * 300.0)
