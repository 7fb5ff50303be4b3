"""Native loader tests: decode parity vs PIL and threaded batch loading."""

import os

import numpy as np
import pytest
from PIL import Image

from hallucidet_tpu.data import native


@pytest.fixture(scope="module")
def jpegs(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("jpegs"))
    rng = np.random.RandomState(0)
    paths = []
    for i in range(4):
        arr = rng.randint(0, 255, (64, 80, 3), np.uint8)
        p = os.path.join(root, f"img{i}.jpg")
        Image.fromarray(arr).save(p, quality=95)
        paths.append(p)
    return paths


@pytest.fixture(scope="module", autouse=True)
def built():
    if not native.available():
        assert native.build(), "native loader failed to build"


def test_decode_matches_pil(jpegs):
    got = native.load_image(jpegs[0], gray=False, hw=(64, 80))
    assert got is not None and got.shape == (64, 80, 3)
    want = np.asarray(Image.open(jpegs[0]).convert("RGB")).astype(np.float32) / 255.0
    # libjpeg and PIL share the same decoder; tolerate off-by-one rounding
    np.testing.assert_allclose(got, want, atol=2 / 255.0)


def test_gray_decode(jpegs):
    got = native.load_image(jpegs[1], gray=True, hw=(64, 80))
    assert got is not None and got.shape == (64, 80, 1)
    want = np.asarray(Image.open(jpegs[1]).convert("L")).astype(np.float32) / 255.0
    np.testing.assert_allclose(got[..., 0], want, atol=3 / 255.0)


def test_batch_threaded(jpegs):
    got = native.load_batch(jpegs, gray=False, hw=(64, 80), num_threads=4)
    assert got is not None and got.shape == (4, 64, 80, 3)
    for i, p in enumerate(jpegs):
        single = native.load_image(p, gray=False, hw=(64, 80))
        np.testing.assert_array_equal(got[i], single)


def test_resize_path(jpegs):
    got = native.load_image(jpegs[0], gray=False, hw=(32, 40))
    assert got is not None and got.shape == (32, 40, 3)
    assert 0.0 <= got.min() and got.max() <= 1.0


def test_missing_file_returns_none(jpegs):
    assert native.load_image("/nonexistent.jpg", False, (8, 8)) is None
    assert native.load_batch(["/nonexistent.jpg"], False, (8, 8)) is None
