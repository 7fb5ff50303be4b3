"""The bf16 detector feature path (half=True) vs the f32 path.

The product `--precision 16` config runs the detector's conv/matmul feature
extraction in bfloat16 while box math (decode, matching, sampling, NMS,
losses) stays f32 (detection/faster_rcnn._half_cast) — mirroring the
reference's Lightning autocast under `--precision 16`, which half-precisions
the frozen torchvision detector inside LitHalluciDet's forward too. These
tests pin (a) that half=False is bit-identical to the pre-flag behavior via
the golden-snapshot suite (unchanged), and (b) that half=True tracks the f32
path within bf16 feature tolerance on losses and top detections.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hallucidet_tpu.detection import pad_targets
from hallucidet_tpu.detection.detector import Detector
from hallucidet_tpu.nn.layers import FrozenBatchNorm


def test_frozen_bn_bf16_matches_f32():
    fbn = FrozenBatchNorm(8)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 8), jnp.float32)
    variables = {
        "params": {
            "weight": jnp.linspace(0.5, 2.0, 8),
            "bias": jnp.linspace(-1.0, 1.0, 8),
            "running_mean": jnp.linspace(-0.3, 0.3, 8),
            "running_var": jnp.linspace(0.1, 4.0, 8),
        }
    }
    ref = fbn.apply(variables, x)
    assert ref.dtype == jnp.float32
    half_vars = jax.tree_util.tree_map(
        lambda t: t.astype(jnp.bfloat16), variables
    )
    out = fbn.apply(half_vars, x.astype(jnp.bfloat16))
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), rtol=0.05, atol=0.05
    )


@pytest.fixture(scope="module")
def det_state():
    det = Detector(name="fasterrcnn", n_classes=2, size=64)
    variables = det.init(jax.random.PRNGKey(0))
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (2, 96, 96, 3))
    targets = pad_targets(
        [np.array([[10, 10, 40, 50]], np.float32),
         np.array([[20, 8, 60, 44]], np.float32)],
        [np.array([1]), np.array([1])],
        capacity=4,
    )
    return det, variables, imgs, targets


def test_half_losses_track_f32(det_state):
    det, variables, imgs, targets = det_state
    rng = jax.random.PRNGKey(2)
    losses32, dets32 = det.calculate_loss(variables, imgs, targets, rng=rng)
    losses16, dets16 = det.calculate_loss(
        variables, imgs, targets, rng=rng, half=True
    )
    for k in losses32:
        a, b = float(losses32[k]), float(losses16[k])
        assert np.isfinite(b), k
        # loss magnitudes at random init are O(0.1-1); bf16 features move
        # them by well under 10%
        assert abs(a - b) <= 0.1 * max(abs(a), 0.05), (k, a, b)
    # every returned tensor is f32 (box math never leaves f32)
    assert dets16.boxes.dtype == jnp.float32
    assert dets16.scores.dtype == jnp.float32
    for k in losses16:
        assert losses16[k].dtype == jnp.float32


def test_half_top_detection_tracks_f32(det_state):
    det, variables, imgs, targets = det_state
    dets32 = det.predict(variables, imgs)
    dets16 = det.predict(variables, imgs, half=True)
    s32 = np.asarray(dets32.scores)
    s16 = np.asarray(dets16.scores)
    # top score per image tracks; box comparison is skipped (discrete NMS
    # order can flip between near-equal random-init candidates)
    np.testing.assert_allclose(s16.max(axis=1), s32.max(axis=1), atol=0.03)


def test_half_default_off_is_identical(det_state):
    det, variables, imgs, targets = det_state
    rng = jax.random.PRNGKey(2)
    l_a, d_a = det.calculate_loss(variables, imgs, targets, rng=rng)
    l_b, d_b = det.calculate_loss(
        variables, imgs, targets, rng=rng, half=False
    )
    for k in l_a:
        assert float(l_a[k]) == float(l_b[k])
    np.testing.assert_array_equal(np.asarray(d_a.boxes), np.asarray(d_b.boxes))
