"""The bf16 detector feature path (half=True) vs the f32 path.

The product `--precision 16` config runs the detector's conv/matmul feature
extraction in bfloat16 while box math (decode, matching, sampling, NMS,
losses) stays f32 (detection/transform.half_cast) — mirroring the reference's
Lightning autocast under `--precision 16`, which half-precisions whichever of
the three detector families is selected (reference:
src/models/detector.py:123-141). These tests pin:

(a) half=False is bit-identical to the pre-flag behavior (the golden-snapshot
    suite, unchanged, plus test_half_default_off_is_identical).
(b) For the SAME set of sampled RoIs, bf16 features move every Faster R-CNN
    loss by well under 1% (the controlled comparison — this is the actual
    numeric claim bf16 must satisfy).
(c) End-to-end, the losses whose sample sets are precision-independent track
    within 10%. For Faster R-CNN those are the RPN losses (RPN sampling
    matches FIXED anchors against GT, so the sampled anchor set is identical
    across precisions) — and ALL retinanet/fcos losses (no sampling at all;
    matching is anchors/centers vs GT).

What is deliberately NOT bounded tightly end-to-end: Faster R-CNN's RoI-stage
loss_box_reg at RANDOM INIT. bf16 perturbs near-degenerate proposal scores,
top-k/NMS order flips wholesale (measured overlap between the f32 and bf16
sampled sets: ~1% — 3/272 boxes), and the loss is a sum over only ~6
positives, so a single membership change moves it ~15%. That is discrete
sample-set divergence, not precision loss — the round-4 red test
(|a-b| <= 10%) asserted a bound the estimator itself cannot satisfy at random
init. The controlled same-sample comparison in (b) measured 0.12% relative
drift for the identical quantity; the mAP-level half-vs-f32 comparison
(test_half_map.py) covers the end-to-end accuracy question on fixture data.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hallucidet_tpu.detection import pad_targets
from hallucidet_tpu.detection import faster_rcnn as fr
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


def _targets():
    return pad_targets(
        [np.array([[10, 10, 40, 50]], np.float32),
         np.array([[20, 8, 60, 44]], np.float32)],
        [np.array([1]), np.array([1])],
        capacity=4,
    )


@pytest.fixture(scope="module")
def det_state():
    det = Detector(name="fasterrcnn", n_classes=2, size=64)
    variables = det.init(jax.random.PRNGKey(0))
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (2, 96, 96, 3))
    return det, variables, imgs, _targets()


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
        if k == "loss_box_reg":
            # Sum over ~6 positives drawn from an almost entirely different
            # sampled RoI set (see module docstring) — order-of-magnitude
            # bound only; the tight bound lives in
            # test_half_same_samples_tracks_f32.
            assert abs(a - b) <= 0.5 * max(abs(a), 0.05), (k, a, b)
        else:
            # RPN losses: sampling identical across precisions (fixed
            # anchors vs GT). loss_classifier: CE over ~280 RoIs is flat in
            # set membership at random init.
            assert abs(a - b) <= 0.1 * max(abs(a), 0.05), (k, a, b)
    # every returned tensor is f32 (box math never leaves f32)
    assert dets16.boxes.dtype == jnp.float32
    assert dets16.scores.dtype == jnp.float32
    for k in losses16:
        assert losses16[k].dtype == jnp.float32


def test_half_same_samples_tracks_f32(det_state):
    """The controlled comparison: freeze the f32 path's sampled RoI set, run
    the bf16 features + box head over it, and compare the RoI-stage losses.
    This isolates the numeric effect of bf16 from the discrete effect of
    re-sampling (measured on this fixture: rel drift 1.2e-3 for box_reg,
    1.4e-5 for classifier)."""
    det, variables, imgs, targets = det_state
    impl = det.impl
    cfg = impl.config
    rng = jax.random.PRNGKey(2)

    images_t, targets_t = impl.transform(imgs, targets)
    feats32 = impl.module.apply(variables, images_t, method="features")
    objs, deltas = impl.module.apply(variables, feats32, method="rpn")
    objectness, pred_deltas, level_sizes = fr._flatten_rpn_outputs(objs, deltas)
    anchors = jnp.asarray(impl.anchors())
    prop_boxes, _, prop_valid = fr._filter_proposals(
        pred_deltas, anchors, objectness, level_sizes, impl.image_size, cfg,
        False,
    )
    _, roi_rng = jax.random.split(rng)
    sel_boxes, sel_labels, sel_valid, reg_targets = fr._select_training_samples(
        prop_boxes, prop_valid, targets_t, cfg, roi_rng
    )
    strides = [
        2 ** int(round(np.log2(impl.image_size[0] / hw[0])))
        for hw in impl.level_shapes()[:4]
    ]

    def roi_losses(half):
        v, it = fr._half_cast(variables, images_t, half)
        feats = impl.module.apply(v, it, method="features")
        pooled = jax.vmap(
            lambda fs, r: fr.multiscale_roi_align(fs, r, strides, (7, 7), 2)
        )([f for f in feats[:4]], sel_boxes)
        cl, br = impl.module.apply(v, pooled, method="box_predict")
        return fr._fastrcnn_loss(
            cl.astype(jnp.float32), br.astype(jnp.float32),
            sel_labels, reg_targets, sel_valid,
        )

    lc32, lb32 = roi_losses(False)
    lc16, lb16 = roi_losses(True)
    assert abs(float(lc32) - float(lc16)) <= 0.02 * max(float(lc32), 0.05)
    assert abs(float(lb32) - float(lb16)) <= 0.02 * max(float(lb32), 0.05)


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


@pytest.mark.parametrize("family", ["retinanet", "fcos"])
def test_half_anchor_free_families(family):
    """retinanet/fcos half path (reference autocasts every selected family —
    src/models/detector.py:123-141). Their matching has NO dependence on
    features (anchors/centers vs GT), so every loss is a fixed-set estimator
    and must track f32 tightly end-to-end."""
    det = Detector(name=family, n_classes=2, size=64)
    variables = det.init(jax.random.PRNGKey(0))
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (2, 96, 96, 3))
    targets = _targets()
    rng = jax.random.PRNGKey(2)
    l32, d32 = det.calculate_loss(variables, imgs, targets, rng=rng)
    l16, d16 = det.calculate_loss(variables, imgs, targets, rng=rng, half=True)
    for k in l32:
        a, b = float(l32[k]), float(l16[k])
        assert np.isfinite(b), (family, k)
        assert abs(a - b) <= 0.1 * max(abs(a), 0.05), (family, k, a, b)
        assert l16[k].dtype == jnp.float32
    assert d16.boxes.dtype == jnp.float32
    assert d16.scores.dtype == jnp.float32
    # serving path accepts the flag too
    p16 = det.predict(variables, imgs, half=True)
    assert p16.boxes.dtype == jnp.float32
