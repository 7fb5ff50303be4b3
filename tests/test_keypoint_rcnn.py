"""Keypoint R-CNN branch (detection/keypoint_rcnn.py): heatmap encode/decode
round trip, loss semantics (masking, empty-GT zero, label smoothing),
module shapes, gradient flow — mirroring tests/test_faster_rcnn.py.
Reference semantics: src/utils/eval_forward_fasterrcnn.py:148-255."""

import numpy as np
import jax
import jax.numpy as jnp

from hallucidet_tpu.detection.keypoint_rcnn import (
    KeypointBranch,
    KeypointRCNNHeads,
    KeypointRCNNPredictor,
    heatmaps_to_keypoints,
    keypointrcnn_loss,
    keypoints_to_heatmap,
    match_proposals_to_gt,
)


def test_keypoints_to_heatmap_hand_values():
    rois = jnp.asarray([[0.0, 0.0, 56.0, 56.0]])
    size = 56
    kp = jnp.asarray([[[0.0, 0.0, 1.0],     # top-left cell
                       [55.9, 55.9, 1.0],   # bottom-right cell
                       [56.0, 56.0, 1.0],   # boundary snap -> last cell
                       [10.0, 10.0, 0.0],   # invisible
                       [-3.0, 5.0, 1.0]]])  # out of roi
    lin, valid = keypoints_to_heatmap(kp, rois, size)
    assert valid.tolist() == [[True, True, True, False, False]]
    assert int(lin[0, 0]) == 0
    assert int(lin[0, 1]) == 55 * 56 + 55
    assert int(lin[0, 2]) == 55 * 56 + 55


def test_heatmap_round_trip():
    """encode a keypoint, decode the argmax: must land in the same cell."""
    rois = jnp.asarray([[8.0, 16.0, 72.0, 144.0]])
    kp = jnp.asarray([[[40.0, 100.0, 1.0]]])
    size = 56
    lin, valid = keypoints_to_heatmap(kp, rois, size)
    logits = jnp.zeros((1, size, size, 1))
    logits = logits.at[0, int(lin[0, 0]) // size, int(lin[0, 0]) % size, 0].set(
        10.0
    )
    dec, scores = heatmaps_to_keypoints(logits, rois)
    # decoded center of the winning cell must be within one cell of the input
    cell_w = (72 - 8) / size
    cell_h = (144 - 16) / size
    assert abs(float(dec[0, 0, 0]) - 40.0) <= cell_w
    assert abs(float(dec[0, 0, 1]) - 100.0) <= cell_h
    # softmax over 56*56 cells with a single strong logit
    assert float(scores[0, 0]) > 0.5


def test_loss_masking_and_empty():
    rng = jax.random.PRNGKey(0)
    logits = jax.random.normal(rng, (3, 14, 14, 4))
    lin = jnp.zeros((3, 4), jnp.int32)
    none_valid = jnp.zeros((3, 4), bool)
    assert float(keypointrcnn_loss(logits, lin, none_valid)) == 0.0
    some = none_valid.at[0, 0].set(True)
    l1 = keypointrcnn_loss(logits, lin, some)
    assert np.isfinite(float(l1)) and float(l1) > 0
    # label smoothing changes the value (train_det=True reference path)
    l2 = keypointrcnn_loss(logits, lin, some, label_smoothing=0.1)
    assert abs(float(l1) - float(l2)) > 1e-6
    # gradient flows through logits, zero-GT case keeps zero gradient finite
    g = jax.grad(lambda x: keypointrcnn_loss(x, lin, some))(logits)
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).max()) > 0
    g0 = jax.grad(lambda x: keypointrcnn_loss(x, lin, none_valid))(logits)
    assert np.isfinite(np.asarray(g0)).all()


def test_match_proposals_to_gt():
    props = jnp.asarray([[0, 0, 10, 10], [20, 20, 40, 40]], jnp.float32)
    gtb = jnp.asarray([[19, 19, 41, 41], [1, 1, 9, 9]], jnp.float32)
    gtv = jnp.asarray([True, True])
    m = match_proposals_to_gt(props, gtb, gtv)
    assert m.tolist() == [1, 0]
    # invalid gt never matches
    m2 = match_proposals_to_gt(props, gtb, jnp.asarray([True, False]))
    assert m2.tolist() == [0, 0]


def test_modules_shapes():
    head = KeypointRCNNHeads()
    pred = KeypointRCNNPredictor(num_keypoints=17)
    x = jnp.zeros((2, 14, 14, 256))
    vh = head.init(jax.random.PRNGKey(0), x)
    mid = head.apply(vh, x)
    assert mid.shape == (2, 14, 14, 512)
    assert set(vh["params"].keys()) == {str(2 * i) for i in range(8)}
    vp = pred.init(jax.random.PRNGKey(1), mid)
    out = pred.apply(vp, mid)
    assert out.shape == (2, 56, 56, 17)


def test_branch_end_to_end_and_gradients():
    b, r, g, k = 2, 8, 3, 17
    branch = KeypointBranch(num_keypoints=k)
    variables = branch.init(jax.random.PRNGKey(0))
    feats = [
        jax.random.uniform(jax.random.PRNGKey(i), (b, 32 // s, 32 // s, 256))
        for i, s in enumerate((1, 2, 4, 8))
    ]
    strides = (4, 8, 16, 32)
    rng = np.random.RandomState(0)
    rois = jnp.asarray(
        np.sort(rng.rand(b, r, 2, 2) * 100, axis=2).transpose(0, 1, 3, 2)
        .reshape(b, r, 4).astype(np.float32)
    )
    pos = jnp.ones((b, r), bool)
    gtb = jnp.asarray(rng.rand(b, g, 4).astype(np.float32) * 50)
    gtb = gtb.at[..., 2:].add(30.0)
    gtv = jnp.ones((b, g), bool)
    gtk = jnp.asarray(
        np.concatenate(
            [rng.rand(b, g, k, 2) * 100, np.ones((b, g, k, 1))], -1
        ).astype(np.float32)
    )

    def run(v):
        loss, kp, kps = branch.apply(
            v, feats, rois, pos, gtb, gtv, gtk, strides
        )
        return loss, (kp, kps)

    (loss, (kp, kps)), grads = jax.value_and_grad(run, has_aux=True)(variables)
    assert np.isfinite(float(loss))
    assert kp.shape == (b, r, k, 3) and kps.shape == (b, r, k)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)

    # empty-GT: zero valid -> finite zero-ish loss, no NaNs
    loss0, _, _ = branch.apply(
        variables, feats, rois, jnp.zeros((b, r), bool), gtb,
        jnp.zeros((b, g), bool), gtk, strides,
    )
    assert np.isfinite(float(loss0)) and float(loss0) == 0.0
