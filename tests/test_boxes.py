"""Unit tests for box primitives vs hand-computed known-good values."""

import numpy as np
import jax.numpy as jnp

from hallucidet_tpu.ops import boxes as B


def test_box_area():
    b = jnp.array([[0.0, 0.0, 2.0, 3.0], [1.0, 1.0, 1.0, 5.0]])
    np.testing.assert_allclose(B.box_area(b), [6.0, 0.0])


def test_box_iou_known_values():
    a = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    b = jnp.array(
        [
            [0.0, 0.0, 10.0, 10.0],  # identical -> 1
            [5.0, 5.0, 15.0, 15.0],  # inter 25, union 175 -> 1/7
            [20.0, 20.0, 30.0, 30.0],  # disjoint -> 0
        ]
    )
    iou = np.asarray(B.box_iou(a, b))
    np.testing.assert_allclose(iou, [[1.0, 25.0 / 175.0, 0.0]], atol=1e-6)


def test_box_iou_batched():
    a = jnp.broadcast_to(jnp.array([[[0.0, 0.0, 4.0, 4.0]]]), (2, 1, 4))
    b = jnp.broadcast_to(jnp.array([[[2.0, 2.0, 6.0, 6.0]]]), (2, 1, 4))
    iou = np.asarray(B.box_iou(a, b))
    assert iou.shape == (2, 1, 1)
    np.testing.assert_allclose(iou, 4.0 / 28.0, atol=1e-6)


def test_generalized_iou_disjoint():
    a = jnp.array([[0.0, 0.0, 1.0, 1.0]])
    b = jnp.array([[2.0, 0.0, 3.0, 1.0]])
    # hull 3x1=3, union 2 -> giou = 0 - (3-2)/3 = -1/3
    giou = np.asarray(B.generalized_box_iou(a, b))
    np.testing.assert_allclose(giou, [[-1.0 / 3.0]], atol=1e-6)


def test_encode_decode_roundtrip():
    rng = np.random.RandomState(0)
    anchors = np.stack(
        [
            rng.uniform(0, 100, 64),
            rng.uniform(0, 100, 64),
            rng.uniform(110, 200, 64),
            rng.uniform(110, 200, 64),
        ],
        axis=1,
    ).astype(np.float32)
    gt = anchors + rng.uniform(-5, 5, anchors.shape).astype(np.float32)
    for weights in [(1.0, 1.0, 1.0, 1.0), (10.0, 10.0, 5.0, 5.0)]:
        deltas = B.encode_boxes(jnp.asarray(gt), jnp.asarray(anchors), weights)
        back = B.decode_boxes(deltas, jnp.asarray(anchors), weights)
        np.testing.assert_allclose(np.asarray(back), gt, atol=1e-3)


def test_decode_known_value():
    # anchor 10x10 at origin, delta (0.1, 0.2, log(2), log(0.5)) w=1
    anchor = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    deltas = jnp.array([[0.1, 0.2, np.log(2.0), np.log(0.5)]])
    out = np.asarray(B.decode_boxes(deltas, anchor))
    # center (5,5) -> (6, 7); size (10,10) -> (20, 5)
    np.testing.assert_allclose(out, [[-4.0, 4.5, 16.0, 9.5]], atol=1e-5)


def test_decode_multiclass_shape():
    anchor = jnp.zeros((3, 4)).at[:, 2:].set(10.0)
    deltas = jnp.zeros((3, 8))  # 2 classes
    out = B.decode_boxes(deltas, anchor)
    assert out.shape == (3, 8)
    np.testing.assert_allclose(np.asarray(out).reshape(3, 2, 4)[:, 0], anchor)


def test_clip_and_small_boxes():
    b = jnp.array([[-5.0, -5.0, 500.0, 2.0]])
    clipped = B.clip_boxes_to_image(b, (300, 300))
    np.testing.assert_allclose(np.asarray(clipped), [[0.0, 0.0, 300.0, 2.0]])
    mask = B.remove_small_boxes_mask(clipped, min_size=3.0)
    assert not bool(mask[0])
    mask2 = B.remove_small_boxes_mask(clipped, min_size=1.0)
    assert bool(mask2[0])


def test_format_conversions_roundtrip():
    b = jnp.array([[1.0, 2.0, 5.0, 9.0]])
    np.testing.assert_allclose(
        np.asarray(B.xywh_to_xyxy(B.xyxy_to_xywh(b))), np.asarray(b)
    )
    np.testing.assert_allclose(
        np.asarray(B.cxcywh_to_xyxy(B.xyxy_to_cxcywh(b))), np.asarray(b)
    )
    np.testing.assert_allclose(np.asarray(B.xyxy_to_cxcywh(b)), [[3.0, 5.5, 4.0, 7.0]])


def test_resize_boxes():
    b = jnp.array([[10.0, 20.0, 30.0, 40.0]])
    out = B.resize_boxes(b, (100, 200), (300, 300))
    np.testing.assert_allclose(np.asarray(out), [[15.0, 60.0, 45.0, 120.0]])
