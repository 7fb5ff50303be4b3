"""NMS tests against an independent numpy greedy reference."""

import numpy as np
import jax.numpy as jnp

from hallucidet_tpu.ops import nms as N


def np_greedy_nms(boxes, scores, thresh):
    """Straightforward O(N^2) greedy NMS in numpy (independent oracle)."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if j == i or suppressed[j]:
                continue
            xx1 = max(boxes[i, 0], boxes[j, 0])
            yy1 = max(boxes[i, 1], boxes[j, 1])
            xx2 = min(boxes[i, 2], boxes[j, 2])
            yy2 = min(boxes[i, 3], boxes[j, 3])
            inter = max(0.0, xx2 - xx1) * max(0.0, yy2 - yy1)
            a = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            b = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            union = a + b - inter
            if union > 0 and inter / union > thresh:
                suppressed[j] = True
    return keep


def random_boxes(rng, n, spread=100.0):
    xy = rng.uniform(0, spread, (n, 2))
    wh = rng.uniform(1, 30, (n, 2))
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


def test_nms_matches_numpy_oracle():
    rng = np.random.RandomState(42)
    for trial in range(5):
        n = 200
        boxes = random_boxes(rng, n)
        scores = rng.uniform(0, 1, n).astype(np.float32)
        expected = np_greedy_nms(boxes, scores, 0.5)
        keep = np.asarray(
            N.nms_keep_mask(
                jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(n, bool), 0.5
            )
        )
        got = sorted(np.nonzero(keep)[0].tolist())
        assert got == sorted(expected), f"trial {trial}"


def test_nms_padded_output_sorted_and_valid():
    rng = np.random.RandomState(0)
    n = 100
    boxes = random_boxes(rng, n)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    valid = np.ones(n, bool)
    valid[50:] = False  # padded tail
    ob, os_, ov, oi = N.nms_padded(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), 0.5, max_out=20
    )
    os_, ov, oi = np.asarray(os_), np.asarray(ov), np.asarray(oi)
    expected = np_greedy_nms(boxes[:50], scores[:50], 0.5)
    k = min(20, len(expected))
    assert ov[:k].all()
    assert not ov[k:].any()
    # survivors come back score-sorted
    assert (np.diff(os_[:k]) <= 1e-6).all()
    assert set(oi[:k].tolist()) == set(expected[:k])
    # invalid slots zeroed scores
    np.testing.assert_allclose(os_[~ov], 0.0)


def test_batched_nms_categories_do_not_interact():
    # Two identical boxes in different categories must both survive.
    boxes = jnp.asarray(
        np.array(
            [[0, 0, 10, 10], [0, 0, 10, 10], [0.5, 0, 10, 10]], dtype=np.float32
        )
    )
    scores = jnp.asarray(np.array([0.9, 0.8, 0.7], dtype=np.float32))
    cats = jnp.asarray(np.array([0, 1, 0], dtype=np.int32))
    valid = jnp.ones(3, bool)
    ob, os_, ov, oi = N.batched_nms_padded(boxes, scores, cats, valid, 0.5, max_out=3)
    ov = np.asarray(ov)
    oi = np.asarray(oi)
    assert ov[:2].all() and not ov[2]
    assert set(oi[:2].tolist()) == {0, 1}
    # box 2 (same cat as 0, high overlap) suppressed
    np.testing.assert_allclose(np.asarray(ob)[0], [0, 0, 10, 10])


def test_nms_tie_break_stable():
    boxes = jnp.asarray(
        np.array([[0, 0, 10, 10], [0, 0, 10, 10]], dtype=np.float32)
    )
    scores = jnp.asarray(np.array([0.5, 0.5], dtype=np.float32))
    keep = np.asarray(N.nms_keep_mask(boxes, scores, jnp.ones(2, bool), 0.5))
    assert keep[0] and not keep[1]
