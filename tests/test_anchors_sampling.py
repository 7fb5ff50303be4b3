"""Anchor generator, matcher, sampler, and image op tests."""

import numpy as np
import jax
import jax.numpy as jnp

from hallucidet_tpu.ops import anchors as A
from hallucidet_tpu.ops import sampling as S
from hallucidet_tpu.ops import image_ops as I


def test_cell_anchors_known_values():
    cell = A.generate_cell_anchors([32.0], [0.5, 1.0, 2.0])
    assert cell.shape == (3, 4)
    # ar=1.0 -> 32x32 centered
    np.testing.assert_allclose(cell[1], [-16, -16, 16, 16])
    # ar=0.5 -> h/w = sqrt(.5); w = 32/sqrt(.5)~45.25 -> rounded /2 = 23
    w = round(32 / np.sqrt(0.5) / 2)
    h = round(32 * np.sqrt(0.5) / 2)
    np.testing.assert_allclose(cell[0], [-w, -h, w, h])
    np.testing.assert_allclose(cell[2], [-h, -w, h, w])


def test_grid_anchor_layout():
    gen = A.AnchorGenerator(sizes=((16.0,),), aspect_ratios=(1.0,))
    (anch,) = gen.anchors_per_level((32, 32), [(2, 2)])
    # stride 16; positions (0,0),(0,16),(16,0),(16,16) row-major over (y, x)
    np.testing.assert_allclose(
        anch,
        [
            [-8, -8, 8, 8],
            [8, -8, 24, 8],
            [-8, 8, 8, 24],
            [8, 8, 24, 24],
        ],
    )


def test_rpn_anchor_counts_300():
    gen = A.rpn_anchor_generator()
    feats = [(75, 75), (38, 38), (19, 19), (10, 10), (5, 5)]
    per = gen.anchors_per_level((300, 300), feats)
    counts = [a.shape[0] for a in per]
    assert counts == [75 * 75 * 3, 38 * 38 * 3, 19 * 19 * 3, 10 * 10 * 3, 5 * 5 * 3]


def test_matcher_thresholds_and_low_quality():
    gt = jnp.asarray(np.array([[0, 0, 10, 10], [0, 0, 0, 0]], np.float32))
    gt_valid = jnp.asarray(np.array([True, False]))
    cands = jnp.asarray(
        np.array(
            [
                [0, 0, 10, 10],  # iou 1 -> match 0
                [0, 0, 10, 5],  # iou .5 -> between [0.3, 0.7)
                [100, 100, 110, 110],  # iou 0 -> below
            ],
            np.float32,
        )
    )
    m = S.match_boxes(gt, gt_valid, cands, 0.7, 0.3, allow_low_quality_matches=False)
    np.testing.assert_array_equal(np.asarray(m.matched_idx), [0, -2, -1])

    # low-quality: best anchor for a gt gets matched even below threshold
    gt2 = jnp.asarray(np.array([[0, 0, 10, 10]], np.float32))
    cands2 = jnp.asarray(
        np.array([[0, 0, 10, 4], [50, 50, 60, 60]], np.float32)
    )  # ious 0.4, 0.0
    m2 = S.match_boxes(
        gt2, jnp.asarray([True]), cands2, 0.7, 0.5, allow_low_quality_matches=True
    )
    np.testing.assert_array_equal(np.asarray(m2.matched_idx), [0, -1])

    # no valid gt -> all background
    m3 = S.match_boxes(
        gt, jnp.asarray([False, False]), cands, 0.7, 0.3, True
    )
    np.testing.assert_array_equal(np.asarray(m3.matched_idx), [-1, -1, -1])


def test_balanced_sample_counts():
    key = jax.random.PRNGKey(0)
    n = 100
    pos = jnp.asarray(np.arange(n) < 10)  # 10 positives
    neg = jnp.asarray(np.arange(n) >= 50)  # 50 negatives
    pm, nm = S.balanced_sample(key, pos, neg, batch_size=64, positive_fraction=0.25)
    pm, nm = np.asarray(pm), np.asarray(nm)
    assert pm.sum() == 10  # fewer positives than the 16 budget -> take all
    assert nm.sum() == 50  # budget 54 but only 50 negatives exist
    assert not (pm & ~np.asarray(pos)).any()
    assert not (nm & ~np.asarray(neg)).any()

    # plenty of both: respect the fraction exactly
    pos2 = jnp.asarray(np.arange(n) < 50)
    pm2, nm2 = S.balanced_sample(key, pos2, neg, 64, 0.25)
    assert np.asarray(pm2).sum() == 16
    assert np.asarray(nm2).sum() == 48


def test_balanced_sample_packed_matches_mask_form():
    """balanced_sample_packed must select EXACTLY the same elements as the
    mask form for the same key (the RPN loss runs on the packed slots;
    golden snapshots depend on the draw being unchanged)."""
    key = jax.random.PRNGKey(3)
    n = 500
    rng = np.random.RandomState(0)
    pos = jnp.asarray(rng.rand(n) < 0.05)
    neg = jnp.asarray((rng.rand(n) < 0.6) & ~np.asarray(pos))
    pm, nm = S.balanced_sample(key, pos, neg, batch_size=64, positive_fraction=0.25)
    pi, pv, ni, nv = S.balanced_sample_packed(key, pos, neg, 64, 0.25)
    pm2 = np.zeros(n, bool)
    pm2[np.asarray(pi)[np.asarray(pv)]] = True
    nm2 = np.zeros(n, bool)
    nm2[np.asarray(ni)[np.asarray(nv)]] = True
    np.testing.assert_array_equal(pm2, np.asarray(pm))
    np.testing.assert_array_equal(nm2, np.asarray(nm))
    # packed slots marked valid are unique and in-mask
    sel_p = np.asarray(pi)[np.asarray(pv)]
    assert len(set(sel_p.tolist())) == len(sel_p)
    assert np.asarray(pos)[sel_p].all()


def test_resize_bilinear_matches_halfpixel_oracle():
    rng = np.random.RandomState(0)
    img = rng.rand(1, 5, 7, 3).astype(np.float32)

    def oracle(img, oh, ow):
        b, h, w, c = img.shape
        out = np.zeros((b, oh, ow, c), np.float32)
        for i in range(oh):
            for j in range(ow):
                sy = (i + 0.5) * h / oh - 0.5
                sx = (j + 0.5) * w / ow - 0.5
                y0, x0 = int(np.floor(sy)), int(np.floor(sx))
                ly, lx = sy - y0, sx - x0
                y0c, y1c = np.clip([y0, y0 + 1], 0, h - 1)
                x0c, x1c = np.clip([x0, x0 + 1], 0, w - 1)
                out[:, i, j] = (
                    img[:, y0c, x0c] * (1 - ly) * (1 - lx)
                    + img[:, y0c, x1c] * (1 - ly) * lx
                    + img[:, y1c, x0c] * ly * (1 - lx)
                    + img[:, y1c, x1c] * ly * lx
                )
        return out

    for out_hw in [(10, 14), (3, 4), (5, 7)]:
        got = np.asarray(I.resize_bilinear(jnp.asarray(img), out_hw))
        np.testing.assert_allclose(got, oracle(img, *out_hw), atol=1e-5)


def test_upsample_nearest_exact():
    x = jnp.asarray(np.arange(4, dtype=np.float32).reshape(1, 2, 2, 1))
    up = np.asarray(I.upsample_nearest(x, 2))[0, :, :, 0]
    np.testing.assert_array_equal(
        up, [[0, 0, 1, 1], [0, 0, 1, 1], [2, 2, 3, 3], [2, 2, 3, 3]]
    )


def test_normalize_and_expand():
    img = jnp.ones((1, 2, 2, 3))
    out = np.asarray(I.normalize(img, (1.0, 0.0, 0.5), (1.0, 2.0, 0.5)))
    np.testing.assert_allclose(out[0, 0, 0], [0.0, 0.5, 1.0])
    ir = jnp.ones((1, 2, 2, 1)) * 0.3
    np.testing.assert_allclose(
        np.asarray(I.expand_one_channel_to_three(ir))[0, 0, 0], [0.3, 0.3, 0.3]
    )
