"""RoIAlign tests vs an independent numpy implementation of the
aligned=False torchvision semantics."""

import numpy as np
import jax.numpy as jnp

from hallucidet_tpu.ops import roi_align as R


def np_roi_align(feat_hwc, rois, spatial_scale, out, sr):
    """Direct (slow) numpy RoIAlign oracle, aligned=False."""
    H, W, C = feat_hwc.shape
    oh, ow = out
    res = np.zeros((len(rois), oh, ow, C), np.float32)

    def bilinear(y, x):
        if y < -1.0 or y > H or x < -1.0 or x > W:
            return np.zeros(C, np.float32)
        y = min(max(y, 0.0), H - 1.0)
        x = min(max(x, 0.0), W - 1.0)
        y0, x0 = int(np.floor(y)), int(np.floor(x))
        y1, x1 = min(y0 + 1, H - 1), min(x0 + 1, W - 1)
        ly, lx = y - y0, x - x0
        return (
            feat_hwc[y0, x0] * (1 - ly) * (1 - lx)
            + feat_hwc[y0, x1] * (1 - ly) * lx
            + feat_hwc[y1, x0] * ly * (1 - lx)
            + feat_hwc[y1, x1] * ly * lx
        )

    for n, roi in enumerate(rois):
        x1, y1, x2, y2 = roi * spatial_scale
        rw = max(x2 - x1, 1.0)
        rh = max(y2 - y1, 1.0)
        bw, bh = rw / ow, rh / oh
        for i in range(oh):
            for j in range(ow):
                acc = np.zeros(C, np.float32)
                for iy in range(sr):
                    for ix in range(sr):
                        y = y1 + (i + (iy + 0.5) / sr) * bh
                        x = x1 + (j + (ix + 0.5) / sr) * bw
                        acc += bilinear(y, x)
                res[n, i, j] = acc / (sr * sr)
    return res


def test_roi_align_matches_oracle():
    rng = np.random.RandomState(7)
    feat = rng.randn(16, 16, 3).astype(np.float32)
    rois = np.array(
        [
            [0.0, 0.0, 32.0, 32.0],  # half the (scaled) map
            [4.0, 8.0, 20.0, 28.0],
            [-2.0, -2.0, 70.0, 70.0],  # overshoots borders
            [10.0, 10.0, 10.5, 10.5],  # degenerate, clamped to size 1
        ],
        dtype=np.float32,
    )
    expected = np_roi_align(feat, rois, 0.25, (7, 7), 2)
    got = np.asarray(
        R.roi_align(jnp.asarray(feat), jnp.asarray(rois), 0.25, (7, 7), 2)
    )
    np.testing.assert_allclose(got, expected, atol=1e-4)


def test_fpn_level_assignment():
    rois = jnp.asarray(
        np.array(
            [
                [0, 0, 56, 56],  # sqrt(area)=56 -> lvl 4 + log2(0.25) = 2
                [0, 0, 224, 224],  # -> 4
                [0, 0, 1000, 1000],  # clamps to 5
                [0, 0, 4, 4],  # clamps to 2
            ],
            dtype=np.float32,
        )
    )
    lvl = np.asarray(R.fpn_level_assignment(rois, k_min=2, k_max=5))
    np.testing.assert_array_equal(lvl, [0, 2, 3, 0])


def test_multiscale_fused_matches_per_level():
    """The fused (level-packed single-einsum) form must equal the per-level
    pool-and-select form exactly, including border clamps, degenerate boxes,
    and width-padded (non-square) levels."""
    rng = np.random.RandomState(11)
    feats = [
        jnp.asarray(rng.randn(40, 32, 8).astype(np.float32)),
        jnp.asarray(rng.randn(20, 16, 8).astype(np.float32)),
        jnp.asarray(rng.randn(10, 8, 8).astype(np.float32)),
        jnp.asarray(rng.randn(5, 4, 8).astype(np.float32)),
    ]
    strides = (4, 8, 16, 32)
    # random boxes spanning every level bucket + pathological ones
    wh = rng.uniform(2.0, 400.0, size=(64, 2)).astype(np.float32)
    xy = rng.uniform(-8.0, 120.0, size=(64, 2)).astype(np.float32)
    rois = np.concatenate([xy, xy + wh], axis=1)
    rois = np.concatenate(
        [
            rois,
            np.array(
                [
                    [0, 0, 160, 128],  # exactly the image frame
                    [10, 10, 10.2, 10.2],  # degenerate -> clamped to size 1
                    [-20, -20, 500, 500],  # overshoots every border
                    [150, 120, 170, 140],  # hangs off the bottom-right
                ],
                dtype=np.float32,
            ),
        ]
    ).astype(np.float32)
    rois_j = jnp.asarray(rois)
    fused = np.asarray(
        R.multiscale_roi_align(feats, rois_j, strides, (7, 7), 2)
    )
    per_level = np.asarray(
        R.multiscale_roi_align_per_level(feats, rois_j, strides, (7, 7), 2)
    )
    np.testing.assert_allclose(fused, per_level, atol=1e-4)


def test_multiscale_roi_align_selects_levels():
    rng = np.random.RandomState(3)
    feats = [
        jnp.asarray(rng.randn(32, 32, 4).astype(np.float32)),
        jnp.asarray(rng.randn(16, 16, 4).astype(np.float32)),
        jnp.asarray(rng.randn(8, 8, 4).astype(np.float32)),
        jnp.asarray(rng.randn(4, 4, 4).astype(np.float32)),
    ]
    strides = (4, 8, 16, 32)
    rois = np.array(
        [[0, 0, 48, 48], [0, 0, 300, 300]], dtype=np.float32
    )  # lvl2 (idx0), lvl ~4.4->4 (idx2)
    out = np.asarray(
        R.multiscale_roi_align(feats, jnp.asarray(rois), strides, (7, 7), 2)
    )
    exp0 = np_roi_align(np.asarray(feats[0]), rois[:1], 1 / 4, (7, 7), 2)
    lvl = np.asarray(R.fpn_level_assignment(jnp.asarray(rois), 2, 5))
    exp1 = np_roi_align(
        np.asarray(feats[lvl[1]]), rois[1:], 1 / strides[lvl[1]], (7, 7), 2
    )
    np.testing.assert_allclose(out[0], exp0[0], atol=1e-4)
    np.testing.assert_allclose(out[1], exp1[0], atol=1e-4)
