"""mAP metric tests against hand-computed COCO-style values."""

import numpy as np

from hallucidet_tpu.metrics import MeanAveragePrecision


def box(x1, y1, x2, y2):
    return [x1, y1, x2, y2]


def test_perfect_detection():
    m = MeanAveragePrecision()
    m.update(
        [
            {
                "boxes": np.array([box(0, 0, 50, 50)]),
                "scores": np.array([0.9]),
                "labels": np.array([1]),
            }
        ],
        [{"boxes": np.array([box(0, 0, 50, 50)]), "labels": np.array([1])}],
    )
    out = m.compute()
    assert abs(out["map_50"] - 1.0) < 1e-6
    assert abs(out["map"] - 1.0) < 1e-6
    assert abs(out["map_medium"] - 1.0) < 1e-6  # area 2500 is 'medium'
    assert out["map_large"] == -1.0  # no large gt


def test_miss_and_fp():
    # one gt; two dets: high-score FP elsewhere, low-score TP
    m = MeanAveragePrecision()
    m.update(
        [
            {
                "boxes": np.array([box(100, 100, 150, 150), box(0, 0, 50, 50)]),
                "scores": np.array([0.9, 0.8]),
                "labels": np.array([1, 1]),
            }
        ],
        [{"boxes": np.array([box(0, 0, 50, 50)]), "labels": np.array([1])}],
    )
    out = m.compute()
    # PR: det1 FP (p=0 r=0), det2 TP (p=0.5, r=1.0) -> interpolated AP = 0.5
    # at every IoU threshold (IoU of TP is 1.0)
    assert abs(out["map_50"] - 0.5) < 1e-6
    assert abs(out["map"] - 0.5) < 1e-6


def test_iou_threshold_cut():
    # det has IoU ~0.587 with gt: TP at 0.5/0.55, FP at 0.6+
    m = MeanAveragePrecision()
    m.update(
        [
            {
                "boxes": np.array([box(0, 0, 50, 85)]),
                "scores": np.array([0.9]),
                "labels": np.array([1]),
            }
        ],
        [{"boxes": np.array([box(0, 0, 50, 50)]), "labels": np.array([1])}],
    )
    iou = (50 * 50) / (50 * 85)
    assert 0.55 < iou < 0.6
    out = m.compute()
    assert abs(out["map_50"] - 1.0) < 1e-6
    # 2 of 10 thresholds hit -> map = 0.2
    assert abs(out["map"] - 0.2) < 1e-6


def test_greedy_matching_highest_score_first():
    # Two dets overlap the same gt; only the higher-scored one matches.
    m = MeanAveragePrecision()
    m.update(
        [
            {
                "boxes": np.array([box(0, 0, 50, 50), box(1, 1, 51, 51)]),
                "scores": np.array([0.6, 0.9]),
                "labels": np.array([1, 1]),
            }
        ],
        [{"boxes": np.array([box(0, 0, 50, 50)]), "labels": np.array([1])}],
    )
    out = m.compute()
    # higher score det (worse IoU but still > .5): TP at rank1, second det FP
    # P-R: (1.0, 1.0) then (0.5, 1.0) -> AP_50 = 1.0
    assert abs(out["map_50"] - 1.0) < 1e-6


def test_class_separation():
    m = MeanAveragePrecision()
    m.update(
        [
            {
                "boxes": np.array([box(0, 0, 50, 50)]),
                "scores": np.array([0.9]),
                "labels": np.array([2]),  # wrong class
            }
        ],
        [{"boxes": np.array([box(0, 0, 50, 50)]), "labels": np.array([1])}],
    )
    out = m.compute()
    assert abs(out["map_50"] - 0.0) < 1e-6


def test_empty_preds_and_empty_gt():
    m = MeanAveragePrecision()
    m.update(
        [{"boxes": np.zeros((0, 4)), "scores": np.zeros(0), "labels": np.zeros(0, int)}],
        [{"boxes": np.array([box(0, 0, 10, 10)]), "labels": np.array([1])}],
    )
    out = m.compute()
    assert abs(out["map_50"] - 0.0) < 1e-6

    m2 = MeanAveragePrecision()
    m2.update(
        [{"boxes": np.zeros((0, 4)), "scores": np.zeros(0), "labels": np.zeros(0, int)}],
        [{"boxes": np.zeros((0, 4)), "labels": np.zeros(0, int)}],
    )
    assert m2.compute()["map"] == -1.0


def test_mar_maxdets():
    # 3 gts, 3 TPs but mar_1 only counts best single det
    m = MeanAveragePrecision()
    gts = np.array([box(0, 0, 10, 10), box(20, 20, 30, 30), box(40, 40, 50, 50)])
    m.update(
        [{"boxes": gts, "scores": np.array([0.9, 0.8, 0.7]), "labels": np.ones(3, int)}],
        [{"boxes": gts, "labels": np.ones(3, int)}],
    )
    out = m.compute()
    assert abs(out["mar_1"] - 1 / 3) < 1e-6
    assert abs(out["mar_10"] - 1.0) < 1e-6
    assert abs(out["mar_100"] - 1.0) < 1e-6


def _slow_evaluate_image(p, t, cls, area_rng, max_det):
    """Round-1 reference matcher (pure T x D x G loops) as oracle."""
    from hallucidet_tpu.metrics.mean_ap import IOU_THRESHOLDS, _iou_matrix

    dt_sel = p["labels"] == cls
    gt_sel = t["labels"] == cls
    dt_boxes = p["boxes"][dt_sel]
    dt_scores = p["scores"][dt_sel]
    gt_boxes = t["boxes"][gt_sel]
    order = np.argsort(-dt_scores, kind="stable")[:max_det]
    dt_boxes = dt_boxes[order]
    dt_scores = dt_scores[order]
    g_area = (gt_boxes[:, 2] - gt_boxes[:, 0]) * (gt_boxes[:, 3] - gt_boxes[:, 1])
    gt_ignore = (g_area < area_rng[0]) | (g_area > area_rng[1])
    gt_order = np.argsort(gt_ignore, kind="stable")
    gt_boxes = gt_boxes[gt_order]
    gt_ignore = gt_ignore[gt_order]
    ious = _iou_matrix(dt_boxes, gt_boxes)
    T, D, G = len(IOU_THRESHOLDS), len(dt_boxes), len(gt_boxes)
    dt_matched = np.zeros((T, D), np.int64) - 1
    dt_ig = np.zeros((T, D), bool)
    gt_matched = np.zeros((T, G), np.int64) - 1
    for ti, thr in enumerate(IOU_THRESHOLDS):
        for di in range(D):
            best_iou = min(thr, 1 - 1e-10)
            best_g = -1
            for gi in range(G):
                if gt_matched[ti, gi] >= 0:
                    continue
                if best_g > -1 and not gt_ignore[best_g] and gt_ignore[gi]:
                    break
                if ious[di, gi] < best_iou:
                    continue
                best_iou = ious[di, gi]
                best_g = gi
            if best_g >= 0:
                gt_matched[ti, best_g] = di
                dt_matched[ti, di] = best_g
                dt_ig[ti, di] = gt_ignore[best_g]
    d_area = (dt_boxes[:, 2] - dt_boxes[:, 0]) * (dt_boxes[:, 3] - dt_boxes[:, 1])
    d_out = (d_area < area_rng[0]) | (d_area > area_rng[1])
    dt_ig = dt_ig | ((dt_matched == -1) & d_out[None, :])
    return dt_scores, dt_matched >= 0, dt_ig, int(np.sum(~gt_ignore))


def test_vectorized_matching_equals_loop_oracle():
    rng = np.random.RandomState(0)
    m = MeanAveragePrecision()
    for trial in range(30):
        n_d, n_g = rng.randint(0, 12), rng.randint(0, 8)
        wh = rng.rand(n_d, 2) * 60 + 2
        xy = rng.rand(n_d, 2) * 80
        p = {"boxes": np.concatenate([xy, xy + wh], 1).astype(np.float64),
             "scores": rng.rand(n_d), "labels": rng.randint(1, 3, n_d)}
        wh = rng.rand(n_g, 2) * 60 + 2
        xy = rng.rand(n_g, 2) * 80
        t = {"boxes": np.concatenate([xy, xy + wh], 1).astype(np.float64),
             "labels": rng.randint(1, 3, n_g)}
        for area in [(0.0, 1e10), (0.0, 32.0**2), (32.0**2, 96.0**2)]:
            for cls in (1, 2):
                got = m._evaluate_image(p, t, cls, area, 100)
                ref = _slow_evaluate_image(p, t, cls, area, 100)
                for a, b in zip(got, ref):
                    np.testing.assert_array_equal(a, b)


def test_llvip_scale_runtime():
    """VERDICT #6 gate: 3,463-image-scale eval, 3 metric instances, < 60 s."""
    import time

    rng = np.random.RandomState(1)
    n_images = 3463
    metrics = [MeanAveragePrecision() for _ in range(3)]
    t0 = time.time()
    for i in range(n_images):
        n_d, n_g = rng.randint(1, 12), rng.randint(1, 6)
        wh = rng.rand(n_d, 2) * 120 + 8
        xy = rng.rand(n_d, 2) * 900
        p = {"boxes": np.concatenate([xy, xy + wh], 1),
             "scores": rng.rand(n_d), "labels": np.ones(n_d, np.int64)}
        wh = rng.rand(n_g, 2) * 120 + 8
        xy = rng.rand(n_g, 2) * 900
        t = {"boxes": np.concatenate([xy, xy + wh], 1),
             "labels": np.ones(n_g, np.int64)}
        for mm in metrics:
            mm.update([p], [t])
    results = [mm.compute() for mm in metrics]
    dt = time.time() - t0
    for r in results:
        assert 0.0 <= r["map_50"] <= 1.0
    assert dt < 60, f"3-instance LLVIP-scale eval took {dt:.1f}s"
