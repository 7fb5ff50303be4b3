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
