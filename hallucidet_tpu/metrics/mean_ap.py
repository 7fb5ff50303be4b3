"""COCO-style Mean Average Precision (mAP) — torchmetrics-compatible surface.

Rebuild of the reference's detection metric (reference: src/metrics/metrics.py:
7-32 wraps torchmetrics MeanAveragePrecision), implemented from the COCO
evaluation definition: 10 IoU thresholds 0.50:0.95, 101-point interpolated
precision, area ranges, maxDets (1, 10, 100). Host-side numpy accumulator —
detection tensors come off-device once per eval step, everything else stays
on TPU.

Matching follows pycocotools: per (image, class), detections in score order
greedily claim the not-yet-matched GT with the highest IoU >= threshold.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

IOU_THRESHOLDS = np.round(np.arange(0.5, 1.0, 0.05), 2)  # 10 values
RECALL_THRESHOLDS = np.linspace(0.0, 1.0, 101)
AREA_RANGES = {
    "all": (0.0, 1e10),
    "small": (0.0, 32.0**2),
    "medium": (32.0**2, 96.0**2),
    "large": (96.0**2, 1e10),
}
MAX_DETS = (1, 10, 100)


def _iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)), np.float64)
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    union = area_a[:, None] + area_b[None, :] - inter
    return np.where(union > 0, inter / union, 0.0)


class MeanAveragePrecision:
    """update(preds, target) with lists of dicts of numpy arrays
    ({boxes [N,4] xyxy, scores [N], labels [N]} / {boxes, labels}), the
    torchmetrics calling convention the reference uses; also accepts the
    framework's padded Detections/Targets via `update_padded`."""

    def __init__(self, class_metrics: bool = False):
        self.class_metrics = class_metrics
        self.reset()

    def reset(self):
        self._preds: List[Dict[str, np.ndarray]] = []
        self._targets: List[Dict[str, np.ndarray]] = []

    # ---- update ----

    def update(
        self,
        preds: Sequence[Dict[str, np.ndarray]],
        target: Sequence[Dict[str, np.ndarray]],
    ):
        assert len(preds) == len(target)
        for p, t in zip(preds, target):
            self._preds.append(
                {
                    "boxes": np.asarray(p["boxes"], np.float64).reshape(-1, 4),
                    "scores": np.asarray(p["scores"], np.float64).reshape(-1),
                    "labels": np.asarray(p["labels"], np.int64).reshape(-1),
                }
            )
            self._targets.append(
                {
                    "boxes": np.asarray(t["boxes"], np.float64).reshape(-1, 4),
                    "labels": np.asarray(t["labels"], np.int64).reshape(-1),
                }
            )

    def update_padded(self, detections, targets):
        """Accepts detection/target NamedTuples with validity masks (device or
        host arrays)."""
        det_boxes = np.asarray(detections.boxes)
        det_scores = np.asarray(detections.scores)
        det_labels = np.asarray(detections.labels)
        det_valid = np.asarray(detections.valid)
        gt_boxes = np.asarray(targets.boxes)
        gt_labels = np.asarray(targets.labels)
        gt_valid = np.asarray(targets.valid)
        preds, tgts = [], []
        for i in range(det_boxes.shape[0]):
            dv = det_valid[i]
            gv = gt_valid[i]
            preds.append(
                {
                    "boxes": det_boxes[i][dv],
                    "scores": det_scores[i][dv],
                    "labels": det_labels[i][dv],
                }
            )
            tgts.append({"boxes": gt_boxes[i][gv], "labels": gt_labels[i][gv]})
        self.update(preds, tgts)

    # ---- compute ----

    def _evaluate_image(self, p, t, cls, area_rng, max_det):
        """Returns (det_scores, det_matched [T, D], gt_ignore [G]) for one
        (image, class) pair."""
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
        # evaluate non-ignored gt first (pycocotools sorts by ignore flag)
        gt_order = np.argsort(gt_ignore, kind="stable")
        gt_boxes = gt_boxes[gt_order]
        gt_ignore = gt_ignore[gt_order]

        ious = _iou_matrix(dt_boxes, gt_boxes)
        T = len(IOU_THRESHOLDS)
        D = len(dt_boxes)
        G = len(gt_boxes)
        dt_matched = np.zeros((T, D), np.int64) - 1
        dt_ignore = np.zeros((T, D), bool)
        gt_matched = np.zeros((T, G), np.int64) - 1
        if D and G:
            # greedy matching, vectorized over (T, G); only the (inherently
            # sequential) loop over score-ordered detections remains.
            # pycocotools semantics: a det claims the unmatched gt with the
            # highest IoU >= thr, preferring non-ignored gt regardless of
            # IoU; the LAST equal-IoU gt wins ties (pycocotools' loop uses
            # 'ious < best: continue' then overwrites), so argmax runs over
            # the reversed gt axis.
            thr = np.minimum(IOU_THRESHOLDS, 1 - 1e-10)[:, None]  # [T,1]
            t_idx = np.arange(T)
            for di in range(D):
                iou_d = ious[di][None, :]                       # [1,G]
                cand = (gt_matched < 0) & (iou_d >= thr)        # [T,G]
                cand_non = cand & ~gt_ignore[None, :]
                use_non = cand_non.any(axis=1)                  # [T]
                cand_eff = np.where(use_non[:, None], cand_non, cand)
                masked = np.where(cand_eff, iou_d, -1.0)
                best = G - 1 - masked[:, ::-1].argmax(axis=1)   # [T]
                found = masked[t_idx, best] >= 0
                sel = t_idx[found]
                bg = best[found]
                gt_matched[sel, bg] = di
                dt_matched[sel, di] = bg
                dt_ignore[sel, di] = gt_ignore[bg]
        # unmatched dets outside area range are ignored
        d_area = (dt_boxes[:, 2] - dt_boxes[:, 0]) * (dt_boxes[:, 3] - dt_boxes[:, 1])
        d_out = (d_area < area_rng[0]) | (d_area > area_rng[1])
        dt_ignore = dt_ignore | ((dt_matched == -1) & d_out[None, :])
        return dt_scores, dt_matched >= 0, dt_ignore, int(np.sum(~gt_ignore))

    def _evaluate_all(self, cls_list, area_rng):
        """Match once per (image, class) at maxDet=100; smaller maxDets slice
        these results (greedy matching is prefix-stable in det order, the
        pycocotools accumulate trick)."""
        return [
            [
                self._evaluate_image(p, t, cls, area_rng, MAX_DETS[-1])
                for p, t in zip(self._preds, self._targets)
            ]
            for cls in cls_list
        ]

    def _accumulate_from(self, evals, max_det):
        """Per-class AP[T] / AR[T] from cached per-image match results."""
        T = len(IOU_THRESHOLDS)
        n_cls = len(evals)
        ap = np.full((T, n_cls), np.nan)
        ar = np.full((T, n_cls), np.nan)
        eps = np.finfo(np.float64).eps
        for ci in range(n_cls):
            per_img = evals[ci]
            n_gt = sum(e[3] for e in per_img)
            if n_gt == 0:
                continue
            scores = np.concatenate([e[0][:max_det] for e in per_img])
            matched = np.concatenate([e[1][:, :max_det] for e in per_img], axis=1)
            ignored = np.concatenate([e[2][:, :max_det] for e in per_img], axis=1)
            order = np.argsort(-scores, kind="mergesort")
            m = matched[:, order]
            ig = ignored[:, order]
            # ignored dets contribute neither tp nor fp: with masked cumsums
            # they duplicate the previous PR point, which leaves the envelope,
            # the recall endpoints, and the 101-pt interpolation unchanged.
            tp = np.cumsum(m & ~ig, axis=1).astype(np.float64)
            fp = np.cumsum(~m & ~ig, axis=1).astype(np.float64)
            rec = tp / n_gt
            prec = tp / np.maximum(tp + fp, eps)
            n = rec.shape[1]
            if n == 0:
                ap[:, ci] = 0.0
                ar[:, ci] = 0.0
                continue
            ar[:, ci] = rec[:, -1]
            prec_env = np.maximum.accumulate(prec[:, ::-1], axis=1)[:, ::-1]
            for ti in range(T):
                inds = np.searchsorted(rec[ti], RECALL_THRESHOLDS, side="left")
                valid = inds < n
                q = np.where(valid, prec_env[ti][np.minimum(inds, n - 1)], 0.0)
                ap[ti, ci] = np.mean(q)
        return ap, ar

    def compute(self) -> Dict[str, float]:
        cls_list = sorted(
            set(
                int(c)
                for t in self._targets
                for c in t["labels"].tolist()
            )
            | set(int(c) for p in self._preds for c in p["labels"].tolist())
        )
        if not cls_list:
            return {k: -1.0 for k in (
                "map", "map_50", "map_75", "map_small", "map_medium", "map_large",
                "mar_1", "mar_10", "mar_100", "mar_small", "mar_medium", "mar_large",
            )}

        def mean_or_neg(x):
            x = x[~np.isnan(x)]
            return float(np.mean(x)) if x.size else -1.0

        evals_all = self._evaluate_all(cls_list, AREA_RANGES["all"])
        ap_all, _ = self._accumulate_from(evals_all, 100)
        out = {
            "map": mean_or_neg(ap_all),
            "map_50": mean_or_neg(ap_all[0]),
            "map_75": mean_or_neg(ap_all[5]),
        }
        for name in ("small", "medium", "large"):
            evals_a = self._evaluate_all(cls_list, AREA_RANGES[name])
            ap_a, ar_a = self._accumulate_from(evals_a, 100)
            out[f"map_{name}"] = mean_or_neg(ap_a)
            out[f"mar_{name}"] = mean_or_neg(ar_a)
        for md in MAX_DETS:
            _, ar_md = self._accumulate_from(evals_all, md)
            out[f"mar_{md}"] = mean_or_neg(ar_md)
        if self.class_metrics:
            out["map_per_class"] = [mean_or_neg(ap_all[:, ci]) for ci in range(len(cls_list))]
            out["classes"] = cls_list
        return out


class Detection:
    """Namespace-compatible wrapper (reference: src/metrics/metrics.py:14-32
    exposes `metrics.Detection().map`)."""

    def __init__(self, class_metrics: bool = False):
        self.map = MeanAveragePrecision(class_metrics=class_metrics)


def iou_bboxes(boxes1: np.ndarray, boxes2: np.ndarray) -> np.ndarray:
    """Plain pairwise IoU helper (reference: src/metrics/metrics.py:23-27)."""
    return _iou_matrix(
        np.asarray(boxes1, np.float64).reshape(-1, 4),
        np.asarray(boxes2, np.float64).reshape(-1, 4),
    )
