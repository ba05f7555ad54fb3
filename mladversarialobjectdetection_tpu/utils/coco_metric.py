"""COCO-style mean-average-precision evaluation, dependency-free.

Behavioral parity with reference coco_metric.py (EvaluationMetric, 50-280):
AP@[.5:.95:.05] / AP50 / AP75 over padded detection outputs, implemented in
numpy without pycocotools (unavailable in this environment). Standard COCO
101-point interpolation; greedy per-image matching in score order against
highest-IoU unmatched ground truth.

Host-side: evaluation consumes fetched detections, never device time.
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

from ..ops.nms_np import iou_np

IOU_THRESHOLDS = np.arange(0.5, 1.0, 0.05)
RECALL_POINTS = np.linspace(0.0, 1.0, 101)


class COCOEvaluator:
    """Accumulate per-image detections + ground truths, compute mAP."""

    def __init__(self, iou_thresholds: Sequence[float] = IOU_THRESHOLDS):
        self.iou_thresholds = np.asarray(iou_thresholds)
        self._dets: List[dict] = []
        self._n_gt: Dict[int, int] = {}
        self._image_id = 0

    def add_image(self, det_boxes, det_scores, det_classes,
                  gt_boxes, gt_classes) -> None:
        """Add one image. Boxes are [N, 4] (ymin, xmin, ymax, xmax); classes
        are int ids (any consistent labeling)."""
        det_boxes = np.asarray(det_boxes, np.float64).reshape(-1, 4)
        det_scores = np.asarray(det_scores, np.float64).reshape(-1)
        det_classes = np.asarray(det_classes).reshape(-1).astype(int)
        gt_boxes = np.asarray(gt_boxes, np.float64).reshape(-1, 4)
        gt_classes = np.asarray(gt_classes).reshape(-1).astype(int)

        img = self._image_id
        self._image_id += 1
        for c in gt_classes:
            self._n_gt[c] = self._n_gt.get(c, 0) + 1

        for c in np.unique(np.concatenate([det_classes, gt_classes])
                           if len(det_classes) + len(gt_classes) else []):
            d_idx = np.where(det_classes == c)[0]
            g_idx = np.where(gt_classes == c)[0]
            order = d_idx[np.argsort(-det_scores[d_idx])]
            matched = {float(t): set() for t in self.iou_thresholds}
            for di in order:
                ious = (iou_np(det_boxes[di], gt_boxes[g_idx])
                        if len(g_idx) else np.zeros(0))
                rec = {"score": det_scores[di], "class": int(c), "tp": {}}
                for t in self.iou_thresholds:
                    t = float(t)
                    best, best_iou = -1, t
                    for k, gi in enumerate(g_idx):
                        if gi in matched[t]:
                            continue
                        if ious[k] >= best_iou:
                            best, best_iou = gi, ious[k]
                    if best >= 0:
                        matched[t].add(best)
                        rec["tp"][t] = True
                    else:
                        rec["tp"][t] = False
                self._dets.append(rec)

    def _ap_for(self, cls: int, thresh: float) -> float | None:
        n_gt = self._n_gt.get(cls, 0)
        if n_gt == 0:
            return None
        recs = sorted((d for d in self._dets if d["class"] == cls),
                      key=lambda d: -d["score"])
        if not recs:
            return 0.0
        tp = np.asarray([d["tp"][thresh] for d in recs], np.float64)
        fp = 1.0 - tp
        tp_cum = np.cumsum(tp)
        fp_cum = np.cumsum(fp)
        recall = tp_cum / n_gt
        precision = tp_cum / np.maximum(tp_cum + fp_cum, 1e-12)
        # monotone envelope + 101-point interpolation
        for i in range(len(precision) - 2, -1, -1):
            precision[i] = max(precision[i], precision[i + 1])
        idx = np.searchsorted(recall, RECALL_POINTS, side="left")
        return float(np.mean(np.where(idx < len(precision),
                                      precision[np.minimum(idx,
                                                           len(precision) - 1)],
                                      0.0)))

    def result(self) -> Dict[str, float]:
        classes = sorted(self._n_gt.keys())
        per_thresh = []
        for t in self.iou_thresholds:
            aps = [self._ap_for(c, float(t)) for c in classes]
            aps = [a for a in aps if a is not None]
            per_thresh.append(np.mean(aps) if aps else 0.0)
        out = {"AP": float(np.mean(per_thresh)) if per_thresh else 0.0}
        for t, v in zip(self.iou_thresholds, per_thresh):
            if abs(t - 0.5) < 1e-6:
                out["AP50"] = float(v)
            if abs(t - 0.75) < 1e-6:
                out["AP75"] = float(v)
        return out
