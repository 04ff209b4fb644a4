"""Association score S_assoc (the LSTQ association term).

Behavioral port of the reference evaluator (pipeline/metrics/modified_LSTQ.py:3-80):
per batch, per GT instance g:  sum over predictions p of
TPA(p,g) * IoU(p,g) / |g|, averaged over GT instances, then over batches.
Pred label 0/-1 and GT label 0 are background; GT instances with area
<= min_points are dropped (strict >, modified_LSTQ.py:31).

The reference builds Python dicts keyed by `pred + gt * 2^32`; here the same
quantities come from one vectorized np.unique over the joint key, producing
identical integer areas and therefore identical float results.
"""

from __future__ import annotations

import numpy as np

_OFFSET = 2 ** 32


class SAssocEvaluator:
    def __init__(self, min_points: int = 200):
        self.min_points = min_points
        self.reset()

    def reset(self):
        self._batches: list[tuple[dict, dict, dict]] = []

    def add_batch(self, pred_labels: np.ndarray, gt_labels: np.ndarray):
        pred_labels = np.asarray(pred_labels).astype(np.int64).ravel()
        gt_labels = np.asarray(gt_labels).astype(np.int64).ravel()

        pv = pred_labels[(pred_labels != 0) & (pred_labels != -1)]
        pl_, pa = np.unique(pv, return_counts=True)
        preds = dict(zip(pl_.tolist(), pa.tolist()))

        gv = gt_labels[gt_labels != 0]
        gl, ga = np.unique(gv, return_counts=True)
        keep = ga > self.min_points
        gts = dict(zip(gl[keep].tolist(), ga[keep].tolist()))

        both = (pred_labels > 0) & (gt_labels > 0)
        key = pred_labels[both] + gt_labels[both] * _OFFSET
        kl, ka = np.unique(key, return_counts=True)
        intersects = dict(zip(kl.tolist(), ka.tolist()))

        self._batches.append((preds, gts, intersects))

    def get_eval(self) -> float:
        scores = []
        for preds, gts, intersects in self._batches:
            outer = 0.0
            for gt_id, gt_area in gts.items():
                inner = 0.0
                for pred_id, pred_area in preds.items():
                    tpa_key = pred_id + gt_id * _OFFSET
                    tpa = intersects.get(tpa_key)
                    if tpa is not None:
                        inner += tpa * (tpa / (gt_area + pred_area - tpa))
                outer += float(inner) / float(gt_area)
            if gts:
                scores.append(outer / len(gts))
        # no batch had a surviving GT instance: return 0.0 instead of nan.
        # The reference crashes here (modified_LSTQ.py:80 mean of []); we
        # follow InstanceMetrics' robustness choice (instance_metrics.py
        # zero-division guards) for consistency (VERDICT r3 #8).
        if not scores:
            return 0.0
        return float(np.average(scores))
