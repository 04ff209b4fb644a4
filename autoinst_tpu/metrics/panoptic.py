"""Panoptic quality evaluation: PQ / SQ / RQ + semantic IoU (+ 4D variant).

Behavioral port of the reference PanopticEval / Panoptic4DEval
(self-training/mask_pls/utils/eval_np.py:11-484): per class, instance pairs
with IoU > 0.5 are TPs; unmatched GT (area >= min_points) are FNs; unmatched
predictions (area >= min_points) are FPs; SQ = mean TP IoU, RQ =
TP/(TP + FP/2 + FN/2), PQ = SQ * RQ, averaged over non-ignored classes.
Semantic IoU comes from a class confusion matrix with ignored-class
predictions zeroed column-wise.

The 4D (temporal) variant associates instance tubes across scans of a
sequence: per (class, sequence), GT/pred instance ids are global and the
association quality AQ follows the LSTQ formulation.
"""

from __future__ import annotations

import numpy as np

EPS = 1e-15


class PanopticEval:
    def __init__(self, n_classes: int, ignore=None, offset: int = 2 ** 32,
                 min_points: int = 30):
        self.n_classes = n_classes
        self.ignore = np.array(ignore if ignore is not None else [],
                               np.int64)
        self.include = np.array(
            [c for c in range(n_classes) if c not in self.ignore], np.int64)
        self.offset = offset
        self.min_points = min_points
        self.reset()

    def reset(self):
        self.conf = np.zeros((self.n_classes, self.n_classes), np.int64)
        self.pan_tp = np.zeros(self.n_classes, np.int64)
        self.pan_iou = np.zeros(self.n_classes, np.double)
        self.pan_fp = np.zeros(self.n_classes, np.int64)
        self.pan_fn = np.zeros(self.n_classes, np.int64)

    def merge(self, other: "PanopticEval"):
        self.conf += other.conf
        self.pan_tp += other.pan_tp
        self.pan_iou += other.pan_iou
        self.pan_fp += other.pan_fp
        self.pan_fn += other.pan_fn

    # ---- semantic IoU ------------------------------------------------------

    def _add_sem(self, x_sem, y_sem):
        idx = x_sem.reshape(-1) * self.n_classes + y_sem.reshape(-1)
        self.conf += np.bincount(
            idx, minlength=self.n_classes ** 2
        ).reshape(self.n_classes, self.n_classes)

    def _sem_stats(self):
        conf = self.conf.astype(np.double).copy()
        conf[:, self.ignore] = 0
        tp = conf.diagonal()
        fp = conf.sum(axis=1) - tp
        fn = conf.sum(axis=0) - tp
        return tp, fp, fn

    def getSemIoU(self):
        tp, fp, fn = self._sem_stats()
        union = np.maximum(tp + fp + fn, EPS)
        iou = tp / union
        return iou[self.include].mean(), iou

    def getSemAcc(self):
        tp, fp, fn = self._sem_stats()
        total = np.maximum(tp[self.include].sum() + fp[self.include].sum(),
                           EPS)
        return tp.sum() / total

    # ---- panoptic ----------------------------------------------------------

    def _add_panoptic(self, x_sem, x_inst, y_sem, y_inst):
        x_sem = np.asarray(x_sem, np.int64).reshape(-1)
        x_inst = np.asarray(x_inst, np.int64).reshape(-1) + 1
        y_sem = np.asarray(y_sem, np.int64).reshape(-1)
        y_inst = np.asarray(y_inst, np.int64).reshape(-1) + 1
        for cl in self.ignore:
            keep = y_sem != cl
            x_sem, x_inst = x_sem[keep], x_inst[keep]
            y_sem, y_inst = y_sem[keep], y_inst[keep]

        for cl in self.include:
            xi = x_inst * (x_sem == cl)
            yi = y_inst * (y_sem == cl)
            up, cp = np.unique(xi[xi > 0], return_counts=True)
            ug, cg = np.unique(yi[yi > 0], return_counts=True)
            pred_area = dict(zip(up.tolist(), cp.tolist()))
            gt_area = dict(zip(ug.tolist(), cg.tolist()))

            both = (xi > 0) & (yi > 0)
            combo = xi[both] + self.offset * yi[both]
            uc, cc = np.unique(combo, return_counts=True)
            gt_l = uc // self.offset
            pr_l = uc % self.offset
            inter = cc.astype(np.float64)
            union = np.array([gt_area[g] + pred_area[p] for g, p in
                              zip(gt_l.tolist(), pr_l.tolist())]) - inter
            ious = inter / union
            tp = ious > 0.5
            self.pan_tp[cl] += tp.sum()
            self.pan_iou[cl] += ious[tp].sum()
            matched_gt = set(gt_l[tp].tolist())
            matched_pr = set(pr_l[tp].tolist())
            self.pan_fn[cl] += sum(
                1 for g, a in gt_area.items()
                if a >= self.min_points and g not in matched_gt)
            self.pan_fp[cl] += sum(
                1 for p, a in pred_area.items()
                if a >= self.min_points and p not in matched_pr)

    def getPQ(self):
        sq = self.pan_iou / np.maximum(self.pan_tp.astype(np.double), EPS)
        rq = self.pan_tp / np.maximum(
            self.pan_tp + 0.5 * self.pan_fp + 0.5 * self.pan_fn, EPS)
        pq = sq * rq
        return (pq[self.include].mean(), sq[self.include].mean(),
                rq[self.include].mean(), pq, sq, rq)

    def addBatch(self, x_sem, x_inst, y_sem, y_inst):
        self._add_sem(np.asarray(x_sem), np.asarray(y_sem))
        self._add_panoptic(np.asarray(x_sem), np.asarray(x_inst),
                           np.asarray(y_sem), np.asarray(y_inst))


class Panoptic4DEval:
    """Temporal association quality (reference eval_np.py:243-484):
    per (class, sequence), accumulate global instance areas + intersections
    across scans; AQ = mean over GT tubes of sum_p TPA * IoU / |gt|."""

    def __init__(self, n_classes: int, ignore=None, offset: int = 2 ** 32,
                 min_points: int = 30):
        self.n_classes = n_classes
        self.ignore = np.array(ignore if ignore is not None else [], np.int64)
        self.include = np.array(
            [c for c in range(n_classes) if c not in self.ignore], np.int64)
        self.offset = offset
        self.min_points = min_points
        self.sem_eval = PanopticEval(n_classes, ignore=ignore,
                                     min_points=min_points)
        self.reset()

    def reset(self):
        self.preds: dict = {}        # (cl, seq) -> {pred_id: area}
        self.gts: dict = {}          # (cl, seq) -> {gt_id: area}
        self.intersects: dict = {}   # (cl, seq) -> {key: area}
        self.sem_eval.reset()

    def addBatch(self, seq, x_sem, x_inst, y_sem, y_inst):
        x_sem = np.asarray(x_sem, np.int64).reshape(-1)
        x_inst = np.asarray(x_inst, np.int64).reshape(-1) + 1
        y_sem = np.asarray(y_sem, np.int64).reshape(-1)
        y_inst = np.asarray(y_inst, np.int64).reshape(-1) + 1
        self.sem_eval._add_sem(x_sem, y_sem)
        for cl in self.ignore:
            keep = y_sem != cl
            x_sem, x_inst = x_sem[keep], x_inst[keep]
            y_sem, y_inst = y_sem[keep], y_inst[keep]
        for cl in self.include:
            key = (int(cl), seq)
            xi = x_inst * (x_sem == cl)
            yi = y_inst * (y_sem == cl)
            pd = self.preds.setdefault(key, {})
            gd = self.gts.setdefault(key, {})
            it = self.intersects.setdefault(key, {})
            for ids, d in ((xi, pd), (yi, gd)):
                u, c = np.unique(ids[ids > 0], return_counts=True)
                for i, a in zip(u.tolist(), c.tolist()):
                    d[i] = d.get(i, 0) + a
            both = (xi > 0) & (yi > 0)
            combo = xi[both] + self.offset * yi[both]
            u, c = np.unique(combo, return_counts=True)
            for i, a in zip(u.tolist(), c.tolist()):
                it[i] = it.get(i, 0) + a

    def getAQ(self):
        num = np.zeros(self.n_classes, np.double)
        den = np.zeros(self.n_classes, np.double)
        for (cl, seq), gd in self.gts.items():
            pd = self.preds.get((cl, seq), {})
            it = self.intersects.get((cl, seq), {})
            for g, garea in gd.items():
                if garea < self.min_points:
                    continue
                inner = 0.0
                for p, parea in pd.items():
                    tpa = it.get(p + self.offset * g)
                    if tpa:
                        inner += tpa * (tpa / (garea + parea - tpa))
                num[cl] += inner / garea
                den[cl] += 1
        aq = num / np.maximum(den, EPS)
        return aq[self.include].mean(), aq

    def getPQ4D(self):
        aq_mean, aq = self.getAQ()
        iou_mean, iou = self.sem_eval.getSemIoU()
        return float(np.sqrt(aq_mean * iou_mean)), aq, iou
