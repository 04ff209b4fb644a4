"""Class-agnostic instance segmentation metrics: AP / P / R / F1.

Behavioral port of the reference Metrics class
(pipeline/metrics/metrics_class.py:15-340), producing bit-identical numbers:

  * labels with fewer than `min_points` points are zeroed in place
    (metrics_class.py:302-309);
  * P/R/F1 at IoU 0.5 via greedy matching: predictions in ascending label
    order each claim the first (ascending) unused GT with IoU >= thresh
    (metrics_class.py:61-117);
  * AP per IoU threshold via a precision/recall walk seeded with (1.0, 0.0)
    and np.trapz (metrics_class.py:181-235); predictions ordered by
    confidence (stable desc sort) when given, else label-ascending with
    conf 0.5; AP = mean over thresholds 0.5..0.95, plus AP@0.25 / AP@0.5;
  * S_assoc from the LSTQ evaluator on the *unfiltered-by-0* full labels.

The O(|preds| x |gts| x N) np.intersect1d loops of the reference are replaced
by one joint-label contingency table (np.unique over a packed key); the IoU
values are the same integer ratios, so every comparison and every float
output is unchanged.
"""

from __future__ import annotations

import json
import os

import numpy as np

from autoinst_tpu.metrics.s_assoc import SAssocEvaluator

OVERLAPS = (0.25, 0.5, 0.55, 0.6, 0.65, 0.7, 0.75, 0.8, 0.85, 0.9, 0.95)
AP_OVERLAPS = (0.5, 0.55, 0.6, 0.65, 0.7, 0.75, 0.8, 0.85, 0.9, 0.95)


def filter_small_instances(labels: np.ndarray, min_points: int,
                           background: int = 0) -> np.ndarray:
    """Zero out ids with < min_points support; mutates and returns `labels`."""
    ids, counts = np.unique(labels, return_counts=True)
    small = ids[counts < min_points]
    if small.size:
        labels[np.isin(labels, small)] = background
    return labels


def canonicalize_label_order(base: np.ndarray, *arrays: np.ndarray):
    """Renumber instance ids by first occurrence in `base` (0 stays 0).

    The greedy matcher and the no-confidence AP walk order predictions by
    *ascending label id* (reference metrics_class.py:61-117/181-235), so two
    pipelines producing IDENTICAL segmentations under different arbitrary
    label numbering can score different P/R/AP. First-occurrence
    renumbering makes the evaluation invariant to that arbitrariness; the
    parity harness applies it to both sides (scripts/run_parity.py). Off by
    default everywhere else: reference metric semantics keep the raw ids.

    Returns the remapped copies of `arrays`; ids absent from `base`
    (remove_semantics zeros) map to 0.
    """
    ids, first = np.unique(base, return_index=True)
    rank = np.zeros(len(ids), dtype=base.dtype)
    nz = np.nonzero(ids != 0)[0]
    rank[nz[np.argsort(first[nz])]] = np.arange(1, len(nz) + 1,
                                                dtype=base.dtype)
    out = []
    for a in arrays:
        pos = np.clip(np.searchsorted(ids, a), 0, len(ids) - 1)
        hit = ids[pos] == a
        out.append(np.where(hit, rank[pos], 0).astype(base.dtype))
    return out


def _contingency(pred: np.ndarray, gt: np.ndarray):
    """Intersection areas between every (pred id, gt id) pair plus sizes."""
    pred = pred.astype(np.int64).ravel()
    gt = gt.astype(np.int64).ravel()
    pids, psz = np.unique(pred, return_counts=True)
    gids, gsz = np.unique(gt, return_counts=True)
    # pack pairs into one key; shift to nonnegative first so labels like -1
    # cannot collide
    pshift, gshift = int(pred.min()), int(gt.min())
    denom = int(gt.max()) - gshift + 1
    key = (pred - pshift) * np.int64(denom) + (gt - gshift)
    kid, kcnt = np.unique(key, return_counts=True)
    inter: dict[int, dict[int, int]] = {}
    for k, c in zip(kid.tolist(), kcnt.tolist()):
        p, g = divmod(k, denom)
        inter.setdefault(p + pshift, {})[g + gshift] = c
    return (dict(zip(pids.tolist(), psz.tolist())),
            dict(zip(gids.tolist(), gsz.tolist())), inter)


class InstanceMetrics:
    """Drop-in equivalent of the reference `Metrics` (metrics_class.py:15)."""

    def __init__(self, name: str = "NCuts", min_points: int = 200,
                 thresh: float = 0.5, out_dir: str = "results/"):
        self.name = name
        self.min_points = min_points
        self.thresh = thresh
        self.background_label = 0
        self.out_dir = out_dir
        self.eval_lstq = SAssocEvaluator(min_points=min_points)
        self.sequence_metrics = {k: [] for k in
                                 ("ap0.5", "ap0.25", "ap", "p", "r", "f1",
                                  "S_assoc")}
        self.ap: dict[float, float] = {}
        # greedy-matching bookkeeping at the P/R threshold
        self._tp_ious: list[float] = []
        self._all_tp = 0
        self._all_pred_size = 0
        self._all_gt_size = 0

    # -- matching ----------------------------------------------------------

    @staticmethod
    def _greedy_match(psz, gsz, inter, iou_thresh, order, record=None):
        """Predictions in `order` each claim the first ascending unused GT
        with IoU >= thresh (metrics_class.py:78-97, 209-221)."""
        gt_ids = sorted(g for g in gsz if g != 0)
        used = set()
        tp = fp = 0
        for p in order:
            matched = False
            row = inter.get(p, {})
            for g in gt_ids:
                i = row.get(g, 0)
                if i == 0 or g in used:
                    continue
                iou = i / (psz[p] + gsz[g] - i)
                if iou >= iou_thresh:
                    matched = True
                    used.add(g)
                    if record is not None:
                        record.append(iou)
                    break
            if matched:
                tp += 1
            else:
                fp += 1
        return tp, fp

    def _average_precision(self, psz, gsz, inter, confs, iou_thresh):
        """AP at one IoU threshold (metrics_class.py:181-235)."""
        pred_ids = sorted(p for p in psz if p != 0)
        gt_ids = sorted(g for g in gsz if g != 0)
        if confs:
            pred_ids = sorted(pred_ids, key=lambda p: confs[p], reverse=True)
        precision = [1.0]
        recall = [0.0]
        tp = fp = 0
        fn = len(gt_ids)
        used = set()
        for p in pred_ids:
            matched = False
            row = inter.get(p, {})
            for g in gt_ids:
                i = row.get(g, 0)
                if i == 0 or g in used:
                    continue
                iou = i / (psz[p] + gsz[g] - i)
                if iou >= iou_thresh:
                    matched = True
                    used.add(g)
                    break
            if matched:
                tp += 1
                fn -= 1
            else:
                fp += 1
            precision.append(tp / float(tp + fp))
            recall.append(tp / float(tp + fn))
        return float(np.trapezoid(precision, recall))

    # -- public API --------------------------------------------------------

    def update_stats(self, all_labels: np.ndarray, pred_labels: np.ndarray,
                     gt_labels: np.ndarray, confs: dict | None = None,
                     calc_all: bool = True, calc_lstq: bool = True):
        """One map's worth of statistics (metrics_class.py:137-179).

        all_labels: raw NCut labels (pre semantic filtering), for S_assoc.
        pred_labels: labels after `remove_semantics`. gt_labels: GT ids.
        """
        pred_labels = filter_small_instances(pred_labels, self.min_points)
        all_labels = filter_small_instances(all_labels, self.min_points)

        psz, gsz, inter = _contingency(pred_labels, gt_labels)

        out = {}
        if calc_all:
            order = sorted(p for p in psz if p != 0)
            # _tp_ious accumulates across maps, like the reference's
            # all_matches bookkeeping (metrics_class.py:288-294)
            tp, _ = self._greedy_match(psz, gsz, inter, 0.5, order,
                                       record=self._tp_ious)
            if 0 in gsz:
                self._all_gt_size += len(gsz) - 1
            self._all_pred_size += len(psz) - (1 if 0 in psz else 0)
            self._all_tp += tp
            # degenerate maps (zero surviving predictions/GT) score 0
            # rather than raising (the reference would crash here too,
            # metrics_class.py:157-159; robustness per SURVEY §5.3)
            prec = (self._all_tp / self._all_pred_size
                    if self._all_pred_size else 0.0)
            rec = (self._all_tp / self._all_gt_size
                   if self._all_gt_size else 0.0)
            try:
                f1 = 2 * (prec * rec) / (prec + rec)
            except ZeroDivisionError:
                f1 = 0
            mean_iou = (float(np.array(self._tp_ious).mean())
                        if self._tp_ious else 0.0)
            out = {"fScore": f1, "precision": prec, "recall": rec,
                   "panoptic": mean_iou * f1}

        lstq = None
        if calc_lstq:
            self.eval_lstq.add_batch(all_labels, gt_labels)
            lstq = self.eval_lstq.get_eval()

        confs = confs or {}
        for o in OVERLAPS:
            self.ap[o] = self._average_precision(psz, gsz, inter, confs, o)
        ap = sum(self.ap[o] for o in AP_OVERLAPS) / float(len(AP_OVERLAPS))

        self.sequence_metrics["p"].append(out["precision"])
        self.sequence_metrics["r"].append(out["recall"])
        self.sequence_metrics["f1"].append(out["fScore"])
        self.sequence_metrics["ap0.25"].append(self.ap[0.25])
        self.sequence_metrics["ap0.5"].append(self.ap[0.5])
        self.sequence_metrics["ap"].append(ap)
        self.sequence_metrics["S_assoc"].append(lstq)

        return out, {"0.25": self.ap[0.25], "0.5": self.ap[0.5], "ap": ap,
                     "lstq": lstq}

    def sequence_stats(self, out_dir: str | None = None):
        """Average over maps and persist one JSON (metrics_class.py:260-283)."""
        out_dir = out_dir or self.out_dir
        avg = lambda xs: sum(xs) / float(len(xs))
        results = {
            "p": avg(self.sequence_metrics["p"]),
            "r": avg(self.sequence_metrics["r"]),
            "f1": avg(self.sequence_metrics["f1"]),
            "ap": avg(self.sequence_metrics["ap"]),
            "ap0.25": avg(self.sequence_metrics["ap0.25"]),
            "ap0.5": avg(self.sequence_metrics["ap0.5"]),
            "S_assoc": avg(self.sequence_metrics["S_assoc"]),
        }
        for k, label in (("p", "Precision"), ("r", "Recall"), ("f1", "F score"),
                         ("S_assoc", "S_assoc"), ("ap0.25", "AP @ 0.25"),
                         ("ap0.5", "AP @ 0.5"), ("ap", "AP @ [0.5:0.95]")):
            print(f"{label}: {results[k]}")
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, self.name), "w") as fh:
            json.dump(results, fh)
        return results
