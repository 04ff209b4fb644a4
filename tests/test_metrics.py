"""Metrics parity tests against a literal (slow) oracle of the reference.

The oracle below follows the reference control flow statement by statement
(metrics_class.py / modified_LSTQ.py) using np.intersect1d set math, so any
semantic drift in the fast contingency-based implementation shows up here.
"""

import numpy as np
import pytest

from autoinst_tpu.metrics import InstanceMetrics, SAssocEvaluator
from autoinst_tpu.metrics.instance_metrics import filter_small_instances


# ---------------------------------------------------------------- oracles


def oracle_filter(label, min_points=200):
    for clid in np.unique(label):
        idcs = np.where(label == clid)[0]
        if idcs.shape[0] < min_points:
            label[idcs] = 0
    return label


def oracle_iou(pi, gi):
    return np.intersect1d(pi, gi).size / np.union1d(pi, gi).size


def oracle_tp_fp(pred_labels, gt_labels, iou_thresh):
    tp, fp = 0, 0
    used = set()
    ious = []
    for p in np.unique(pred_labels):
        if p == 0:
            continue
        pi = np.where(pred_labels == p)[0]
        matched = False
        for g in np.unique(gt_labels):
            if g == 0:
                continue
            gi = np.where(gt_labels == g)[0]
            iou = oracle_iou(pi, gi)
            if iou >= iou_thresh and g not in used:
                matched = True
                tp += 1
                used.add(g)
                ious.append(iou)
                break
        if not matched:
            fp += 1
    return tp, fp, ious


def oracle_ap(pred, gt, confs, iou_thresh):
    uniq_gt = [g for g in np.unique(gt) if g != 0]
    uniq_pred = [p for p in np.unique(pred) if p != 0]
    conf = {p: (confs[p] if confs else 0.5) for p in uniq_pred}
    if confs:
        conf = dict(sorted(conf.items(), key=lambda kv: kv[1], reverse=True))
    precision, recall = [1.0], [0.0]
    tp, fp, fn = 0, 0, len(uniq_gt)
    used = []
    for p in conf:
        pi = np.where(pred == p)[0]
        matched = False
        for g in uniq_gt:
            gi = np.where(gt == g)[0]
            if oracle_iou(pi, gi) >= iou_thresh and g not in used:
                matched = True
                used.append(g)
                break
        if matched:
            tp += 1
            fn -= 1
        else:
            fp += 1
        precision.append(tp / float(tp + fp))
        recall.append(tp / float(tp + fn))
    return np.trapezoid(precision, recall)


def oracle_s_assoc(batches, min_points=200):
    scores = []
    for pred_labels, gt_labels in batches:
        pm = np.logical_and(pred_labels != 0, pred_labels != -1)
        gm = gt_labels != 0
        pl_, pa = np.unique(pred_labels[pm], return_counts=True)
        gl, ga = np.unique(gt_labels[gm], return_counts=True)
        gl, ga = gl[ga > min_points], ga[ga > min_points]
        outer = 0.0
        for g, garea in zip(gl, ga):
            inner = 0.0
            for p, parea in zip(pl_, pa):
                tpa = np.sum((pred_labels == p) & (gt_labels == g)
                             & (pred_labels > 0) & (gt_labels > 0))
                if tpa > 0:
                    inner += tpa * (tpa / (garea + parea - tpa))
            outer += float(inner) / float(garea)
        if len(gl):
            scores.append(outer / len(gl))
    return np.average(scores)


def synthetic_labels(seed, n=3000, n_gt=6, n_pred=8, noise=0.15):
    rng = np.random.default_rng(seed)
    gt = rng.integers(0, n_gt, size=n)
    pred = gt.copy()
    # shuffle some points into wrong/extra predictions
    flip = rng.random(n) < noise
    pred[flip] = rng.integers(0, n_pred, size=flip.sum())
    return pred.astype(np.int64), gt.astype(np.int64)


# ------------------------------------------------------------------ tests


class TestFilter:
    @pytest.mark.parametrize("seed", [0, 1])
    def test_matches_oracle(self, seed):
        pred, _ = synthetic_labels(seed, n=2000)
        a, b = pred.copy(), pred.copy()
        np.testing.assert_array_equal(
            filter_small_instances(a, 300), oracle_filter(b, 300))


class TestSAssoc:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_oracle(self, seed):
        pred, gt = synthetic_labels(seed)
        ev = SAssocEvaluator(min_points=200)
        ev.add_batch(pred, gt)
        expect = oracle_s_assoc([(pred, gt)])
        assert ev.get_eval() == pytest.approx(expect, abs=0, rel=0)

    def test_multiple_batches(self):
        ev = SAssocEvaluator(min_points=100)
        batches = [synthetic_labels(s, n=1500) for s in (3, 4)]
        for p, g in batches:
            ev.add_batch(p, g)
        assert ev.get_eval() == pytest.approx(
            oracle_s_assoc(batches, min_points=100), abs=0, rel=0)

    def test_empty_batches_return_zero(self):
        # all GT instances below min_points: the reference crashes
        # (modified_LSTQ.py:80 np.mean of []); we return 0.0 to match
        # InstanceMetrics' robustness choice (VERDICT r3 #8)
        ev = SAssocEvaluator(min_points=1000)
        pred = np.ones(50, np.int64)
        gt = np.ones(50, np.int64)
        ev.add_batch(pred, gt)
        assert ev.get_eval() == 0.0


class TestInstanceMetrics:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_full_stats_match_oracle(self, seed):
        pred, gt = synthetic_labels(seed)
        allp = pred.copy()
        m = InstanceMetrics("test", min_points=50)
        out, aps = m.update_stats(allp.copy(), pred.copy(), gt.copy())

        # oracle path (reference statement order)
        pred_o = oracle_filter(pred.copy(), 50)
        tp, fp, ious = oracle_tp_fp(pred_o, gt, 0.5)
        n_pred = np.unique(pred_o).shape[0] - 1
        n_gt = np.unique(gt).shape[0] - 1 if 0 in gt else 0
        prec, rec = tp / n_pred, tp / n_gt
        f1 = 2 * prec * rec / (prec + rec)
        assert out["precision"] == prec
        assert out["recall"] == rec
        assert out["fScore"] == f1
        assert out["panoptic"] == (np.array(ious).mean() if ious else 0.0) * f1

        for o in (0.25, 0.5, 0.95):
            assert m.ap[o] == oracle_ap(pred_o, gt, {}, o)
        expect_lstq = oracle_s_assoc([(oracle_filter(allp.copy(), 50), gt)], 50)
        assert aps["lstq"] == pytest.approx(expect_lstq, abs=0, rel=0)

    def test_with_confidences(self):
        pred, gt = synthetic_labels(5)
        m = InstanceMetrics("conf", min_points=50)
        pred_f = oracle_filter(pred.copy(), 50)
        ids = [p for p in np.unique(pred_f) if p != 0]
        rng = np.random.default_rng(6)
        confs = {p: float(rng.random()) for p in ids}
        m.update_stats(pred.copy(), pred.copy(), gt.copy(), confs=confs)
        for o in (0.5, 0.75):
            assert m.ap[o] == oracle_ap(pred_f, gt, confs, o)

    def test_sequence_stats_roundtrip(self, tmp_path):
        pred, gt = synthetic_labels(7)
        m = InstanceMetrics("seqtest", min_points=50, out_dir=str(tmp_path))
        m.update_stats(pred.copy(), pred.copy(), gt.copy())
        results = m.sequence_stats()
        import json
        stored = json.load(open(tmp_path / "seqtest"))
        assert stored == results
        from autoinst_tpu.metrics.average_sequences import average_results
        assert average_results(str(tmp_path)) == results

    def test_accumulates_across_maps(self):
        # precision/recall denominators accumulate across update_stats calls
        m = InstanceMetrics("acc", min_points=10)
        p1, g1 = synthetic_labels(8, n=800)
        p2, g2 = synthetic_labels(9, n=800)
        m.update_stats(p1.copy(), p1.copy(), g1.copy())
        out2, _ = m.update_stats(p2.copy(), p2.copy(), g2.copy())

        p1f = oracle_filter(p1.copy(), 10)
        p2f = oracle_filter(p2.copy(), 10)
        tp1, _, _ = oracle_tp_fp(p1f, g1, 0.5)
        tp2, _, ious2 = oracle_tp_fp(p2f, g2, 0.5)
        n_pred = (np.unique(p1f).shape[0] - 1) + (np.unique(p2f).shape[0] - 1)
        n_gt = (np.unique(g1).shape[0] - 1) + (np.unique(g2).shape[0] - 1)
        assert out2["precision"] == (tp1 + tp2) / n_pred
        assert out2["recall"] == (tp1 + tp2) / n_gt
        # mean IoU in "panoptic" is per-map (reference resets all_matches? no:
        # it accumulates across maps inside one Metrics instance)


class TestColorPalettes:
    """Palette determinism regression: instance identity flows through float
    RGB uniqueness (run_pipeline.py:216-218), so the draw sequence is pinned
    (CPython Mersenne-Twister, seed 0; set iteration order)."""

    def test_map_palette_pinned(self):
        from autoinst_tpu.utils.colors import generate_random_colors_map
        assert generate_random_colors_map(5) == [
            (155, 244, 183), (111, 71, 144), (132, 248, 207),
            (197, 215, 20), (71, 48, 128)]

    def test_unseeded_palette_follows_global_rng(self):
        import random
        from autoinst_tpu.utils.colors import generate_random_colors
        random.seed(0)
        assert generate_random_colors(3) == [
            (197, 215, 20), (155, 244, 183), (132, 248, 207)]

    def test_no_black(self):
        from autoinst_tpu.utils.colors import generate_random_colors_map
        assert (0, 0, 0) not in generate_random_colors_map(600)


class TestCanonicalLabelOrder:
    """First-occurrence renumbering used by the parity harness so the
    label-ascending AP/greedy tie-breaks are numbering-invariant."""

    def test_first_occurrence_ranks(self):
        import numpy as np
        from autoinst_tpu.metrics.instance_metrics import \
            canonicalize_label_order
        base = np.array([7, 7, 3, 0, 3, 9, 9, 9])
        preds = np.array([7, 7, 0, 0, 3, 9, 9, 0])
        b, p = canonicalize_label_order(base, base, preds)
        assert b.tolist() == [1, 1, 2, 0, 2, 3, 3, 3]
        assert p.tolist() == [1, 1, 0, 0, 2, 3, 3, 0]

    def test_absent_and_negative_ids(self):
        import numpy as np
        from autoinst_tpu.metrics.instance_metrics import \
            canonicalize_label_order
        base = np.array([-5, 2, -5, 0])
        (c,) = canonicalize_label_order(base, base)
        assert c.tolist() == [1, 2, 1, 0]
        (x,) = canonicalize_label_order(base, np.array([4, 2, 100]))
        assert x.tolist() == [0, 2, 0]

    def test_metrics_invariant_under_relabeling(self):
        """Identical segmentations under different arbitrary numbering score
        identically once canonicalized (the parity-harness property)."""
        import numpy as np
        from autoinst_tpu.metrics.instance_metrics import (
            InstanceMetrics, canonicalize_label_order)
        rng = np.random.default_rng(3)
        gt = rng.integers(0, 5, 400)
        pred_a = gt.copy()
        # a different arbitrary numbering of the SAME segmentation
        remap = {0: 0, 1: 9, 2: 4, 3: 30, 4: 2}
        pred_b = np.vectorize(remap.get)(pred_a)

        def seq_stats(pred):
            (c,) = canonicalize_label_order(pred, pred)
            m = InstanceMetrics("t", min_points=1)
            m.update_stats(c, c.copy(), gt)
            return m.sequence_stats()

        a, b = seq_stats(pred_a), seq_stats(pred_b)
        assert a == b, (a, b)
