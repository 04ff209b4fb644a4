"""Cross-chunk consensus label fusion (pipeline/label_fusion.py)."""

import numpy as np

from autoinst_tpu.pipeline.label_fusion import (fuse_labels, knn_edges,
                                                register_points)


def _two_blobs(rng, gap=0.5, n=120):
    a = rng.normal(0.0, 0.12, (n, 3))
    b = rng.normal(0.0, 0.12, (n, 3)) + np.array([gap + 0.24, 0, 0])
    return np.vstack([a, b]), np.r_[np.zeros(n, np.int64),
                                    np.ones(n, np.int64)]


def test_majority_resolves_merge_split():
    rng = np.random.default_rng(0)
    pts, gt = _two_blobs(rng)
    # three chunks over the same points: two split the blobs, one merges
    split = gt
    merged = np.zeros(len(pts), np.int64)
    gids, n_global, uniq = register_points([pts, pts, pts])
    edges = knn_edges(uniq, k=6)
    fused = fuse_labels(gids, [split, split, merged], n_global, edges)
    fa = fused[gids[0]]
    # blobs end up in different components
    comp_a = np.unique(fa[gt == 0])
    comp_b = np.unique(fa[gt == 1])
    assert len(comp_a) == 1 and len(comp_b) == 1
    assert comp_a[0] != comp_b[0]


def test_majority_merge_wins():
    rng = np.random.default_rng(1)
    pts, gt = _two_blobs(rng, gap=0.05)  # touching -> kNN bridges the gap
    merged = np.zeros(len(pts), np.int64)
    gids, n_global, uniq = register_points([pts, pts, pts])
    edges = knn_edges(uniq, k=6)
    fused = fuse_labels(gids, [merged, merged, gt], n_global, edges)
    fa = fused[gids[0]]
    assert len(np.unique(fa)) == 1  # 2:1 vote to merge


def test_consistent_labels_preserved_partial_overlap():
    rng = np.random.default_rng(2)
    pts, gt = _two_blobs(rng)
    # chunk 1 sees the first 3/4 of points, chunk 2 the last 3/4
    n = len(pts)
    i1 = np.arange(0, 3 * n // 4)
    i2 = np.arange(n // 4, n)
    gids, n_global, uniq = register_points([pts[i1], pts[i2]])
    assert n_global == n  # shared points registered once
    edges = knn_edges(uniq, k=6)
    fused = fuse_labels(gids, [gt[i1], gt[i2]], n_global, edges)
    # fused partition matches gt exactly (up to renaming)
    for g in (0, 1):
        assert len(np.unique(fused[gids[0]][gt[i1] == g])) == 1
    assert (fused[gids[0]][gt[i1] == 0][0]
            != fused[gids[0]][gt[i1] == 1][0])
    # the same physical point gets the same fused label in both chunks
    shared1 = np.isin(i1, i2)
    shared2 = np.isin(i2, i1)
    assert np.array_equal(fused[gids[0]][shared1], fused[gids[1]][shared2])


def test_unlabeled_points_do_not_vote():
    rng = np.random.default_rng(3)
    pts, gt = _two_blobs(rng)
    unl = np.full(len(pts), -1, np.int64)
    gids, n_global, uniq = register_points([pts, pts])
    edges = knn_edges(uniq, k=6)
    fused = fuse_labels(gids, [gt, unl], n_global, edges)
    fa = fused[gids[0]]
    assert len(np.unique(fa[gt == 0])) == 1
    assert fa[gt == 0][0] != fa[gt == 1][0]
