"""Device-resident NCut worklist vs the host worklist (same partitions)."""

import numpy as np
import jax.numpy as jnp
import pytest

from autoinst_tpu.ncuts.device_solver import recursive_ncut_device
from autoinst_tpu.ncuts.solver import recursive_ncut_batch

from oracles import affinity_oracle, partition_sets, clustered_points


def _pad(w, n):
    wp = np.zeros((n, n), np.float32)
    wp[:len(w), :len(w)] = w
    return wp


@pytest.mark.parametrize("seed", [0, 1])
def test_matches_host_worklist(seed):
    """Both solvers recover the ground-truth partition of a stable scene.

    (Exact host==device equality is not guaranteed on degenerate inputs:
    weakly attached outlier points make near-threshold cuts bistable and
    the two programs' f32 arithmetic differs.)"""
    Ws, nums, gts = [], [], []
    for s in (seed, seed + 10):
        pts, gt = clustered_points(seed=s, n_per=40, spread=0.15)
        w = affinity_oracle(pts).astype(np.float32)
        Ws.append(_pad(w, 256))
        nums.append(len(w))
        gts.append(gt)
    Ws = jnp.asarray(np.stack(Ws))

    host = recursive_ncut_batch(Ws, nums, T=0.075, method="lobpcg",
                                lobpcg_iters=200)
    dev = recursive_ncut_device(Ws, nums, T=0.075, iters=200)
    for h, d, gt in zip(host, dev, gts):
        assert partition_sets(h) == partition_sets(gt)
        assert partition_sets(d) == partition_sets(gt)


def test_no_split_single_cluster():
    pts, _ = clustered_points(seed=3, centers=((0, 0, 0),), n_per=60)
    w = affinity_oracle(pts).astype(np.float32)
    Ws = jnp.asarray(_pad(w, 256)[None])
    dev = recursive_ncut_device(Ws, [len(w)], T=1e-9)
    assert len(np.unique(dev[0])) == 1


def test_multitier_path():
    # a chunk large enough to start above the smallest tier
    rng = np.random.default_rng(4)
    blobs = [rng.normal(scale=0.25, size=(90, 3)) + c
             for c in ([0, 0, 0], [4, 0, 0], [0, 4, 0], [4, 4, 0])]
    pts = np.concatenate(blobs).astype(np.float32)
    w = affinity_oracle(pts).astype(np.float32)
    Ws = jnp.asarray(_pad(w, 1024)[None])
    host = recursive_ncut_batch(Ws, [len(w)], T=0.075, method="lobpcg",
                                lobpcg_iters=100)
    dev = recursive_ncut_device(Ws, [len(w)], T=0.075, iters=100)
    assert partition_sets(host[0]) == partition_sets(dev[0])
    assert len(np.unique(dev[0])) == 4


def test_seed_table_fallback():
    """Chunks with more components than the seed table take the
    whole-chunk-root fallback and still produce the right partition."""
    pts, gt = clustered_points(seed=7, n_per=40, spread=0.15)
    w = affinity_oracle(pts).astype(np.float32)
    Ws = jnp.asarray(_pad(w, 256)[None])
    dev = recursive_ncut_device(Ws, [len(w)], T=0.075, iters=200, seed_cap=2)
    assert partition_sets(dev[0]) == partition_sets(gt)


def test_connected_components_vs_scipy():
    from scipy.sparse import csr_matrix
    from scipy.sparse.csgraph import connected_components as cc_scipy
    from autoinst_tpu.ncuts.device_solver import connected_components

    rng = np.random.default_rng(5)
    N = 128
    Ws, valids, expected = [], [], []
    for c in range(3):
        n = int(rng.integers(40, N))
        # sparse random geometric graph: several components incl. singletons
        pts = rng.uniform(0, 10, size=(n, 3))
        d = np.linalg.norm(pts[:, None] - pts[None], axis=-1)
        w = ((d < 1.2) * np.exp(-d)).astype(np.float32)
        np.fill_diagonal(w, 1.0)
        _, labs = cc_scipy(csr_matrix(w), directed=False)
        wp = np.zeros((N, N), np.float32)
        wp[:n, :n] = w
        v = np.zeros(N, bool)
        v[:n] = True
        Ws.append(wp); valids.append(v); expected.append(labs)
    lab = np.asarray(connected_components(jnp.asarray(np.stack(Ws)),
                                          jnp.asarray(np.stack(valids))))
    for c, labs in enumerate(expected):
        n = len(labs)
        ours = lab[c, :n]
        # same partition (labels differ: ours are max point indices)
        remap = {}
        for o, s in zip(ours, labs):
            assert remap.setdefault(o, s) == s
        assert len(set(remap.values())) == len(remap)
        assert (lab[c, n:] == -1).all()


def test_stats_populated():
    """VERDICT r1 #5: the device worklist must report rounds/solves."""
    from autoinst_tpu.ncuts import device_solver
    pts, _ = clustered_points(seed=2, n_per=40)
    W = affinity_oracle(pts)
    n = len(pts)
    Wp = np.zeros((1, 256, 256), np.float32)
    Wp[0, :n, :n] = W
    labels = recursive_ncut_device(jnp.asarray(Wp), [n], T=0.1)
    assert device_solver.STATS["rounds"] >= 1
    assert sum(device_solver.STATS["solves_per_tier"].values()) >= 1
    assert device_solver.STATS["overflow"] == 0
    assert len(np.unique(labels[0])) >= 3


def test_large_chunk_host_fallback():
    """Chunks wider than the top tier route to the host worklist instead
    of raising (VERDICT r1 #9)."""
    from autoinst_tpu.ncuts import device_solver
    pts, gt = clustered_points(seed=3, n_per=50, centers=((0, 0, 0), (4, 0, 0), (0, 5, 2), (6, 5, 0)))
    W = affinity_oracle(pts)
    n = len(pts)
    # shrink the tier table so "too large" is cheap to construct
    orig = device_solver._TIERS
    try:
        device_solver._TIERS = ((64, 8, 512), (128, 4, 128))
        Wp = np.zeros((1, n, n), np.float32)
        Wp[0] = W
        before = device_solver.STATS["host_fallbacks"]
        labels = recursive_ncut_device(jnp.asarray(Wp), [n], T=0.1)
        assert device_solver.STATS["host_fallbacks"] == before + 1
    finally:
        device_solver._TIERS = orig
    host = recursive_ncut_batch(jnp.asarray(Wp), [n], T=0.1)
    assert partition_sets(labels[0]) == partition_sets(host[0])
