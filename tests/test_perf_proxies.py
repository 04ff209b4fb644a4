"""Deterministic performance-proxy regression guard (VERDICT r3 #6).

The headline chunks/s number rides +-40% tunnel/host variance
(results/bench_ab_r3: the r1 snapshot itself re-measured 4.28 vs its
recorded 7.70), so wall-clock alone can neither detect nor exonerate a
real regression. This test pins the quantities that do NOT ride the
tunnel: device-solver worklist rounds, solves per tier, and the resulting
instance counts, on a fixed scaled-down bench workload (bench.synth_chunk
seeds 0-3, n=1024, the bench's exact affinity constants).

A real algorithmic regression moves these: e.g. losing connected-component
pre-seeding multiplies solves; breaking the tier scheduler multiplies
rounds (the round-3 A/B measured 18-vs-61 rounds across tier-batch
configs); a solver that stops converging changes the label structure.
Tolerances are tight but allow backend numeric jitter.
"""

import sys

import numpy as np
import jax.numpy as jnp
import pytest

sys.path.insert(0, "/root/repo")

from bench import synth_chunk, ALPHA, THETA, PROX, T_NCUT  # noqa: E402
from autoinst_tpu.ops.affinity import affinity_xla  # noqa: E402
from autoinst_tpu.ncuts import device_solver  # noqa: E402

# pinned on the CPU backend (tests/conftest.py forces it); re-pin only with
# an accompanying analysis of WHY the proxy moved
PINNED = {"rounds": 5, "total_solves": 37, "instances": [10, 7, 9, 8]}


@pytest.mark.slow
def test_device_solver_proxies_pinned():
    n = 1024
    fallbacks_before = device_solver.STATS["host_fallbacks"]
    chunks = [synth_chunk(s, n, n_instances=12) for s in range(4)]
    valid = jnp.ones((n,), bool)
    Ws = jnp.stack([
        affinity_xla(jnp.asarray(p), valid, tarl=jnp.asarray(f),
                     alpha=ALPHA, theta=THETA, proximity=PROX)
        for p, f in chunks])
    labels = device_solver.recursive_ncut_device(Ws, [n] * 4, T=T_NCUT,
                                                 iters=120)
    rounds = device_solver.STATS["rounds"]
    solves = sum(device_solver.STATS["solves_per_tier"].values())
    instances = [len(np.unique(l)) for l in labels]

    # rounds: a scheduler regression multiplies this (18 vs 61 in the A/B)
    assert rounds <= PINNED["rounds"] + 2, (
        f"worklist rounds regressed: {rounds} vs pinned {PINNED['rounds']} "
        f"(stats: {device_solver.STATS})")
    # solves: losing CC pre-seeding or warm starts multiplies eigensolves
    assert abs(solves - PINNED["total_solves"]) <= 6, (
        f"eigensolve count moved: {solves} vs pinned "
        f"{PINNED['total_solves']} (per tier: "
        f"{device_solver.STATS['solves_per_tier']})")
    assert device_solver.STATS["overflow"] == 0
    # host_fallbacks is cumulative across calls: assert no NEW fallback
    assert device_solver.STATS["host_fallbacks"] == fallbacks_before
    # segmentation structure: convergence failures change these counts
    for got, want in zip(instances, PINNED["instances"]):
        assert abs(got - want) <= 2, (
            f"instance structure moved: {instances} vs "
            f"pinned {PINNED['instances']}")
