"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from autoinst_tpu.parallel import make_mesh, fiedler_sharded, shard_leading
from autoinst_tpu.ops import eigen

from oracles import affinity_oracle


def test_mesh_shapes():
    mesh = make_mesh(data=4, model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    mesh = make_mesh()
    assert mesh.shape["data"] == 8


def test_fiedler_sharded_matches_single_device():
    n = 96
    Ws, valids = [], []
    for seed in range(8):
        # connected geometric graph => simple (unique) Fiedler eigenpair
        rng = np.random.default_rng(seed)
        pts = rng.uniform(0, 2.0, size=(n - 10, 3)).astype(np.float32)
        w = affinity_oracle(pts).astype(np.float32)
        wp = np.zeros((n, n), np.float32)
        wp[:len(w), :len(w)] = w
        v = np.zeros(n, bool)
        v[:len(w)] = True
        Ws.append(wp)
        valids.append(v)
    Ws = jnp.asarray(np.stack(Ws))
    valids = jnp.asarray(np.stack(valids))

    mesh = make_mesh(data=8, model=1)
    ev_sharded, lam_sharded = fiedler_sharded(Ws, valids, mesh, iters=400)
    assert len(ev_sharded.sharding.device_set) == 8

    from oracles import fiedler_oracle
    for i in range(8):
        nv = int(valids[i].sum())
        ev_o, lam_o = fiedler_oracle(np.asarray(Ws[i])[:nv, :nv]
                                     .astype(np.float64))
        e_a = np.asarray(ev_sharded[i])[:nv]
        corr = abs(np.dot(e_a, ev_o)
                   / max(np.linalg.norm(e_a) * np.linalg.norm(ev_o), 1e-30))
        assert corr > 0.99, (i, corr)
        assert abs(float(lam_sharded[i]) - lam_o) < 5e-3


def test_shard_leading_distributes():
    mesh = make_mesh(data=8, model=1)
    x = jnp.zeros((16, 4, 4))
    xs = shard_leading(x, mesh)
    assert len(xs.sharding.device_set) == 8


def test_recursive_ncut_device_sharded_matches_unsharded():
    """The full tiered-worklist solver under shard_map: per-chunk labels
    must match the single-device device solver exactly (modulo nothing --
    the per-chunk computation is independent)."""
    import jax
    from autoinst_tpu.ncuts.device_solver import recursive_ncut_device
    from autoinst_tpu.parallel.mesh import recursive_ncut_device_sharded

    rng = np.random.default_rng(11)
    C, N = 6, 256   # 6 chunks over 8 devices: exercises padding too
    Ws, nvs = [], []
    for c in range(C):
        n = int(rng.integers(60, N))
        pts = rng.normal(size=(n, 2)) * 0.3
        pts[: n // 2] += 4.0   # two well-separated blobs
        d2 = ((pts[:, None] - pts[None]) ** 2).sum(-1)
        w = np.exp(-d2) * (d2 < 1.0)
        W = np.zeros((N, N), np.float32)
        W[:n, :n] = w
        Ws.append(W)
        nvs.append(n)
    Ws = np.stack(Ws)
    nvs = np.asarray(nvs, np.int32)

    mesh = make_mesh(data=8, model=1)
    sharded = recursive_ncut_device_sharded(Ws, nvs, mesh, T=0.1,
                                            split_lim=0.01)
    single = recursive_ncut_device(jnp.asarray(Ws), nvs, T=0.1,
                                   split_lim=0.01)
    assert len(sharded) == C
    for c in range(C):
        np.testing.assert_array_equal(sharded[c], single[c])
