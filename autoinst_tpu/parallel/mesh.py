"""Device mesh + sharding helpers (the framework's distributed backbone).

The reference has no real distributed layer (SURVEY.md SS2.4/SS5.8: torch
DDP guards that are never exercised). Here multi-chip scaling is SPMD over a
jax.sharding.Mesh:

  * chunk-level data parallelism: the batch of chunk graphs [C, N, N]
    shards over the "data" axis; each chip runs the batched Fiedler solve
    on its shard, no cross-chip traffic (embarrassingly parallel);
  * model parallelism for MaskPLS: wide kernels shard over "model"
    (GSPMD inserts the collectives; see __graft_entry__.dryrun_multichip);
  * metric accumulation: psum over "data" (replaces the reference's
    single-process "one file at a time" aggregation).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from autoinst_tpu.ops import eigen


def make_mesh(data: int | None = None, model: int = 1,
              devices=None) -> Mesh:
    devices = np.array(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devices) // model
    return Mesh(devices[:data * model].reshape(data, model),
                ("data", "model"))


def shard_leading(x, mesh: Mesh, axis: str = "data"):
    """Shard the leading dimension over a mesh axis; replicate the rest."""
    spec = P(axis, *([None] * (np.ndim(x) - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(x, mesh: Mesh):
    return jax.tree.map(
        lambda v: jax.device_put(v, NamedSharding(mesh, P())), x)


@partial(jax.jit, static_argnames=("iters",))
def _fiedler_batch(Ws, valids, iters):
    return jax.vmap(lambda w, v: eigen.fiedler_lobpcg(w, v, iters=iters)
                    )(Ws, valids)


def fiedler_sharded(Ws: jax.Array, valids: jax.Array, mesh: Mesh,
                    iters: int = 120):
    """Fiedler vectors for a chunk batch sharded over the "data" axis.

    Each chip solves its chunk shard independently; XLA partitions the
    vmapped LOBPCG with zero collectives. This is the scaling mechanism for
    full-sequence runs: C chunks resolve C/devices at a time."""
    Ws = shard_leading(Ws, mesh)
    valids = shard_leading(valids, mesh)
    with mesh:
        return _fiedler_batch(Ws, valids, iters)


def psum_metrics(tree, axis_name: str = "data"):
    """All-reduce metric accumulators across the data axis (inside
    shard_map/pmap contexts)."""
    return jax.tree.map(lambda x: jax.lax.psum(x, axis_name), tree)


def recursive_ncut_device_sharded(W, num_valids, mesh: Mesh, T: float = 0.03,
                                  split_lim: float = 0.01, iters: int = 240,
                                  seed_cap: int | None = None):
    """The full device-resident recursive-NCut worklist, data-parallel over
    the mesh's "data" axis: each chip owns a shard of the chunk batch and
    runs its own tiered queue (ncuts/device_solver.py) -- zero collectives,
    linear chunk throughput in chip count.

    W [C, N, N] affinities, num_valids [C]; C is padded to a multiple of
    the data-axis size with empty chunks (num_valid 0 finalizes with no
    eigensolve). Returns a list of per-chunk label arrays like
    recursive_ncut_device.
    """
    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
    from autoinst_tpu.ncuts import device_solver

    W = np.asarray(W, np.float32)
    num_valids = np.atleast_1d(np.asarray(num_valids, np.int32))
    C, N, _ = W.shape
    ndata = mesh.shape["data"]
    pad = (-C) % ndata
    if pad:
        W = np.concatenate([W, np.zeros((pad, N, N), np.float32)])
        num_valids = np.concatenate([num_valids, np.zeros(pad, np.int32)])

    tiers = device_solver._tiers_for(N)
    cap = device_solver._SEED_CAP if seed_cap is None else int(seed_cap)

    def local(w, nv):
        labels, counters, overflow, _rounds, _solves = \
            device_solver._device_ncut(
                w, nv, float(T), float(split_lim), int(iters), tiers,
                seed_cap=cap)
        return labels, counters, overflow.reshape(1)

    # check_vma/check_rep: the solver's while_loop carries mix shard-varying
    # and replicated values (a purely per-shard computation), which the
    # static varying-axes analysis rejects; disable it
    try:
        fn = shard_map(local, mesh=mesh,
                       in_specs=(P("data"), P("data")),
                       out_specs=(P("data"), P("data"), P("data")),
                       check_vma=False)
    except TypeError:
        fn = shard_map(local, mesh=mesh,
                       in_specs=(P("data"), P("data")),
                       out_specs=(P("data"), P("data"), P("data")),
                       check_rep=False)
    import jax.numpy as jnp
    labels, counters, overflow = jax.jit(fn)(jnp.asarray(W),
                                             jnp.asarray(num_valids))
    if int(np.asarray(overflow).sum()) > 0:
        raise RuntimeError("device NCut queue overflow on a shard; raise "
                           "tier capacities")
    labels = np.asarray(labels)
    return [labels[c, :n] for c, n in enumerate(num_valids[:C])]
