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
