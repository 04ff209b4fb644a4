"""Multi-host (multi-process) scaling over DCN (SURVEY.md SS2.4, VERDICT
r1 #8).

Scaling model
-------------
One JAX process per host. `jax.distributed.initialize` forms the global
runtime; every process sees the GLOBAL device set and participates in one
`jax.sharding.Mesh` whose "data" axis spans hosts (collectives ride DCN)
and whose "model" axis stays within a host (ICI). Two workloads use it:

  * full-sequence NCuts: chunks are embarrassingly parallel, so each host
    takes a strided slice of the map's chunk list (`host_chunk_slice`) and
    runs the device worklist on its local chips; only scalar metric
    accumulators cross DCN (`allreduce_host_sums` -- one psum over a tiny
    array). No graph data ever leaves a host.
  * MaskPLS training: the train step jits over the global mesh with batch
    sharded on "data" (gradients all-reduce over DCN, the BN pmeans ride
    the same axis; see backbone.MaskedBatchNorm).

The reference has no working distributed layer (torch DDP guards that are
never exercised); this module is the TPU-native equivalent, testable on
CPUs via the multi-process CPU backend (tests/test_multihost.py spawns
2 processes on localhost -- the same code path as real pods, with TCP
standing in for DCN).
"""

from __future__ import annotations

import os

import numpy as np
import jax


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> dict:
    """Join the global runtime. Arguments default to the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID); on TPU
    pods with no env set, jax.distributed.initialize() autodetects.

    Returns {"process_index", "process_count", "local_devices",
    "global_devices"}."""
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator or num_processes:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    else:
        jax.distributed.initialize()
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": jax.local_devices(),
        "global_devices": jax.devices(),
    }


def global_mesh(model: int = 1):
    """Mesh over ALL processes' devices: "data" spans hosts (DCN), "model"
    subdivides within; device order keeps each host's chips contiguous on
    the data axis so model-parallel collectives stay on ICI."""
    from jax.sharding import Mesh
    devices = np.array(jax.devices())
    n = len(devices)
    assert n % model == 0, (n, model)
    return Mesh(devices.reshape(n // model, model), ("data", "model"))


def host_chunk_slice(n_chunks: int) -> np.ndarray:
    """Strided slice of a map's chunk ids owned by this host (load balance:
    consecutive chunks have correlated sizes, striding mixes them)."""
    return np.arange(jax.process_index(), n_chunks, jax.process_count())


def allreduce_host_sums(values: np.ndarray) -> np.ndarray:
    """Sum a small f32 array across hosts over DCN.

    Implemented as a process_allgather followed by a host-side sum (NOT a
    device psum): the payloads are tiny host-resident accumulators (metric
    sums, chunk counters) and the gather already rides the DCN transport;
    staging them onto devices for a collective would add transfers without
    saving anything."""
    from jax.experimental import multihost_utils
    values = np.asarray(values, np.float32)
    return np.asarray(
        multihost_utils.process_allgather(values)).sum(axis=0)


def broadcast_from_host0(values: np.ndarray) -> np.ndarray:
    """Replicate host-0 data to all hosts (e.g. merged label maps)."""
    from jax.experimental import multihost_utils
    return np.asarray(
        multihost_utils.broadcast_one_to_all(np.asarray(values)))
