#!/usr/bin/env python
"""Micro-benchmark of NCut solver pieces on the current backend: affinity
kernel, eigh vs LOBPCG per bucket, end-to-end worklist. Guides the method
thresholds in ncuts/solver.py."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from autoinst_tpu.ops.affinity import affinity_pallas, affinity_xla
from autoinst_tpu.ops import eigen
from autoinst_tpu.ncuts import solver
from bench import synth_chunk


def timeit(fn, *args, reps=3, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    backend = jax.default_backend()
    print("backend:", backend, flush=True)
    pts, feats = synth_chunk(0, 4096)
    valid = jnp.ones((4096,), bool)

    if backend == "tpu":
        dt = timeit(affinity_pallas, jnp.asarray(pts), valid,
                    tarl=jnp.asarray(feats), alpha=1.0, theta=0.5)
        print(f"affinity_pallas 4096: {dt*1e3:.1f} ms", flush=True)
    dt = timeit(affinity_xla, jnp.asarray(pts), valid,
                tarl=jnp.asarray(feats), alpha=1.0, theta=0.5)
    print(f"affinity_xla    4096: {dt*1e3:.1f} ms", flush=True)

    W = np.asarray(affinity_xla(jnp.asarray(pts), valid,
                                tarl=jnp.asarray(feats), alpha=1.0, theta=0.5))

    for bucket in (128, 256, 512, 1024, 2048, 4096):
        for bsz in (8,):
            Ws = jnp.asarray(np.stack(
                [W[:bucket, :bucket]] * 1))
            cid = jnp.zeros((bsz,), jnp.int32)
            idx = jnp.tile(jnp.arange(bucket, dtype=jnp.int32)[None], (bsz, 1))
            val = jnp.ones((bsz, bucket), bool)
            for method, iters in (("eigh", 0), ("lobpcg", 150),
                                  ("lobpcg", 60)):
                try:
                    dt = timeit(solver._solve_batch, Ws, cid, idx, val,
                                method, iters, reps=2)
                    print(f"bucket {bucket:5d} x{bsz} {method}[{iters}]: "
                          f"{dt*1e3:8.1f} ms", flush=True)
                except Exception as e:
                    print(f"bucket {bucket} {method}: FAIL {e}", flush=True)


if __name__ == "__main__":
    main()
