#!/usr/bin/env python
"""Focused micro-benchmark: one configuration per invocation (remote compile
is expensive; run repeatedly with env knobs, compile cache persists).

MB_WHAT: affinity | solve | e2e    MB_BUCKET, MB_BATCH, MB_METHOD, MB_ITERS
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/autoinst_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from autoinst_tpu.ops.affinity import affinity_pallas, affinity_xla
from autoinst_tpu.ncuts import solver
from bench import synth_chunk


def timeit(fn, *args, reps=3, **kw):
    t0 = time.perf_counter()
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    compile_dt = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, compile_dt


def main():
    what = os.environ.get("MB_WHAT", "solve")
    bucket = int(os.environ.get("MB_BUCKET", "4096"))
    bsz = int(os.environ.get("MB_BATCH", "8"))
    method = os.environ.get("MB_METHOD", "lobpcg")
    iters = int(os.environ.get("MB_ITERS", "150"))
    print("backend:", jax.default_backend(), flush=True)

    pts, feats = synth_chunk(0, 4096)
    valid = jnp.ones((4096,), bool)

    if what == "affinity":
        fn = affinity_pallas if jax.default_backend() == "tpu" else affinity_xla
        dt, cdt = timeit(fn, jnp.asarray(pts), valid,
                         tarl=jnp.asarray(feats), alpha=1.0, theta=0.5)
        print(f"affinity 4096: {dt*1e3:.1f} ms (compile {cdt:.1f}s)")
        return

    W = affinity_xla(jnp.asarray(pts), valid, tarl=jnp.asarray(feats),
                     alpha=1.0, theta=0.5)
    W = jnp.asarray(np.asarray(W))

    if what == "solve":
        Ws = W[None, :bucket, :bucket]
        cid = jnp.zeros((bsz,), jnp.int32)
        idx = jnp.tile(jnp.arange(bucket, dtype=jnp.int32)[None], (bsz, 1))
        val = jnp.ones((bsz, bucket), bool)
        dt, cdt = timeit(solver._solve_batch, Ws, cid, idx, val, method,
                         iters, reps=2)
        print(f"solve bucket={bucket} x{bsz} {method}[{iters}]: "
              f"{dt*1e3:.1f} ms/call, {dt/bsz*1e3:.1f} ms/item "
              f"(compile {cdt:.1f}s)")
        return

    if what == "e2e":
        t0 = time.perf_counter()
        labels = solver.recursive_ncut(W, 4096, T=0.03, method=method,
                                       lobpcg_iters=iters)
        print(f"e2e chunk: {time.perf_counter()-t0:.2f}s, "
              f"{len(np.unique(labels))} instances")


if __name__ == "__main__":
    main()
