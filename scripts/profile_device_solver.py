#!/usr/bin/env python
"""Device NCut solver component profile on the real TPU.

One part per subprocess (axon executable budget): connected-components
pre-seeding, tier-width Fiedler solves, and the full worklist, on the
bench's synthetic chunk batch. Guides which lever (NOTES_ROUND1 item 4)
is worth pulling.

Usage: python scripts/profile_device_solver.py [--parts cc,full,tier:256:8]
       [--chunks 16] [--n 4096] [--reps 5]
"""

import argparse
import json
import os
import subprocess
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    argv = list(sys.argv[1:])
    if "--parts" not in argv:
        argv += ["--parts", "cc,tier:256:8,tier:1024:8,full"]
    i = argv.index("--parts")
    parts = argv[i + 1].split(",")
    if len(parts) > 1:
        results = {}
        for p in parts:
            sub = list(argv)
            sub[i + 1] = p
            r = subprocess.run([sys.executable, os.path.abspath(__file__)]
                               + sub, capture_output=True, text=True)
            sys.stderr.write(r.stderr)
            line = (r.stdout.strip().splitlines() or ["{}"])[-1]
            try:
                results.update(json.loads(line))
            except json.JSONDecodeError:
                log(f"part {p} produced no result (rc={r.returncode})")
        print(json.dumps(results))
        return
    _run_one(argv, parts[0])


def _force(x):
    import jax
    np.asarray(jax.tree.leaves(x)[0]).ravel()[:1]


def timed(fn, reps, *args):
    out = fn(*args)
    _force(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _force(out)
    return (time.perf_counter() - t0) / reps


def _run_one(argv, part):
    ap = argparse.ArgumentParser()
    ap.add_argument("--parts", default="")
    ap.add_argument("--chunks", type=int, default=16)
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    log("devices:", jax.devices())

    from bench import synth_chunk, ALPHA, THETA, PROX
    from autoinst_tpu.ops.affinity import affinity_xla
    from autoinst_tpu.ncuts import device_solver
    from autoinst_tpu.ops import eigen

    results = {}
    rng = np.random.default_rng(0)

    if part in ("cc", "full"):
        Ws = []
        for c in range(args.chunks):
            pts, feats = synth_chunk(c, args.n)
            W = affinity_xla(jnp.asarray(pts), jnp.ones((args.n,), bool),
                             tarl=jnp.asarray(feats), alpha=ALPHA,
                             theta=THETA, proximity=PROX)
            Ws.append(np.asarray(W))
        Ws = jnp.asarray(np.stack(Ws))
        valid = jnp.ones((args.chunks, args.n), bool)

        if part == "cc":
            t = timed(device_solver.connected_components, args.reps, Ws,
                      valid)
            results["connected_components"] = t
            log(f"connected_components [{args.chunks},{args.n}]: {t:.3f} s")
        else:
            nvs = np.full(args.chunks, args.n, np.int32)

            def full(w):
                return device_solver._device_ncut(
                    w, jnp.asarray(nvs), 0.03, 0.01, 240,
                    device_solver._tiers_for(args.n))

            t = timed(full, max(args.reps // 2, 1), Ws)
            results["full_worklist"] = t
            results["full_chunks_per_sec"] = args.chunks / t
            log(f"full worklist {args.chunks}x{args.n}: {t:.3f} s "
                f"({args.chunks / t:.2f} chunks/s)")

    if part.startswith("tier:"):
        _, width_s, nb_s = part.split(":")
        width, nb = int(width_s), int(nb_s)
        # realistic leaf subgraphs: small blobs
        Ws = np.zeros((nb, width, width), np.float32)
        for b in range(nb):
            n = int(rng.integers(width // 4, width))
            pts = rng.normal(size=(n, 3)).astype(np.float32)
            d2 = ((pts[:, None] - pts[None]) ** 2).sum(-1)
            Ws[b, :n, :n] = np.exp(-d2) * (d2 < 1.0)
        valid = jnp.asarray(Ws.any(2))

        def solve(w, v):
            return jax.vmap(lambda wi, vi: eigen.fiedler_lobpcg(
                wi, vi, iters=240))(w, v)

        t = timed(solve, args.reps, jnp.asarray(Ws), valid)
        results[f"fiedler_{width}x{nb}"] = t
        log(f"fiedler tier {width} x{nb}: {t * 1e3:.1f} ms "
            f"({t / nb * 1e3:.2f} ms/solve)")

    print(json.dumps(results))


if __name__ == "__main__":
    main()
