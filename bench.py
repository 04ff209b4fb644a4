#!/usr/bin/env python
"""Headline benchmark: NCuts chunk throughput (affinity + recursive
eigensolve), chunks/sec/chip, versus the reference's CPU algorithm.

The reference publishes no timing (BASELINE.md), so the baseline is measured
here: a faithful scipy implementation of its exact per-chunk algorithm
(cdist affinity ncuts_utils.py:60-156 + ARPACK shift-invert recursion
normalized_cut.py:37-63) run on this host's CPU. The TPU path is this
framework's production path: fused Pallas affinity + batched worklist
spectral solver (autoinst_tpu.ncuts).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
Env knobs: BENCH_CHUNKS (default 16), BENCH_BASELINE_CHUNKS (default 2),
BENCH_N (default 4096 padded chunk size), BENCH_SOLVER (device|host).

The first compile of the device-resident solver takes minutes and, over the
tunneled dev TPU, has occasionally crashed the remote worker; bench first
populates the persistent compilation cache in a retryable subprocess, then
times against the warm cache.
"""

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def synth_chunk(seed: int, n_points: int, n_instances: int = 28,
                tarl_dim: int = 96):
    """A realistic post-downsample chunk: ~0.35m-spaced instance blobs in a
    25m box + clutter, with clusterwise TARL features."""
    rng = np.random.default_rng(seed)
    pts, feats, sizes = [], [], rng.integers(30, 260, size=n_instances)
    total = 0
    for i in range(n_instances):
        c = rng.uniform(-11, 11, size=3) * np.array([1, 1, 0.15])
        extent = rng.uniform(0.5, 3.0, size=3)
        k = int(sizes[i])
        p = c + rng.uniform(-0.5, 0.5, size=(k, 3)) * extent
        f = np.zeros((k, tarl_dim), np.float32)
        f[:] = rng.normal(size=tarl_dim) * 0.5
        f += rng.normal(size=(k, tarl_dim)) * 0.05
        pts.append(p)
        feats.append(f)
        total += k
    # clutter (vegetation-like)
    k = max(n_points - total, 0)
    pts.append(rng.uniform(-12.5, 12.5, size=(k, 3)) * np.array([1, 1, 0.3]))
    f = rng.normal(size=(k, tarl_dim)).astype(np.float32) * 0.3
    feats.append(f)
    pts = np.concatenate(pts)[:n_points].astype(np.float32)
    feats = np.concatenate(feats)[:n_points].astype(np.float32)
    return pts, feats


ALPHA, THETA, PROX, T_NCUT = 1.0, 0.5, 1.0, 0.03


# --------------------------------------------------------------- baseline

def baseline_chunk(points: np.ndarray, feats: np.ndarray):
    """The reference per-chunk algorithm, verbatim semantics, scipy/ARPACK."""
    from scipy.spatial.distance import cdist
    from scipy import sparse
    from scipy.sparse.linalg import eigsh

    d = cdist(points, points)
    mask = np.where(d <= PROX, 1, 0)
    spatial = mask * np.exp(-ALPHA * d)
    dt = cdist(feats, feats)
    no_feat = ~feats.any(1)
    dt[no_feat] = 0
    dt[:, no_feat] = 0
    tarl = mask * np.exp(-THETA * dt)
    A = sparse.csr_matrix(spatial * tarl)

    def ncut(w, num_orig, labels):
        W = w + sparse.identity(w.shape[0])
        if W.shape[0] > 2 and labels.shape[0] / (num_orig + 1e-8) > 0.01:
            deg = np.array(W.sum(axis=0))[0]
            D2 = sparse.diags(np.reciprocal(np.sqrt(deg)))
            L = D2 * (sparse.diags(deg) - W) * D2
            try:
                evals, evecs = eigsh(L, 2, sigma=1e-10, which="LM")
            except Exception:
                return [labels]
            ev = evecs[:, np.argsort(evals)[1]]
            mn, mx = ev.min(), ev.max()
            best, mcut = None, np.inf
            if not np.allclose(mn, mx):
                wd = np.asarray(w.todense())
                for t in np.linspace(mn, mx, 10, endpoint=False):
                    m = ev > t
                    cut = (wd.sum() - wd[m][:, m].sum()
                           - wd[~m][:, ~m].sum()) / 2
                    with np.errstate(invalid="ignore", divide="ignore"):
                        cost = cut / deg[m].sum() + cut / deg[~m].sum()
                    if cost < mcut:
                        best, mcut = m, cost
            if mcut < T_NCUT:
                return (ncut(w[best][:, best], num_orig, labels[best])
                        + ncut(w[~best][:, ~best], num_orig, labels[~best]))
        return [labels]

    return ncut(A, len(points), np.arange(len(points)))


# -------------------------------------------------------------- tpu path

STAGE_T = {"transfer_s": 0.0, "affinity_s": 0.0, "solver_s": 0.0,
           "overlapped_transfer_s": 0.0, "groups": 0}


def tpu_run(chunks, use_pallas: bool, method: str, iters: int = 120):
    import jax
    import jax.numpy as jnp
    from autoinst_tpu.ops.affinity import affinity_pallas, affinity_xla
    from autoinst_tpu.ncuts.solver import recursive_ncut_batch

    n = chunks[0][0].shape[0]
    valid = jnp.ones((n,), bool)
    for k in STAGE_T:
        STAGE_T[k] = 0

    def build(pts, feats):
        if use_pallas:
            return affinity_pallas(pts, valid, tarl=feats, alpha=ALPHA,
                                   theta=THETA, proximity=PROX)
        return affinity_xla(pts, valid, tarl=feats, alpha=ALPHA,
                            theta=THETA, proximity=PROX)

    # Bulk host->device puts per chunk GROUP, then per-chunk Pallas
    # dispatches on device-resident slices: the dispatches queue
    # asynchronously, and bulk transfers avoid per-chunk tunnel round
    # trips (which dominate and vary wildly on the tunneled dev chip).
    # A/B'd against one vmapped Pallas call over the stack: the batched
    # kernel serializes its grid and measured slower.
    # Features ship as bf16 (utils/transfer.py): the tunnel link moves
    # ~17 MB/s and the 25 MB f32 TARL upload was costing as much as the
    # entire solve; coordinates stay f32.
    from autoinst_tpu.utils.transfer import put_features

    def build_group(g, block_compute):
        t0 = time.perf_counter()
        pts_all = jnp.asarray(np.stack([p for p, _ in g]))
        fts_all = put_features(np.stack([f for _, f in g]))
        pts_all.block_until_ready()
        fts_all.block_until_ready()
        t1 = time.perf_counter()
        Ws = jnp.stack([build(pts_all[i], fts_all[i])
                        for i in range(len(g))])
        if block_compute:
            # overlapped builds skip this: the device core is busy with the
            # in-flight solve, so blocking here would bill solver time to
            # the build; the H2D wire transfer above is the part that truly
            # runs concurrently
            Ws.block_until_ready()
        t2 = time.perf_counter()
        return Ws, t1 - t0, t2 - t1

    device_path = (os.environ.get("BENCH_SOLVER", "device") == "device"
                   and jax.default_backend() == "tpu")
    if not device_path:
        Ws, tr, af = build_group(chunks, True)
        STAGE_T["transfer_s"], STAGE_T["affinity_s"] = tr, af
        STAGE_T["groups"] = 1
        t2 = time.perf_counter()
        labels = recursive_ncut_batch(Ws, [n] * len(chunks), T=T_NCUT,
                                      method=method, lobpcg_iters=iters)
        STAGE_T["solver_s"] = time.perf_counter() - t2
        return labels

    # Device worklist path, double-buffered (VERDICT r3 #5): the H2D
    # upload of group k+1 rides the tunnel while group k's solve executes
    # on the core (same structure as pipeline/batch_runner.py phase 2).
    # Only group 0's transfer is exposed wall time; 'overlapped_transfer_s'
    # records the hidden uploads. The last partial group is padded by
    # repeating chunks so every dispatch shares ONE compiled executable.
    from autoinst_tpu.ncuts.device_solver import (finish_ncut_device,
                                                  recursive_ncut_device_async)
    group = min(int(os.environ.get("BENCH_DEVICE_GROUP", "8")), len(chunks))
    groups = []
    for lo in range(0, len(chunks), group):
        g = chunks[lo:lo + group]
        real = len(g)
        while len(g) < group:
            g = g + g[:group - len(g)]
        groups.append((g, real))
    STAGE_T["groups"] = len(groups)

    from autoinst_tpu.ncuts import device_solver
    out = []
    rounds, solves = 0, {}
    Ws, tr, af = build_group(groups[0][0], True)
    STAGE_T["transfer_s"], STAGE_T["affinity_s"] = tr, af
    for gi, (g, real) in enumerate(groups):
        ts = time.perf_counter()
        handle = recursive_ncut_device_async(Ws, [n] * len(g), T=T_NCUT,
                                             iters=iters)
        if gi + 1 < len(groups):
            Ws, tr, af = build_group(groups[gi + 1][0], False)
            STAGE_T["overlapped_transfer_s"] += tr
        out += finish_ncut_device(handle)[:real]
        STAGE_T["solver_s"] += time.perf_counter() - ts
        # finish_ncut_device overwrites STATS per dispatch; report the
        # whole rep's counts (the perf-proxy guard reads single calls)
        rounds += device_solver.STATS["rounds"]
        for w, s in device_solver.STATS["solves_per_tier"].items():
            solves[w] = solves.get(w, 0) + s
    device_solver.STATS["rounds"] = rounds
    device_solver.STATS["solves_per_tier"] = solves
    return out


def precompile_subprocess(env_overrides):
    """Run warmup in a child process (crash-tolerant cache population)."""
    import subprocess
    env = dict(os.environ)
    env.update(env_overrides)
    env["BENCH_PRECOMPILE"] = "1"
    for attempt in range(3):
        r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                           env=env, capture_output=True, text=True,
                           timeout=1800)
        if r.returncode == 0:
            log(f"precompile subprocess ok (attempt {attempt})")
            return True
        log(f"precompile attempt {attempt} failed rc={r.returncode}; "
            f"tail: {r.stderr[-400:]}")
    return False


def main():
    # 32 chunks in groups of 8: enough groups that the double-buffered
    # pipeline reaches steady state (3 of 4 uploads hidden); chunks/s
    # normalizes per chunk so the headline stays comparable to r1-r3
    n_chunks = int(os.environ.get("BENCH_CHUNKS", "32"))
    n_base = int(os.environ.get("BENCH_BASELINE_CHUNKS", "2"))
    n_pts = int(os.environ.get("BENCH_N", "4096"))
    precompile_mode = os.environ.get("BENCH_PRECOMPILE") == "1"
    global LOADAVG0
    LOADAVG0 = os.getloadavg()[0]

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR",
                                     "/root/repo/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    backend = jax.default_backend()
    use_pallas = backend == "tpu"
    method = os.environ.get("BENCH_NCUT_METHOD", "auto")
    iters = int(os.environ.get("BENCH_LOBPCG_ITERS", "240"))
    log(f"backend={backend} pallas={use_pallas} method={method} "
        f"chunks={n_chunks} n={n_pts}")

    chunks = [synth_chunk(s, n_pts) for s in range(n_chunks)]
    group = min(int(os.environ.get("BENCH_DEVICE_GROUP", "8")), n_chunks)

    if precompile_mode:
        # child process: compile the exact timed shapes, then exit
        tpu_run(chunks[:group], use_pallas, method, iters)
        print("precompile-done")
        return

    # Optional crash-isolated precompile (the remote compile service does
    # not share compilations across processes, so this doubles wall time;
    # enable when the tunnel has been flaky).
    if backend == "tpu" and os.environ.get("BENCH_SOLVER",
                                           "device") == "device" \
            and os.environ.get("BENCH_ISOLATED_PRECOMPILE") == "1":
        precompile_subprocess({"BENCH_CHUNKS": str(n_chunks),
                               "BENCH_N": str(n_pts)})

    # warmup in-process (fast against the warm cache)
    log("warmup (compilation)...")
    t0 = time.perf_counter()
    if os.environ.get("BENCH_SOLVER", "device") != "device" \
            or backend != "tpu":
        import jax.numpy as jnp
        from autoinst_tpu.ncuts.solver import warmup_shapes
        dummyW = jnp.zeros((1, n_pts, n_pts), jnp.float32)
        warmup_shapes(dummyW, method=method, lobpcg_iters=iters)
    tpu_run(chunks[:group], use_pallas, method, iters)
    log(f"warmup done in {time.perf_counter() - t0:.1f}s")

    device_path = (backend == "tpu"
                   and os.environ.get("BENCH_SOLVER", "device") == "device")
    from autoinst_tpu.ncuts import device_solver
    from autoinst_tpu.ncuts.solver import STATS as HOST_STATS

    # median of N timed repetitions (single measurements over the tunnel
    # vary by >5%; r1 recorded 7.70 vs 8.24 across runs)
    reps = int(os.environ.get("BENCH_REPS", "3"))
    rates, labels, stage_reps = [], None, []
    for rep in range(reps):
        for k in HOST_STATS:
            HOST_STATS[k] = 0
        t0 = time.perf_counter()
        labels = tpu_run(chunks, use_pallas, method, iters)
        dt = time.perf_counter() - t0
        rates.append(n_chunks / dt)
        stage_reps.append({k: round(v, 3) for k, v in STAGE_T.items()})
        if device_path:
            log(f"rep {rep}: {dt:.2f}s ({rates[-1]:.2f} chunks/s); device "
                f"solver stats: rounds={device_solver.STATS['rounds']} "
                f"solves={device_solver.STATS['solves_per_tier']} "
                f"overflow={device_solver.STATS['overflow']} "
                f"host_fallbacks={device_solver.STATS['host_fallbacks']}")
        else:
            log(f"rep {rep}: {dt:.2f}s ({rates[-1]:.2f} chunks/s); host "
                f"solver stats: {HOST_STATS}")
    tpu_rate = float(np.median(rates))
    n_instances = [len(np.unique(l)) for l in labels]
    log(f"tpu: median of {reps} reps {tpu_rate:.3f} chunks/s "
        f"(all: {[round(r, 2) for r in rates]}); instances/chunk ~ "
        f"{np.mean(n_instances):.1f}")
    if device_path and device_solver.STATS["overflow"]:
        log("WARNING: device solver queue overflow -- results truncated")

    # Achieved-FLOP accounting (VERDICT r2 #5): analytic FLOP model of the
    # work actually dispatched -- affinity ~(2*(3+96)+12)*n^2 per chunk
    # (spatial+TARL cdist + exp/mask fusion), LOBPCG ~iters*2.2*w^2*block
    # per solve (dominant B@X matvec on the block of 8, plus projections),
    # threshold sweep ~30*w^2 per solve. Reported against the v5e bf16 MXU
    # peak (197 TFLOP/s); the path runs f32, so treat mfu as conservative.
    # Per-rep stages expose contention: the r3 A/B recorded transfer_s=1.5
    # for a 26 MB put that measures 0.024 s on an idle tunnel -- those runs
    # shared the chip with a trainer and the 1-core host with eval jobs.
    # Load average at bench start is recorded for the same reason.
    stage = dict(STAGE_T)
    flops = None
    if device_path and device_solver.STATS["solves_per_tier"]:
        f_aff = n_chunks * (2 * (3 + 96) + 12) * float(n_pts) ** 2
        f_solve = sum(s * (iters * 2.2 * 8 + 30) * float(w) ** 2
                      for w, s in
                      device_solver.STATS["solves_per_tier"].items())
        elapsed = n_chunks / tpu_rate
        flops = {
            "affinity_gflop": round(f_aff / 1e9, 1),
            "solver_gflop": round(f_solve / 1e9, 1),
            "achieved_tflops": round((f_aff + f_solve) / elapsed / 1e12, 3),
            "mfu_vs_v5e_bf16_peak_pct": round(
                (f_aff + f_solve) / elapsed / 197e12 * 100, 3),
        }
        log(f"stage timings (last rep): {stage}; flops: {flops}")

    # baseline on a stratified sample of the same chunk mix.
    # CAVEAT: this baseline runs the reference's scipy/ARPACK algorithm on
    # THIS 1-core host, not the reference's 128 GB AMD workstation
    # (README.md:15); treat vs_baseline as same-algorithm-same-host, not
    # same-hardware-as-paper. Median of N reps: the host swung 60% between
    # rounds riding on the headline ratio (VERDICT r2 weak #2).
    base_chunks = chunks[::max(len(chunks) // max(n_base, 1), 1)][:n_base]
    base_reps = int(os.environ.get("BENCH_BASELINE_REPS", "3"))
    base_rates = []
    for _ in range(base_reps):
        t0 = time.perf_counter()
        for p, f in base_chunks:
            baseline_chunk(p, f)
        base_rates.append(len(base_chunks) / (time.perf_counter() - t0))
    cpu_rate = float(np.median(base_rates))
    log(f"cpu baseline (1-core host, reference algorithm): median of "
        f"{base_reps} reps {cpu_rate:.4f} chunks/s "
        f"(all: {[round(r, 4) for r in base_rates]})")

    # MaskPLS train-step secondary metric, measured in a crash-isolated
    # subprocess (its big executable would otherwise trip the axon
    # one-hot-executable transport bug against the solver's)
    train_s = None
    default_ts = "1" if backend == "tpu" else "0"
    if os.environ.get("BENCH_TRAINSTEP", default_ts) == "1":
        train_s = trainstep_subprocess()

    out = {
        "metric": "ncuts_chunks_per_sec_per_chip",
        "value": round(tpu_rate, 4),
        "unit": "chunks/s",
        "vs_baseline": round(tpu_rate / cpu_rate, 2),
        "reps": [round(r, 3) for r in rates],
        "baseline_note": "reference algorithm on this 1-core host",
    }
    if device_path:
        out["solver_stats"] = {
            "rounds": device_solver.STATS["rounds"],
            "solves_per_tier": device_solver.STATS["solves_per_tier"],
            "overflow": device_solver.STATS["overflow"]}
        out["stage_timings_s"] = {k: round(v, 3) for k, v in stage.items()}
        out["stage_timings_per_rep"] = stage_reps
        try:
            out["host_loadavg_at_start"] = round(LOADAVG0, 2)
        except NameError:
            pass
        if flops:
            out["flops"] = flops
    if train_s is not None:
        out["maskpls_train_s_per_step_30k_bf16"] = round(train_s, 4)
    print(json.dumps(out))


def trainstep_subprocess(timeout: int = 2400):
    """Median MaskPLS train-step seconds at 30k pts (bf16) via a child
    process running this file with BENCH_TRAINSTEP_MODE=1."""
    import subprocess
    env = dict(os.environ)
    env["BENCH_TRAINSTEP_MODE"] = "1"
    env.pop("BENCH_PRECOMPILE", None)
    try:
        r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                           env=env, capture_output=True, text=True,
                           timeout=timeout)
    except subprocess.TimeoutExpired:
        log("train-step subprocess timed out; omitting metric")
        return None
    if r.returncode != 0:
        log(f"train-step subprocess failed rc={r.returncode}; "
            f"tail: {r.stderr[-400:]}")
        return None
    for line in reversed(r.stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)["s_per_step"]
    return None


def trainstep_mode():
    """Child: time the full MaskPS train step on a synthetic 30k chunk."""
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR",
                                     "/root/repo/.jax_cache"))
    import jax.numpy as jnp
    from autoinst_tpu.models.maskpls.model import (MaskPLSConfig,
                                                   create_train_state,
                                                   train_step)
    from autoinst_tpu.models.maskpls.pseudo_dataset import collate

    rng = np.random.default_rng(0)
    n, n_inst = 30000, 24
    pts, ins = [], []
    for i in range(n_inst):
        c = rng.uniform(-12, 12, 3) * np.array([1, 1, 0.15])
        k = n // n_inst
        pts.append(c + rng.normal(scale=1.0, size=(k, 3)))
        ins.append(np.full(k, i, np.int32))
    xyz = np.concatenate(pts)[:n]
    ins = np.concatenate(ins)[:n]
    item = {"xyz": xyz,
            "feats": np.concatenate([xyz, np.ones((n, 1))], 1),
            "masks": np.stack([ins == i for i in range(n_inst)]),
            "classes": np.zeros(n_inst, np.int32), "ins_labels": ins}
    cfg = MaskPLSConfig(compute_dtype="bfloat16", num_queries=40)
    batch, targets = collate([item], cfg.resolution, 32768, 30720, 40)
    batch = jax.tree.map(jnp.asarray, batch)
    targets = jax.tree.map(jnp.asarray, targets)
    state = create_train_state(jax.random.PRNGKey(0), cfg, batch)
    key = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    state, total, _ = train_step(state, batch, targets, key, cfg)
    float(total)
    log(f"train-step compile+first: {time.perf_counter() - t0:.1f}s")
    times = []
    for i in range(5):
        key, sub = jax.random.split(key)
        t0 = time.perf_counter()
        state, total, _ = train_step(state, batch, targets, sub, cfg)
        float(total)
        times.append(time.perf_counter() - t0)
    log(f"train-step times: {[round(t, 3) for t in times]}")
    print(json.dumps({"s_per_step": float(np.median(times))}))


if __name__ == "__main__":
    if os.environ.get("BENCH_TRAINSTEP_MODE") == "1":
        trainstep_mode()
    else:
        main()
