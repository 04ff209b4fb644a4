"""Fully device-resident recursive normalized cuts (tiered worklist).

The host worklist (solver.py) pays one device dispatch per (bucket, batch)
group per recursion level; over a tunneled/remote device, chain depth x
link RTT dominates. This variant keeps the ENTIRE recursion on device: a
jit-compiled lax.while_loop owns fixed-capacity node queues -- one per size
tier, so small subgraphs are solved at small padded sizes (the bucketing
economics of the host version are preserved) -- and processes a batch of
nodes from every tier per iteration. One dispatch clusters a whole batch of
chunks; only the final label arrays leave the chip.

Semantics match solver.py / the reference recursion
(normalized_cut.py:37-63): same entry guards, Fiedler solve, 10-threshold
sweep, and split rule. Node processing order differs (per-tier FIFO), which
only permutes final label ids.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from autoinst_tpu.ops import eigen
from autoinst_tpu.ncuts.solver import ncut_threshold_sweep

# (tier width, nodes solved per iteration, queue capacity); the per-tier
# batch is small at big widths because padded slots in a deep recursion
# chain cost full solves. The measured A/B (results/bench_ab_r3, VERDICT
# r2 #7) shows widening the 256 tier to 32 lanes cuts solver rounds
# 61 -> 18 but does NOT move wall time -- each round is proportionally
# wider, so the solver is lane-work-bound, not dispatch-bound. Default
# stays 8,8,4,1 (same speed, lower peak memory). Override per-tier
# batches for A/B runs with AUTOINST_TIER_BATCHES="b256,b1024,b4096,b16384".
import os as _os

_TIER_BATCHES = tuple(int(x) for x in _os.environ.get(
    "AUTOINST_TIER_BATCHES", "8,8,4,1").split(","))
_TIERS = tuple(
    (w, b, c) for (w, c), b in zip(
        ((256, 8192), (1024, 2048), (4096, 512), (16384, 128)),
        _TIER_BATCHES))

# per-chunk component-table capacity for the connected-component seeding
_SEED_CAP = 512


def device_tier_cap() -> int:
    """Largest chunk width the device worklist solves without falling back
    to the host path (the top tier's padded width)."""
    return _TIERS[-1][0]


@jax.jit
def connected_components(W: jax.Array, valid: jax.Array) -> jax.Array:
    """Per-graph connected components of a batch of dense affinities.

    W [C, N, N] (nonzero = edge; diagonal nonzero for valid points),
    valid [C, N] bool. Returns int32 labels [C, N]: each valid point gets
    the max point index of its component; invalid points get -1.

    Max-label propagation to fixpoint: each sweep is one fused select+max
    over the [C, N, N] adjacency; sweeps = graph diameter. (Pointer jumping
    was tried for O(log diam) sweeps and measured ~5% SLOWER end-to-end on
    chunk graphs: their diameter is already small and the extra [C, N]
    gather per sweep costs more than the sweeps it saves.)"""
    C, N, _ = W.shape
    adj = W > 0  # bool: 4x less HBM traffic than re-testing f32 W per sweep
    iota_n = jnp.arange(N, dtype=jnp.int32)

    def body(carry):
        lab, _ = carry
        nxt = jnp.max(jnp.where(adj, lab[:, None, :], -1), axis=2)
        nxt = jnp.maximum(lab, jnp.where(valid, nxt, -1))
        return nxt, jnp.any(nxt != lab)

    lab0 = jnp.where(valid, iota_n[None, :], -1)
    lab, _ = jax.lax.while_loop(lambda c: c[1], body,
                                (lab0, jnp.bool_(True)))
    return lab


def _tiers_for(n: int):
    out = [t for t in _TIERS if t[0] < n]
    # top tier exactly n
    for width, nb, cap in _TIERS:
        if width >= n:
            out.append((n, nb, cap))
            break
    else:
        raise ValueError(f"chunk size {n} exceeds the largest tier")
    return tuple(out)


@partial(jax.jit, static_argnames=("T", "split_lim", "iters", "tiers",
                                   "seed_cap"))
def _device_ncut(W: jax.Array, num_valids: jax.Array, T: float,
                 split_lim: float, iters: int, tiers: tuple,
                 seed_cap: int = _SEED_CAP):
    C, N, _ = W.shape
    n_tiers = len(tiers)

    q_idx = [jnp.zeros((cap, width), jnp.int32) for width, _, cap in tiers]
    q_size = [jnp.zeros((cap,), jnp.int32) for _, _, cap in tiers]
    q_chunk = [jnp.zeros((cap,), jnp.int32) for _, _, cap in tiers]
    # warm-start Fiedler carriers: children inherit the parent's eigenvector
    # restricted to their indices (answers unchanged, convergence faster)
    q_warm = [jnp.zeros((cap, width), jnp.float32) for width, _, cap in tiers]
    heads = [jnp.int32(0) for _ in tiers]
    tails = [jnp.int32(0) for _ in tiers]
    labels = jnp.zeros((C, N), jnp.int32)
    counters = jnp.zeros((C,), jnp.int32)
    overflow = jnp.zeros((), jnp.int32)

    def admissible(chunk, size):
        return (size > 2) & (size.astype(jnp.float32)
                             / (num_valids[chunk].astype(jnp.float32) + 1e-8)
                             > split_lim)

    # ---- connected-component pre-seeding --------------------------------
    # Cuts between disconnected components cost ncut = 0 < T, so the
    # recursion ALWAYS ends up separating components -- but one zero-cost
    # peel at a time, a sequential chain that dominates wall time on
    # fragmented graphs (clutter-heavy chunks have hundreds of components).
    # Seeding one worklist node per component instead of one per chunk
    # runs those branches in parallel, and components below the
    # admissibility guards finalize immediately with no eigensolve.
    # Final partitions match the recursion run to its fixpoint; see
    # docs/PARITY.md for the degenerate-ordering caveat vs the reference
    # (normalized_cut.py:37-63), whose small multi-component leaves depend
    # on ARPACK's arbitrary basis for repeated eigenvalues.
    top = n_tiers - 1
    top_width = tiers[top][0]
    iota_n = jnp.arange(N, dtype=jnp.int32)
    valid_cn = iota_n[None, :] < num_valids[:, None]          # [C, N]
    lab = connected_components(W, valid_cn)

    # component table per chunk: sort points by component id -> contiguous
    # segments; starts/sizes per component ordinal (capped at _SEED_CAP)
    sort_key = jnp.where(valid_cn, lab, jnp.int32(N + 1))
    order = jnp.argsort(sort_key, axis=1).astype(jnp.int32)   # [C, N]
    sc = jnp.take_along_axis(sort_key, order, axis=1)
    prev = jnp.concatenate(
        [jnp.full((C, 1), -2, sc.dtype), sc[:, :-1]], axis=1)
    is_start = (sc != prev) & (sc < N)
    ord_k = jnp.cumsum(is_start, axis=1) - 1                  # [C, N]
    K = seed_cap
    rowc = jnp.broadcast_to(jnp.arange(C, dtype=jnp.int32)[:, None], (C, N))
    k_idx = jnp.where(is_start & (ord_k < K), ord_k, K)       # K = drop slot
    starts = jnp.zeros((C, K + 1), jnp.int32).at[rowc, k_idx].set(
        jnp.broadcast_to(iota_n[None], (C, N)))[:, :K]
    s_idx = jnp.where((sc < N) & (ord_k < K), ord_k, K)
    sizes_tab = jnp.zeros((C, K + 1), jnp.int32).at[rowc, s_idx].add(
        1)[:, :K]
    ncomp = jnp.sum(is_start, axis=1)
    # chunks with more components than the table holds fall back to a
    # whole-chunk root node (slower, never wrong)
    fallback = ncomp > K
    # order[c] lists the valid indices first, so a fallback root is just
    # the (start=0, size=num_valid) segment of the same permutation
    order_pad = jnp.concatenate(
        [order, jnp.zeros((C, top_width), jnp.int32)], axis=1)

    # (size-sorted seeding was tried for homogeneous lock-step lanes and
    # measured no benefit on chunk graphs; seeds enqueue in table order)
    seed_size = jnp.where(
        fallback[:, None],
        jnp.where(jnp.arange(K)[None, :] == 0,
                  num_valids[:, None].astype(jnp.int32), 0),
        sizes_tab)                                            # [C, K]
    seed_start = jnp.where(fallback[:, None], 0, starts)

    def seed_one(ti, st):
        (q_idx, q_size, q_chunk, q_warm, tails, labels, counters,
         overflow) = st
        c = ti // K
        k = ti % K
        size = seed_size[c, k]
        start = seed_start[c, k]
        adm = admissible(c, size)
        do_fin = (size > 0) & ~adm
        do_push = (size > 0) & adm
        # finalize inadmissible components as single instances
        row = order[c]
        in_seg = (iota_n >= start) & (iota_n < start + size)
        upd = jnp.where(in_seg & do_fin, counters[c], labels[c, row])
        labels = labels.at[c, row].set(upd)
        counters = counters.at[c].add(jnp.where(do_fin, 1, 0))
        for kk in range(n_tiers):
            wk, _, capk = tiers[kk]
            lo = tiers[kk - 1][0] if kk else 0
            dest = do_push & (size > lo) & (size <= wk)
            full = tails[kk] >= capk  # heads are 0 during seeding
            overflow = overflow + jnp.where(dest & full, 1, 0)
            en = dest & ~full
            pos = jnp.where(en, tails[kk] % capk, capk - 1)
            child = jax.lax.dynamic_slice(order_pad[c], (start,), (wk,))
            q_idx[kk] = jax.lax.cond(
                en, lambda q, ch=child, p=pos: q.at[p].set(ch),
                lambda q: q, q_idx[kk])
            q_size[kk] = q_size[kk].at[pos].set(
                jnp.where(en, size, q_size[kk][pos]))
            q_chunk[kk] = q_chunk[kk].at[pos].set(
                jnp.where(en, c, q_chunk[kk][pos]))
            tails[kk] = tails[kk] + jnp.where(en, 1, 0)
        return (q_idx, q_size, q_chunk, q_warm, tails, labels, counters,
                overflow)

    (q_idx, q_size, q_chunk, q_warm, tails, labels, counters,
     overflow) = jax.lax.fori_loop(
        0, C * K, seed_one,
        (q_idx, q_size, q_chunk, q_warm, tails, labels, counters, overflow))

    # run stats (VERDICT r1 #5): while-loop rounds + real (non-padded)
    # solves per tier; returned so callers can report them
    stat_rounds = jnp.int32(0)
    stat_solves = jnp.zeros((n_tiers,), jnp.int32)

    def pack(q_idx, q_size, q_chunk, q_warm, heads, tails, labels, counters,
             overflow, stat_rounds, stat_solves):
        return (*q_idx, *q_size, *q_chunk, *q_warm, *heads, *tails, labels,
                counters, overflow, stat_rounds, stat_solves)

    def unpack(state):
        k = n_tiers
        return (list(state[0:k]), list(state[k:2 * k]),
                list(state[2 * k:3 * k]), list(state[3 * k:4 * k]),
                list(state[4 * k:5 * k]), list(state[5 * k:6 * k]),
                state[6 * k], state[6 * k + 1], state[6 * k + 2],
                state[6 * k + 3], state[6 * k + 4])

    def solve_tier(width, chunks, idxs, sizes, warms):
        iota_w = jnp.arange(width, dtype=jnp.int32)

        def one(chunk, idx, size, warm):
            valid = iota_w < size
            sub = W[chunk][idx][:, idx]
            sub = sub * valid[:, None] * valid[None, :]
            ev, _ = eigen.fiedler_lobpcg(sub, valid, iters=iters, x0=warm)
            mask, mcut = ncut_threshold_sweep(sub, valid, ev)
            return mask, mcut, ev

        return jax.vmap(one)(chunks, idxs, sizes, warms)

    def body(state):
        def make_tier(t):
            width, nb, cap = tiers[t]

            def process(state):
                return _process_tier(state, t)

            return process

        def _process_tier(state, t):
            (q_idx, q_size, q_chunk, q_warm, heads, tails, labels, counters,
             overflow, stat_rounds, stat_solves) = unpack(state)
            width, nb, cap = tiers[t]
            iota_w = jnp.arange(width, dtype=jnp.int32)
            n_proc = jnp.minimum(tails[t] - heads[t], nb)
            stat_solves = stat_solves.at[t].add(n_proc)
            slots = heads[t] + jnp.arange(nb, dtype=jnp.int32)
            active = jnp.arange(nb) < n_proc
            slots_c = jnp.where(active, slots % cap, 0)

            chunks = q_chunk[t][slots_c]
            idxs = q_idx[t][slots_c]
            sizes = jnp.where(active, q_size[t][slots_c], 3)
            warms = q_warm[t][slots_c]

            masks, mcuts, evs = solve_tier(width, chunks, idxs, sizes, warms)

            def handle(i, st):
                (q_idx, q_size, q_chunk, q_warm, tails, labels, counters,
                 overflow) = st
                chunk = chunks[i]
                idx = idxs[i]
                size = sizes[i]
                valid = iota_w < size
                sel = masks[i] & valid
                na = jnp.sum(sel).astype(jnp.int32)
                nb_ = size - na
                want_split = active[i] & (mcuts[i] < T)

                order_a = jnp.argsort(jnp.where(sel, 0, 1), stable=True)
                order_b = jnp.argsort(jnp.where(valid & ~sel, 0, 1),
                                      stable=True)
                idx_a = idx[order_a]
                idx_b = idx[order_b]
                ev_i = evs[i]
                warm_a = ev_i[order_a]
                warm_b = ev_i[order_b]

                def finalize(st, side_idx, side_n, enabled):
                    (q_idx, q_size, q_chunk, q_warm, tails, labels, counters,
                     overflow) = st
                    lab = counters[chunk]
                    member = iota_w < side_n
                    upd = jnp.where(member & enabled, lab,
                                    labels[chunk][side_idx])
                    labels = labels.at[chunk, side_idx].set(upd)
                    counters = counters.at[chunk].add(
                        jnp.where(enabled, 1, 0))
                    return (q_idx, q_size, q_chunk, q_warm, tails, labels,
                            counters, overflow)

                def push(st, side_idx, side_n, side_warm, enabled):
                    # destination tier: smallest width >= side_n
                    (q_idx, q_size, q_chunk, q_warm, tails, labels, counters,
                     overflow) = st
                    for k in range(t + 1):  # children never grow
                        wk, _, capk = tiers[k]
                        if k == 0:
                            dest = wk >= side_n
                        else:
                            dest = (wk >= side_n) & (tiers[k - 1][0] < side_n)
                        # ring buffer: full only when `cap` nodes PENDING
                        # (heads[k] captured from the enclosing tier loop)
                        full = (tails[k] - heads[k]) >= capk
                        en = enabled & dest & ~full
                        overflow = overflow + jnp.where(
                            enabled & dest & full, 1, 0)
                        pos = jnp.where(en, tails[k] % capk, capk - 1)
                        child = side_idx[:wk]
                        child_warm = side_warm[:wk]
                        q_idx[k] = jax.lax.cond(
                            en,
                            lambda q, c=child, p=pos: q.at[p].set(c),
                            lambda q: q, q_idx[k])
                        q_warm[k] = jax.lax.cond(
                            en,
                            lambda q, c=child_warm, p=pos: q.at[p].set(c),
                            lambda q: q, q_warm[k])
                        q_size[k] = q_size[k].at[pos].set(
                            jnp.where(en, side_n, q_size[k][pos]))
                        q_chunk[k] = q_chunk[k].at[pos].set(
                            jnp.where(en, chunk, q_chunk[k][pos]))
                        tails[k] = tails[k] + jnp.where(en, 1, 0)
                    return (q_idx, q_size, q_chunk, q_warm, tails, labels,
                            counters, overflow)

                for side_idx, side_n, side_warm in (
                        (idx_a, na, warm_a), (idx_b, nb_, warm_b)):
                    adm = admissible(chunk, side_n)
                    st = finalize(st, side_idx, side_n,
                                  want_split & ~adm)
                    st = push(st, side_idx, side_n, side_warm,
                              want_split & adm)
                st = finalize(st, idx, size, active[i] & ~want_split)
                return st

            st = (q_idx, q_size, q_chunk, q_warm, tails, labels, counters,
                  overflow)
            st = jax.lax.fori_loop(0, nb, handle, st)
            (q_idx, q_size, q_chunk, q_warm, tails, labels, counters,
             overflow) = st
            heads[t] = heads[t] + n_proc
            return pack(q_idx, q_size, q_chunk, q_warm, heads, tails, labels,
                        counters, overflow, stat_rounds, stat_solves)

        # count the round (stats live in the last two state slots)
        state = state[:-2] + (state[-2] + 1, state[-1])
        # skip empty tiers entirely: without the cond, an idle tier would
        # still pay its full vmapped solve on dummy slots every iteration
        for t in range(len(tiers)):
            _, _, _, _, heads, tails, _, _, _, _, _ = unpack(state)
            state = jax.lax.cond(tails[t] > heads[t], make_tier(t),
                                 lambda s: s, state)
        return state

    def cond(state):
        _, _, _, _, heads, tails, _, _, _, _, _ = unpack(state)
        pending = heads[0] < tails[0]
        for t in range(1, n_tiers):
            pending = pending | (heads[t] < tails[t])
        return pending

    state = pack(q_idx, q_size, q_chunk, q_warm, heads, tails, labels,
                 counters, overflow, stat_rounds, stat_solves)
    state = jax.lax.while_loop(cond, body, state)
    (_, _, _, _, _, _, labels, counters, overflow, stat_rounds,
     stat_solves) = unpack(state)
    return labels, counters, overflow, stat_rounds, stat_solves


# last-run statistics (reset per recursive_ncut_device call): while-loop
# rounds, real solves per tier, queue overflows, host fallbacks
STATS = {"rounds": 0, "solves_per_tier": {}, "overflow": 0,
         "host_fallbacks": 0, "calls": 0}


def recursive_ncut_device_async(W: jax.Array, num_valids, T: float = 0.03,
                                split_lim: float = 0.01, iters: int = 240,
                                seed_cap: int = _SEED_CAP):
    """Dispatch the device worklist WITHOUT blocking on its results.

    Returns an opaque handle for finish_ncut_device. JAX dispatch is
    asynchronous, so the caller can upload/build the NEXT chunk batch over
    the (slow, tunneled) host-device link while this batch's while_loop
    runs on chip -- the double-buffering VERDICT r3 #5 asked for. The
    oversized-chunk host fallback is synchronous (it runs on host anyway).
    """
    num_valids = np.atleast_1d(np.asarray(num_valids, np.int32))
    STATS["calls"] += 1
    if W.shape[1] > _TIERS[-1][0]:
        from autoinst_tpu.ncuts.solver import recursive_ncut_batch
        STATS["host_fallbacks"] += 1
        labels = recursive_ncut_batch(W, num_valids, T=T,
                                      split_lim=split_lim)
        return ("sync", labels)
    tiers = _tiers_for(W.shape[1])
    out = _device_ncut(W, jnp.asarray(num_valids), float(T),
                       float(split_lim), int(iters), tiers,
                       seed_cap=int(seed_cap))
    return ("async", out, tiers, num_valids)


def finish_ncut_device(handle) -> list[np.ndarray]:
    """Block on a recursive_ncut_device_async handle; fills STATS and
    returns the per-chunk label arrays."""
    if handle[0] == "sync":
        return handle[1]
    (labels, counters, overflow, rounds, solves), tiers, num_valids = \
        handle[1], handle[2], handle[3]
    STATS["rounds"] = int(rounds)
    STATS["solves_per_tier"] = {int(w): int(s) for (w, _, _), s
                                in zip(tiers, np.asarray(solves))}
    STATS["overflow"] = int(overflow)
    if int(overflow) > 0:
        raise RuntimeError(f"device NCut queue overflow ({int(overflow)} "
                           f"nodes); raise tier capacities")
    labels = np.asarray(labels)
    return [labels[c, :n] for c, n in enumerate(num_valids)]


def recursive_ncut_device(W: jax.Array, num_valids, T: float = 0.03,
                          split_lim: float = 0.01, iters: int = 240,
                          seed_cap: int = _SEED_CAP) -> list[np.ndarray]:
    """Device-resident equivalent of solver.recursive_ncut_batch (one
    dispatch per chunk batch). Raises on node-queue overflow.

    Chunks wider than the largest tier (16,384) fall back to the host
    worklist (solver.recursive_ncut_batch) instead of raising -- rare
    post-downsample, but a real map must never die on one outsized chunk.
    Run statistics land in STATS (rounds / solves per tier / overflow)."""
    return finish_ncut_device(recursive_ncut_device_async(
        W, num_valids, T=T, split_lim=split_lim, iters=iters,
        seed_cap=seed_cap))
