"""Recursive normalized cuts as a host-driven worklist of batched eigensolves.

The reference recurses in Python, one ARPACK shift-invert solve per node
(reference: pipeline/ncuts/normalized_cut.py:37-63). That is inherently
serial. Here recursion depth becomes *iterations over a batch*: every
pending subgraph is gathered out of the chunk affinity matrix on device,
padded to a size bucket, and all subgraphs in a bucket get their Fiedler
vector and threshold sweep in one vmapped call. The host only makes the
split/finalize decision per node -- a few bytes per subgraph cross the
PCIe boundary, never the matrices.

Semantics replicated from the reference (with file:line):
  * W' = W + I before the Laplacian                 (normalized_cut.py:38)
  * entry guard: size > 2 and size/orig > split_lim (normalized_cut.py:39-40)
  * 10 evenly spaced thresholds, endpoint excluded  (normalized_cut.py:27)
  * cut cost uses W (no self-loops), assoc uses the
    degrees of W'                                    (normalized_cut.py:4-11,54)
  * all-equal Fiedler vector => no split            (normalized_cut.py:21-23)
  * split when min cost < T, recurse on both sides  (normalized_cut.py:56-59)
  * note: the reference's inner recursion silently resets split_lim to its
    default 0.01 (normalized_cut.py:57-58); we apply `split_lim` uniformly,
    which is identical for the shipped configs (SPLIT_LIM = 0.01).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from autoinst_tpu.ops import eigen

# coarse bucket ladder: every distinct (bucket, batch) shape costs seconds
# of (remote) compilation, so keep the shape space tiny; padding waste in
# the gathered submatrices is cheap next to that
_BUCKETS = (256, 1024, 4096, 8192, 16384)
_MAX_BATCH_POW2 = 32
# cap on simultaneously-resident gathered submatrix elements (f32)
_MAX_BATCH_ELEMS = 1 << 26

# instrumentation: dispatch counts / wall time, reset per recursive call
STATS = {"solve_calls": 0, "rounds": 0, "items": 0}


def _auto_method(bucket: int) -> str:
    """eigh is exact and cheap on CPU, but its TPU compile takes minutes
    per shape; the GEMM-only LOBPCG compiles in seconds and is faster at
    every bucket size on the MXU."""
    if jax.default_backend() == "cpu":
        return "eigh" if bucket <= 512 else "lobpcg"
    return "lobpcg"


@partial(jax.jit, static_argnames=("num_cuts",))
def ncut_threshold_sweep(W: jax.Array, valid: jax.Array, ev: jax.Array,
                         num_cuts: int = 10):
    """Best bipartition of the Fiedler vector over `num_cuts` thresholds.

    Vectorizes the reference's per-threshold Python loop
    (normalized_cut.py:13-34): all masks are formed at once and their cut
    costs come from one [num_cuts, N] x [N, N] GEMM. Returns
    (mask [N] bool, mcut scalar; mcut=+inf when no admissible cut exists).
    """
    v = valid.astype(W.dtype)
    Wv = W * v[:, None] * v[None, :]
    d = jnp.sum(Wv, axis=1) + v  # degrees of W + I   (normalized_cut.py:42)

    big = jnp.asarray(jnp.inf, W.dtype)
    evv = jnp.where(valid, ev, big)
    mn = jnp.min(evv)
    evv = jnp.where(valid, ev, -big)
    mx = jnp.max(evv)

    # numpy.allclose(mn, mx) semantics (normalized_cut.py:22)
    degenerate = jnp.abs(mn - mx) <= (1e-8 + 1e-5 * jnp.abs(mx))

    ts = mn + (mx - mn) * jnp.arange(num_cuts, dtype=W.dtype) / num_cuts
    masks = (ev[None, :] > ts[:, None]) & valid[None, :]  # [C, N]
    mf = masks.astype(W.dtype)
    cof = v[None, :] - mf  # complement within valid dims
    # cut cost = m^T W (1 - m): one GEMM for all thresholds
    MW = mf @ Wv  # [C, N]
    cut = jnp.sum(MW * cof, axis=1)
    assoc_a = mf @ d
    assoc_b = cof @ d
    cost = cut / assoc_a + cut / assoc_b  # 0/0 -> nan, like numpy
    cost = jnp.where(jnp.isnan(cost), big, cost)
    cost = jnp.where(degenerate, big, cost)

    best = jnp.argmin(cost)
    return masks[best], cost[best]


def _bucket_of(n: int) -> int:
    for b in _BUCKETS:
        if n <= b:
            return b
    raise ValueError(f"subgraph of {n} points exceeds the largest bucket")


@partial(jax.jit, static_argnames=("method", "iters"))
def _solve_batch(W: jax.Array, cid: jax.Array, idx: jax.Array,
                 valid: jax.Array, method: str, iters: int):
    """Gather submatrices W[cid][idx][:, idx] and solve their cuts, batched.

    W is a stack of chunk graphs [C, N, N]; every worklist item addresses one
    chunk by `cid` -- subgraphs from *different chunks* solve in one call."""

    def one(cid_i, idx_i, valid_i):
        Wc = W[cid_i]
        sub = jnp.take(jnp.take(Wc, idx_i, axis=0), idx_i, axis=1)
        sub = sub * valid_i[:, None] * valid_i[None, :]
        if method == "eigh":
            ev, _ = eigen.fiedler_eigh(sub, valid_i)
        else:
            ev, _ = eigen.fiedler_lobpcg(sub, valid_i, iters=iters)
        return ncut_threshold_sweep(sub, valid_i, ev)

    return jax.vmap(one)(cid, idx, valid)


def recursive_ncut_batch(W: jax.Array, num_valids, T: float = 0.03,
                         split_lim: float = 0.01, method: str = "auto",
                         lobpcg_iters: int = 240) -> list[np.ndarray]:
    """Cluster a batch of chunk graphs W [C, N, N] (chunk c has
    num_valids[c] real rows) through ONE shared worklist: every round, all
    pending subgraphs of all chunks -- grouped by size bucket -- are solved
    in single vmapped device calls. Returns per-chunk int32 label arrays.

    This is the replacement for recursion depth (SURVEY.md SS7.6): the
    reference does one serial ARPACK solve per tree node; here the whole
    forest advances level by level with GEMM-batched solves.
    """
    num_valids = [int(n) for n in np.atleast_1d(num_valids)]
    labels = [np.zeros((n,), np.int32) for n in num_valids]
    next_label = [0] * len(num_valids)

    def admissible(cid: int, size: int) -> bool:
        # entry guard, normalized_cut.py:39-40
        return size > 2 and size / (num_valids[cid] + 1e-8) > split_lim

    worklist: list[tuple[int, np.ndarray]] = []
    finalized: list[tuple[int, np.ndarray]] = []
    for c, n in enumerate(num_valids):
        root = np.arange(n, dtype=np.int32)
        (worklist if admissible(c, n) else finalized).append((c, root))

    while worklist:
        by_bucket: dict[int, list] = {}
        for item in worklist:
            by_bucket.setdefault(_bucket_of(len(item[1])), []).append(item)
        worklist = []

        # phase 1: dispatch every (bucket, batch) solve of this round without
        # blocking, so device work and host<->device transfers overlap across
        # groups (a single blocking call per group would serialize on link
        # latency, which dominates over a remote/tunneled device)
        pending = []
        STATS["rounds"] += 1
        for bucket, items in sorted(by_bucket.items()):
            m = _auto_method(bucket) if method == "auto" else method
            max_batch = max(1, min(_MAX_BATCH_ELEMS // (bucket * bucket),
                                   _MAX_BATCH_POW2))
            for lo in range(0, len(items), max_batch):
                batch = items[lo:lo + max_batch]
                bsz = len(batch)
                # pad the batch to a power of two (replicating the last item)
                # so the jit cache sees a bounded set of (bucket, batch)
                # shapes -- otherwise every worklist round compiles anew
                padded_bsz = 1 << (bsz - 1).bit_length()
                cids = np.zeros((padded_bsz,), np.int32)
                idx = np.zeros((padded_bsz, bucket), np.int32)
                val = np.zeros((padded_bsz, bucket), bool)
                for i in range(padded_bsz):
                    c, it = batch[min(i, bsz - 1)]
                    cids[i] = c
                    idx[i, :len(it)] = it
                    val[i, :len(it)] = True
                out = _solve_batch(W, jnp.asarray(cids), jnp.asarray(idx),
                                   jnp.asarray(val), m, lobpcg_iters)
                STATS["solve_calls"] += 1
                STATS["items"] += bsz
                pending.append((batch, out))

        # phase 2: collect + split
        for batch, (masks, mcuts) in pending:
            masks = np.asarray(masks)
            mcuts = np.asarray(mcuts)
            for i, (c, it) in enumerate(batch):
                if mcuts[i] < T:
                    m_i = masks[i, :len(it)]
                    for side in (it[m_i], it[~m_i]):
                        if admissible(c, len(side)):
                            worklist.append((c, side))
                        else:
                            finalized.append((c, side))
                else:
                    finalized.append((c, it))

    for c, cluster in finalized:
        labels[c][cluster] = next_label[c]
        next_label[c] += 1
    return labels


def recursive_ncut(W: jax.Array, num_valid: int, T: float = 0.03,
                   split_lim: float = 0.01, method: str = "auto",
                   lobpcg_iters: int = 240) -> np.ndarray:
    """Single-chunk convenience wrapper around recursive_ncut_batch."""
    return recursive_ncut_batch(W[None], [num_valid], T=T,
                                split_lim=split_lim, method=method,
                                lobpcg_iters=lobpcg_iters)[0]


def warmup_shapes(W: jax.Array, method: str = "auto",
                  lobpcg_iters: int = 240, max_bucket: int | None = None):
    """Pre-compile every (bucket, batch) solve shape for the given chunk
    stack so timed runs never hit the multi-second per-shape compile."""
    n = W.shape[1]
    max_bucket = max_bucket or n
    for bucket in _BUCKETS:
        if bucket > max_bucket:
            break
        m = _auto_method(bucket) if method == "auto" else method
        cap = max(1, min(_MAX_BATCH_ELEMS // (bucket * bucket),
                         _MAX_BATCH_POW2))
        b = 1
        while True:
            cids = jnp.zeros((b,), jnp.int32)
            idx = jnp.zeros((b, bucket), jnp.int32)
            val = jnp.zeros((b, bucket), bool).at[:, :3].set(True)
            jax.block_until_ready(
                _solve_batch(W, cids, idx, val, m, lobpcg_iters))
            if b >= cap:
                break
            b = min(b * 2, 1 << (cap - 1).bit_length())
