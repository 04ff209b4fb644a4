"""Batched Fiedler-vector solvers for normalized-cut spectral bipartition.

The reference solves, per recursion node, the 2 smallest eigenpairs of the
normalized Laplacian A = D^-1/2 (D - W') D^-1/2 (W' = W + I) with ARPACK
shift-invert (reference: pipeline/ncuts/normalized_cut.py:37-54). ARPACK is
sequential, sparse-LU-bound, and host-only. Here the same spectral problem is
solved as dense-matrix iteration that is nothing but large GEMMs, so many
chunk graphs resolve in parallel on the MXU:

  * the trivial eigenpair (lambda=0, v0 = D^1/2 1) is deflated analytically;
  * the Fiedler vector is the top eigenvector of B = 2I - A restricted to
    v0-perp, found by blocked, fixed-iteration LOBPCG (all [N,N]x[N,b]
    GEMMs, vmap-able over a batch of graphs);
  * an exact dense `eigh` path covers small blocks and serves as the
    reference oracle in tests.

Padding contract (TPU static shapes): callers pass W zero-padded to [N,N]
with a boolean `valid` mask. Padded dimensions are given B-eigenvalue -1
(below every real one) so they can never pollute the Ritz space.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def laplacian_terms(W: jax.Array, valid: jax.Array):
    """Degrees and normalized-Laplacian pieces of W' = W + I on valid dims.

    Returns (d, B) where d[i] = sum_j W'[i,j] (reference normalized_cut.py:42)
    and B = 2I - A with A the symmetric normalized Laplacian of W'.
    """
    v = valid.astype(W.dtype)
    Wv = W * v[:, None] * v[None, :]
    d = jnp.sum(Wv, axis=1) + v  # + identity self-loop on valid dims
    d = jnp.where(valid, d, 1.0)
    inv_sqrt_d = jax.lax.rsqrt(d)
    # A = I - D^-1/2 W' D^-1/2 ; W' = Wv + diag(v)
    S = Wv * inv_sqrt_d[:, None] * inv_sqrt_d[None, :]
    A = -S
    diag_A = 1.0 - v * (inv_sqrt_d ** 2)  # I - D^-1/2 I D^-1/2 on valid
    A = A + jnp.diag(jnp.where(valid, diag_A, 3.0))
    B = -A + jnp.diag(jnp.where(valid, 2.0 * v, 0.0))
    return d, B


def _orthonormalize(X: jax.Array) -> jax.Array:
    """CholeskyQR2 orthonormalization.

    Householder QR of a tall [N, b] block is latency-bound on TPU; two
    rounds of Cholesky-QR (one [b,b] GEMM + tiny triangular solve each) are
    pure MXU work and numerically adequate at f32 for b <= 32. Rank
    deficiency is handled with a diagonal jitter."""
    def one_round(M):
        g = M.T @ M
        jitter = 1e-7 * jnp.maximum(jnp.trace(g), 1.0)
        g = g + jitter * jnp.eye(g.shape[0], dtype=M.dtype)
        l = jnp.linalg.cholesky(g)
        return jax.scipy.linalg.solve_triangular(
            l, M.T, lower=True).T

    return one_round(one_round(X))


# MXU passes for the LOBPCG GEMMs: "highest" = 6-pass bf16 (~f32 exact),
# "high" = 3-pass (2x faster, ~1e-6 relative error). Read at trace time.
import os as _os

LOBPCG_MATMUL_PRECISION = _os.environ.get("AUTOINST_EIGEN_PRECISION",
                                          "highest")


@partial(jax.jit, static_argnames=("block", "iters"))
def fiedler_lobpcg(W: jax.Array, valid: jax.Array, block: int = 8,
                   iters: int = 240, x0: jax.Array | None = None):
    """Fiedler vector of the normalized Laplacian of W + I, via LOBPCG.

    Fixed iteration count (static so a batch of graphs vmaps into pure GEMM
    work). The trivial eigenpair v0 = D^1/2 1 is deflated by iterating on the
    projected operator B' = P B P with P = I - v0 v0^T: v0's eigenvalue drops
    to 0, below the Fiedler Ritz value (~2 - lambda2 > 0 whenever a cut is
    worth taking), so no hard constraints are needed and rank-deficient QR
    completions are harmless. Returns (ev [N], lam2) with lam2 the Fiedler
    eigenvalue of A.

    x0: optional warm-start vector (e.g. the parent subgraph's Fiedler
    vector in recursive NCut) occupying the first block column; the
    converged answer is unchanged, convergence is just faster. A zero x0 is
    harmless (jittered CholeskyQR re-completes the block).
    """
    n = W.shape[0]
    d, B = laplacian_terms(W, valid)
    v0 = jnp.where(valid, jnp.sqrt(d), 0.0)
    v0 = v0 / jnp.linalg.norm(v0)
    prec = LOBPCG_MATMUL_PRECISION

    def proj(M):
        return M - v0[:, None] * jnp.matmul(v0[None, :], M, precision=prec)

    def matvec(M):  # B' M = P B P M, restricted to valid dims
        return proj(jnp.matmul(B, proj(M), precision=prec)) * valid[:, None]

    # deterministic init, zero on padded dims
    key = jax.random.PRNGKey(0)
    X = jax.random.normal(key, (n, block), dtype=W.dtype)
    if x0 is not None:
        X = X.at[:, 0].set(x0)
    X = _orthonormalize(proj(X * valid[:, None]))

    def body(carry):
        X, P, i, _ = carry
        BX = matvec(X)
        R = X.T @ BX  # block Rayleigh quotient
        Res = BX - X @ R
        res_norm = jnp.max(jnp.linalg.norm(Res[:, :2], axis=0))
        S = jnp.concatenate([X, Res, P], axis=1)
        S = _orthonormalize(S)
        BS = matvec(S)
        T = S.T @ BS
        T = 0.5 * (T + T.T)
        _, evecs = jnp.linalg.eigh(T)  # ascending
        top = evecs[:, -block:][:, ::-1]  # top-`block`, descending
        Xn = S @ top
        # restart directions: component of new X outside old X
        Pn = _orthonormalize(Xn - X @ (X.T @ Xn))
        Xn = _orthonormalize(Xn)
        return (Xn, Pn, i + 1, res_norm)

    def cond(carry):
        _, _, i, res_norm = carry
        return (i < iters) & (res_norm > 1e-4)

    P0 = jnp.zeros_like(X)
    X, _, _, _ = jax.lax.while_loop(cond, body,
                                    (X, P0, jnp.int32(0), jnp.float32(1.0)))

    rq = jnp.sum(X * matvec(X), axis=0)  # Ritz values of B'
    best = jnp.argmax(rq)
    ev = proj(jnp.take(X, best[None], axis=1))[:, 0]
    ev = ev / jnp.maximum(jnp.linalg.norm(ev), 1e-30)
    lam2 = 2.0 - jnp.take(rq, best)
    return ev * valid, lam2


@jax.jit
def fiedler_eigh(W: jax.Array, valid: jax.Array):
    """Exact dense path: second-smallest eigenvector of A via full eigh.

    Matches scipy `eigsh(A, 2, sigma=1e-10)` + argsort[1]
    (reference normalized_cut.py:49-53) up to eigenvector sign/basis.
    """
    _, B = laplacian_terms(W, valid)
    evals, evecs = jnp.linalg.eigh(B)  # ascending; top of B = smallest of A
    # top eigenvector of B is the trivial v0; second is the Fiedler vector
    ev = evecs[:, -2]
    lam2 = 2.0 - evals[-2]
    return ev * valid, lam2


fiedler_eigh_batched = jax.jit(jax.vmap(fiedler_eigh))
fiedler_lobpcg_batched = jax.jit(
    jax.vmap(fiedler_lobpcg, in_axes=(0, 0)), static_argnames=()
)
