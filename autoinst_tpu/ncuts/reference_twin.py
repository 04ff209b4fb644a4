"""Reference-algorithm twin: the upstream per-chunk NCuts chain with
verbatim semantics (scipy cdist affinity + ARPACK shift-invert recursion),
used as the comparison arm of the parity harness (VERDICT r2 #2).

Mirrors /root/reference/pipeline/ncuts/ncuts_utils.py:60-156 (affinity
terms) and /root/reference/pipeline/ncuts/normalized_cut.py:37-63 (the
recursion: +I regularization, normalized Laplacian, eigsh(sigma=1e-10),
10-threshold sweep, split while ncut-cost < T). This is the same algorithm
bench.py::baseline_chunk times; here it is parameterized and returns label
arrays so the FULL pipeline (chunking, reprojection, merging, metrics) can
run with the reference solver in place of ours, giving a real
ours-vs-reference-algorithm metric diff on identical data.

Deliberate duplication: like tests/oracles.py, this file exists to pin
reference behavior, not to be a production path.
"""

from __future__ import annotations

import numpy as np


def affinity_reference(points: np.ndarray, tarl: np.ndarray | None,
                       alpha: float, theta: float, proximity: float):
    """Reference affinity (ncuts_utils.py:60-156), spatial (+ TARL) terms:
    proximity-masked exp(-alpha*d) [* exp(-theta*d_tarl)], csr matrix."""
    from scipy import sparse
    from scipy.spatial.distance import cdist

    d = cdist(points, points)
    mask = np.where(d <= proximity, 1, 0)
    A = mask * np.exp(-alpha * d)
    if theta and tarl is not None:
        dt = cdist(tarl, tarl)
        no_feat = ~tarl.any(1)
        dt[no_feat] = 0
        dt[:, no_feat] = 0
        A = A * (mask * np.exp(-theta * dt))
    return sparse.csr_matrix(A)


def recursive_ncut_reference(A, T: float, split_lim: float) -> np.ndarray:
    """Reference recursion (normalized_cut.py:37-63); returns int labels."""
    from scipy import sparse
    from scipy.sparse.linalg import eigsh

    n = A.shape[0]
    out = np.zeros(n, np.int32)
    next_label = [0]

    def ncut(w, idx):
        W = w + sparse.identity(w.shape[0])
        if W.shape[0] > 2 and idx.shape[0] / (n + 1e-8) > split_lim:
            deg = np.array(W.sum(axis=0))[0]
            D2 = sparse.diags(np.reciprocal(np.sqrt(deg)))
            L = D2 * (sparse.diags(deg) - W) * D2
            try:
                evals, evecs = eigsh(L, 2, sigma=1e-10, which="LM")
            except Exception:
                out[idx] = next_label[0]
                next_label[0] += 1
                return
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
            if mcut < T:
                ncut(w[best][:, best], idx[best])
                ncut(w[~best][:, ~best], idx[~best])
                return
        out[idx] = next_label[0]
        next_label[0] += 1

    ncut(A, np.arange(n))
    return out


def reference_chunk_labels(points: np.ndarray, tarl: np.ndarray | None,
                           alpha: float, theta: float, proximity: float,
                           T: float, split_lim: float) -> np.ndarray:
    """Full reference per-chunk chain: affinity -> recursion -> labels."""
    A = affinity_reference(np.asarray(points, np.float64), tarl,
                           alpha, theta, proximity)
    return recursive_ncut_reference(A, T, split_lim)
