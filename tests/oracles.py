"""Independent numpy/scipy oracles of the reference algorithms, used only to
verify the TPU implementations on small inputs. Written from the behavioral
spec in SURVEY.md SS2.1 (items 12-13); float64 throughout."""

import numpy as np
from scipy import sparse
from scipy.spatial.distance import cdist


def affinity_oracle(points, alpha=1.0, proximity=1.0, tarl=None, theta=0.0,
                    dino=None, gamma=0.0):
    d = cdist(points, points)
    prox = np.where(d <= proximity, 1.0, 0.0)
    a = prox * np.exp(-alpha * d) if alpha else prox.copy()
    if theta and tarl is not None:
        dt = cdist(tarl, tarl)
        no_feat = ~np.asarray(tarl).any(1)
        dt[no_feat] = 0
        dt[:, no_feat] = 0
        a = a * (prox * np.exp(-theta * dt))
    if gamma and dino is not None:
        df = cdist(dino, dino)
        a = a * (prox * np.exp(-gamma * df))
    return a


def sweep_oracle(w, ev, num_cuts=10):
    """Reference get_min_ncut/ncut_cost semantics (normalized_cut.py:4-34)."""
    W = w + np.eye(w.shape[0])
    d = W.sum(axis=0)
    mn, mx = ev.min(), ev.max()
    best_mask = np.zeros_like(ev, dtype=bool)
    best = np.inf
    if np.allclose(mn, mx):
        return best_mask, best
    for t in np.linspace(mn, mx, num_cuts, endpoint=False):
        mask = ev > t
        cut = (np.sum(w) - np.sum(w[mask][:, mask])
               - np.sum(w[~mask][:, ~mask])) / 2
        with np.errstate(invalid="ignore", divide="ignore"):
            cost = cut / d[mask].sum() + cut / d[~mask].sum()
        if cost < best:
            best = cost
            best_mask = mask
    return best_mask, best


def fiedler_oracle(w):
    """2nd-smallest eigvec of the normalized Laplacian of w+I (float64)."""
    W = w + np.eye(w.shape[0])
    d = W.sum(axis=0)
    d2 = 1.0 / np.sqrt(d)
    A = (d2[:, None] * (np.diag(d) - W)) * d2[None, :]
    evals, evecs = np.linalg.eigh(A)
    return evecs[:, 1], evals[1]


def recursive_ncut_oracle(w, num_points_orig, labels, T=0.01, split_lim=0.01):
    """Reference recursion structure (normalized_cut.py:37-63), with a dense
    eigh Fiedler solve instead of ARPACK (exact on these test sizes)."""
    split_percentage = labels.shape[0] / (num_points_orig + 1e-8)
    if w.shape[0] > 2 and split_percentage > split_lim:
        ev, _ = fiedler_oracle(w)
        mask, mcut = sweep_oracle(w, ev)
        if mcut < T:
            a = recursive_ncut_oracle(w[mask][:, mask], num_points_orig,
                                      labels[mask], T=T, split_lim=split_lim)
            b = recursive_ncut_oracle(w[~mask][:, ~mask], num_points_orig,
                                      labels[~mask], T=T, split_lim=split_lim)
            return a + b
    return [labels]


def partition_sets(labels_or_groups, n=None):
    """Canonical form of a clustering for comparison."""
    if isinstance(labels_or_groups, list):
        return frozenset(frozenset(g.tolist()) for g in labels_or_groups)
    lab = np.asarray(labels_or_groups)
    return frozenset(
        frozenset(np.where(lab == v)[0].tolist()) for v in np.unique(lab)
    )


def clustered_points(seed=0, centers=((0, 0, 0), (4, 0, 0), (0, 5, 2)),
                     n_per=40, spread=0.25):
    """Synthetic chunk: tight clusters far apart (>proximity) => clear cuts."""
    rng = np.random.default_rng(seed)
    pts, gt = [], []
    for ci, c in enumerate(centers):
        pts.append(rng.normal(scale=spread, size=(n_per, 3)) + np.array(c))
        gt.append(np.full(n_per, ci))
    return np.concatenate(pts).astype(np.float32), np.concatenate(gt)
