"""Cross-chunk consensus fusion of self-training pseudo-labels.

The self-training export (reference pipeline/run_pipeline.py GEN_SELF_TRAIN
branch; ours pipeline/train_export.py) cuts the aggregated map into densely
overlapping chunks and runs NCuts on each independently, so the SAME physical
point is labeled up to ~24 times -- and the labelings contradict each other
(adjacent objects merged in one chunk, split in the next). The reference
absorbs this by training on a huge corpus where the network averages the
noise implicitly (README.md:100 "MaskPLS refined" beating raw NCuts); on a
small map the contradictions dominate the mask loss instead: its minimizer
is a soft/blurry mask, which the panoptic 0.8 overlap rule then drops.

This module makes the consensus explicit: a co-association vote over all
chunk labelings produces ONE globally consistent instance partition, and the
training chunks are relabeled from it. Classic evidence-accumulation
clustering (Fred & Jain 2005) restricted to a spatial kNN graph:

  1. Register points globally (chunks of one map share exact float64
     coordinates, so registration is a hash of the xyz bytes).
  2. Build a kNN graph over the unique points.
  3. Each edge collects one same/different-instance vote from every chunk
     that contains both endpoints.
  4. Edges with a strict same-majority survive; connected components of the
     surviving graph are the fused instances.

Majority voting resolves merge/split disagreements in either direction,
and a pair of objects that no chunk's kNN edges bridge simply stays split
(the conservative default). Ground needs no special casing: it forms one
giant component, which downstream eval already treats as ground (largest
cluster, pipeline/merging.py).
"""

from __future__ import annotations

import glob
import os

import numpy as np
from scipy.sparse import coo_matrix
from scipy.sparse.csgraph import connected_components


def register_points(point_sets: list[np.ndarray]):
    """Map each point of each set to a global id by exact coordinate match.

    Returns (global_ids_per_set, n_global, unique_pts)."""
    all_pts = np.concatenate([np.ascontiguousarray(p, dtype=np.float64)
                              for p in point_sets], axis=0)
    view = all_pts.view([("x", np.float64), ("y", np.float64),
                         ("z", np.float64)]).reshape(-1)
    uniq, inverse = np.unique(view, return_inverse=True)
    ids, off = [], 0
    for p in point_sets:
        ids.append(inverse[off:off + len(p)].astype(np.int64))
        off += len(p)
    uniq_pts = uniq.view(np.float64).reshape(-1, 3)
    return ids, len(uniq), uniq_pts


def knn_edges(pts: np.ndarray, k: int = 6) -> np.ndarray:
    """Undirected kNN edge list [E, 2] (deduplicated, i < j)."""
    from scipy.spatial import cKDTree
    tree = cKDTree(pts)
    _, nbr = tree.query(pts, k=k + 1, workers=-1)
    src = np.repeat(np.arange(len(pts)), k)
    dst = nbr[:, 1:].reshape(-1)
    lo = np.minimum(src, dst)
    hi = np.maximum(src, dst)
    return np.unique(np.stack([lo, hi], axis=1), axis=0)


def chunk_owners(global_ids: list[np.ndarray],
                 point_sets: list[np.ndarray], n_global: int) -> np.ndarray:
    """Per-point owner chunk: the containing chunk whose center is nearest.

    The owner is the chunk where the point is most central, i.e. where its
    object is most likely fully contained and NCuts saw the whole thing --
    the same trust rule the eval-side chunk merge applies implicitly."""
    best = np.full(n_global, np.inf)
    owner = np.full(n_global, -1, np.int32)
    for c, (gl, pts) in enumerate(zip(global_ids, point_sets)):
        center = pts.mean(axis=0)
        d = np.linalg.norm(pts[:, :2] - center[None, :2], axis=1)
        upd = d < best[gl]
        gu = gl[upd]
        best[gu] = d[upd]
        owner[gu] = c
    return owner


def fuse_labels(global_ids: list[np.ndarray], labels: list[np.ndarray],
                n_global: int, edges: np.ndarray, min_votes: int = 1,
                rule: str = "majority",
                owners: np.ndarray | None = None) -> np.ndarray:
    """Co-association fusion over a kNN graph.

    global_ids[c][i] is the global id of chunk c's point i; labels[c][i] its
    per-chunk instance label (< 0 = unlabeled). rule: "majority" keeps an
    edge when same-votes exceed different-votes; "unanimous" cuts on any
    different-vote (split-biased -- NCuts merge errors are systematic, so a
    majority can bake them in). owners (from chunk_owners) restricts each
    edge's electorate to the chunks owning its endpoints. Returns fused
    instance ids [n_global] (points on no surviving edge get singleton
    components)."""
    same = np.zeros(len(edges), np.int32)
    diff = np.zeros(len(edges), np.int32)
    lut = np.full(n_global, -1, np.int32)
    ep, eq = edges[:, 0], edges[:, 1]
    for c, (gl, lab) in enumerate(zip(global_ids, labels)):
        lut[gl] = lab.astype(np.int32)
        lp, lq = lut[ep], lut[eq]
        valid = (lp >= 0) & (lq >= 0)
        if owners is not None:
            valid &= (owners[ep] == c) | (owners[eq] == c)
        eq_lab = valid & (lp == lq)
        same += eq_lab
        diff += valid & ~eq_lab
        lut[gl] = -1
    if rule == "majority":
        keep = (same > diff) & (same + diff >= min_votes)
    elif rule == "unanimous":
        keep = (diff == 0) & (same >= min_votes)
    else:
        raise ValueError(f"unknown fusion rule: {rule}")
    e = edges[keep]
    graph = coo_matrix((np.ones(len(e), np.int8), (e[:, 0], e[:, 1])),
                       shape=(n_global, n_global))
    _, comp = connected_components(graph, directed=False)
    return comp.astype(np.int64)


def absorb_fragments(comp: np.ndarray, edges: np.ndarray,
                     min_size: int = 200, iters: int = 4) -> np.ndarray:
    """Reattach small components to neighboring large ones.

    Strict-majority fusion leaves boundary bands (where chunk labelings
    consistently disagree) as shards; training would treat those points as
    unsupervised and eval-side 1-NN transfers would inherit the noise.
    Each pass gives every point of a sub-min_size component the most common
    large-component id among its kNN neighbors (if any)."""
    comp = comp.copy()
    src = np.concatenate([edges[:, 0], edges[:, 1]])
    dst = np.concatenate([edges[:, 1], edges[:, 0]])
    for _ in range(iters):
        sizes = np.bincount(comp)
        big_ids = np.nonzero(sizes >= min_size)[0]
        remap = np.full(len(sizes), -1, np.int64)
        remap[big_ids] = np.arange(len(big_ids))
        small_pt = remap[comp] < 0
        if not small_pt.any():
            break
        m = small_pt[src] & (remap[comp[dst]] >= 0)
        if not m.any():
            break
        votes = coo_matrix(
            (np.ones(int(m.sum()), np.int32),
             (src[m], remap[comp[dst[m]]])),
            shape=(len(comp), len(big_ids))).tocsr()
        counts = np.asarray(votes.sum(axis=1)).ravel()
        best = np.asarray(votes.argmax(axis=1)).ravel()
        upd = small_pt & (counts > 0)
        comp[upd] = big_ids[best[upd]]
    return comp


def fuse_export_dir(train_dir: str, out_dir: str, k: int = 6,
                    label_key: str = "ncut_labels", min_size: int = 200,
                    verbose: bool = True) -> dict:
    """Fuse all training-chunk npzs under train_dir (the export layout
    train/<seq>/NNNNNN.npz) and write relabeled copies to out_dir.

    Returns summary stats (n_chunks, n_global, n_edges, n_components)."""
    files = sorted(glob.glob(os.path.join(train_dir, "*.npz")))
    if not files:
        raise FileNotFoundError(f"no npz chunks under {train_dir}")
    pts_sets, label_sets, payloads = [], [], []
    for p in files:
        with np.load(p) as d:
            payloads.append({kk: d[kk] for kk in d.files})
        pts_sets.append(payloads[-1]["pts"][:, :3])
        label_sets.append(payloads[-1][label_key])
    gids, n_global, uniq_pts = register_points(pts_sets)
    edges = knn_edges(uniq_pts, k=k)
    fused = fuse_labels(gids, label_sets, n_global, edges)
    if min_size:
        fused = absorb_fragments(fused, edges, min_size=min_size)
    os.makedirs(out_dir, exist_ok=True)
    n_comp_used = set()
    for path, payload, gl in zip(files, payloads, gids):
        lab = fused[gl]
        # compact per-chunk ids (the trainer one-hots against max t_max)
        uniq, lab = np.unique(lab, return_inverse=True)
        n_comp_used.update(uniq.tolist())
        payload[label_key] = lab.astype(np.int64)
        np.savez_compressed(os.path.join(out_dir, os.path.basename(path)),
                            **payload)
    stats = {"n_chunks": len(files), "n_global": int(n_global),
             "n_edges": int(len(edges)),
             "n_components_used": len(n_comp_used)}
    if verbose:
        print(f"label_fusion: {stats}", flush=True)
    return stats
