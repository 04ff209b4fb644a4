"""Exact grid-hash 1-NN on host for map-scale label transfer.

Replaces the reference's per-point Open3D KD-tree loops over millions of
points (dataset_utils.py:299-370, point_cloud_utils.py:144-174). References
are bucketed into a uniform grid (sort by cell key); each query scans
expanding cell shells until the found neighbor distance is certified
(< shell_radius), which makes the result exact, not approximate.

Vectorized per shell level over all still-unresolved queries. The common
case (label transfer onto voxel centroids, cell = voxel size) resolves in
the first shell for ~100% of queries.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libautoinst_native.so")
_lib = None


def _load_native():
    """Load (building on first use) the C++ kernel library, or None."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.grid_nn1.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.c_double,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_double),
        ]
        lib.grid_nn1.restype = None
        _lib = lib
    except OSError:
        return None
    return _lib


def grid_nn1_native(queries: np.ndarray, refs: np.ndarray, cell: float):
    lib = _load_native()
    if lib is None:
        return None
    q = np.ascontiguousarray(queries, np.float64)
    r = np.ascontiguousarray(refs, np.float64)
    m, n = len(q), len(r)
    idx = np.empty(m, np.int64)
    dist = np.empty(m, np.float64)
    lib.grid_nn1(
        q.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), m,
        r.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n,
        ctypes.c_double(cell),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        dist.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return idx, dist


def _cell_keys(ijk: np.ndarray, dims: np.ndarray) -> np.ndarray:
    return (ijk[:, 0] * dims[1] + ijk[:, 1]) * dims[2] + ijk[:, 2]


def grid_nn1(queries: np.ndarray, refs: np.ndarray, cell: float,
             max_shell: int = 64):
    """For each query, the index of its exact nearest reference point.

    Returns (idx [M] int64, dist [M] float64). `cell` should be on the order
    of the expected NN distance (e.g. the voxel size). Dispatches to the C++
    kernel when available; the numpy path below is the reference fallback.
    """
    out = grid_nn1_native(queries, refs, cell)
    if out is not None:
        return out
    return grid_nn1_np(queries, refs, cell, max_shell)


def grid_nn1_np(queries: np.ndarray, refs: np.ndarray, cell: float,
                max_shell: int = 64):
    queries = np.asarray(queries, np.float64)
    refs = np.asarray(refs, np.float64)
    m = len(queries)
    if len(refs) == 0:
        raise ValueError("empty reference cloud")

    min_bound = refs.min(axis=0) - cell
    r_ijk = np.floor((refs - min_bound) / cell).astype(np.int64)
    dims = r_ijk.max(axis=0) + 2
    r_keys = _cell_keys(r_ijk, dims)
    order = np.argsort(r_keys, kind="stable")
    r_keys_sorted = r_keys[order]
    refs_sorted = refs[order]

    q_ijk = np.floor((queries - min_bound) / cell).astype(np.int64)
    q_ijk = np.clip(q_ijk, 0, dims - 1)

    best_idx = np.full(m, -1, np.int64)
    best_d2 = np.full(m, np.inf)
    unresolved = np.arange(m)

    shell = 0
    while len(unresolved) and shell <= max_shell:
        # cells on the surface of the cube [-shell, shell]^3
        rng = np.arange(-shell, shell + 1)
        if shell == 0:
            offsets = np.zeros((1, 3), np.int64)
        else:
            oi, oj, ok = np.meshgrid(rng, rng, rng, indexing="ij")
            surf = (np.abs(oi) == shell) | (np.abs(oj) == shell) \
                 | (np.abs(ok) == shell)
            offsets = np.stack([oi[surf], oj[surf], ok[surf]], axis=1)

        q = q_ijk[unresolved]
        for off in offsets:
            cells = q + off
            ok_mask = np.all((cells >= 0) & (cells < dims), axis=1)
            if not ok_mask.any():
                continue
            keys = _cell_keys(cells[ok_mask], dims)
            lo = np.searchsorted(r_keys_sorted, keys, side="left")
            hi = np.searchsorted(r_keys_sorted, keys, side="right")
            has = hi > lo
            if not has.any():
                continue
            sub = np.where(ok_mask)[0][has]
            # scan candidates per occupied cell (cells are small: <= ~50 pts)
            for qi, l, h in zip(sub, lo[has], hi[has]):
                gq = unresolved[qi]
                cand = refs_sorted[l:h]
                d2 = np.sum((cand - queries[gq]) ** 2, axis=1)
                j = np.argmin(d2)
                if d2[j] < best_d2[gq]:
                    best_d2[gq] = d2[j]
                    best_idx[gq] = order[l + j]

        # a neighbor found at distance < shell*cell is certified exact
        certified = best_d2[unresolved] <= (shell * cell) ** 2
        unresolved = unresolved[~certified]
        shell += 1

    if len(unresolved):
        # brute-force stragglers (pathological geometry)
        for gq in unresolved:
            d2 = np.sum((refs - queries[gq]) ** 2, axis=1)
            best_idx[gq] = np.argmin(d2)
            best_d2[gq] = d2[best_idx[gq]]

    return best_idx, np.sqrt(best_d2)
