"""Point-to-plane ICP registration (device compute).

Equivalent capability to the reference's Open3D ICP refinement option in
map aggregation (aggregate_pointcloud.py:59-81,141-159, default OFF):
normals from kNN PCA, 1-NN correspondences within a distance threshold,
and the small-angle linearized point-to-plane least squares solved per
iteration. All neighbor work rides the tiled device ops.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from autoinst_tpu.ops.neighbors import knn_bruteforce, nn1_bruteforce


def estimate_normals(points: jax.Array, k: int = 16) -> jax.Array:
    """Per-point normals via kNN PCA (smallest covariance eigenvector)."""
    idx, _ = knn_bruteforce(points, points, k)
    nbrs = points[idx]                       # [N, k, 3]
    mean = nbrs.mean(axis=1, keepdims=True)
    centered = nbrs - mean
    cov = jnp.einsum("nki,nkj->nij", centered, centered) / k
    _, vecs = jnp.linalg.eigh(cov + 1e-9 * jnp.eye(3))
    n = vecs[:, :, 0]
    # orient towards origin (sensor) for stability
    sign = jnp.sign(jnp.sum(-points * n, axis=1, keepdims=True))
    return n * jnp.where(sign == 0, 1.0, sign)


def _se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """Small-motion SE(3) update from (rx, ry, rz, tx, ty, tz)."""
    rx, ry, rz = xi[0], xi[1], xi[2]
    R = jnp.array([[1, -rz, ry], [rz, 1, -rx], [-ry, rx, 1]])
    # re-orthogonalize via SVD for stability over iterations
    u, _, vt = jnp.linalg.svd(R)
    T = jnp.eye(4)
    T = T.at[:3, :3].set(u @ vt)
    T = T.at[:3, 3].set(xi[3:])
    return T


def icp_point_to_plane(source: np.ndarray, target: np.ndarray,
                       init: np.ndarray | None = None,
                       max_distance: float = 0.9,
                       max_iterations: int = 30,
                       target_normals: np.ndarray | None = None
                       ) -> np.ndarray:
    """Refine T such that T @ source aligns with target. Returns (4, 4)."""
    src = jnp.asarray(source[:, :3], jnp.float32)
    tgt = jnp.asarray(target[:, :3], jnp.float32)
    T = jnp.asarray(init if init is not None else np.eye(4), jnp.float32)
    normals = (jnp.asarray(target_normals, jnp.float32)
               if target_normals is not None else estimate_normals(tgt))

    for _ in range(max_iterations):
        moved = src @ T[:3, :3].T + T[:3, 3]
        idx, d2 = nn1_bruteforce(moved, tgt)
        w = (jnp.sqrt(d2) < max_distance).astype(jnp.float32)
        n = normals[idx]
        q = tgt[idx]
        r = jnp.sum((q - moved) * n, axis=1)          # residual along normal
        J = jnp.concatenate([jnp.cross(moved, n), n], axis=1)  # [N, 6]
        A = (J * w[:, None]).T @ J + 1e-6 * jnp.eye(6)
        b = (J * w[:, None]).T @ r
        xi = jnp.linalg.solve(A, b)
        T = _se3_exp(xi) @ T
        if float(jnp.linalg.norm(xi)) < 1e-7:
            break
    return np.asarray(T, np.float64)
