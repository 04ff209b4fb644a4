"""Rigid-body pose math and LiDAR-specific geometric corrections.

TPU-first equivalents of the reference's Open3D-backed transforms
(reference: pipeline/utils/point_cloud/point_cloud_utils.py:24-35,128-141)
and the HDL-64 per-point calibration correction
(reference: pipeline/dataset/kitti_odometry_dataset.py:305-335).

Everything here is pure jax.numpy, shape-static, and jit-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# The HDL-64 intrinsic vertical-angle miscalibration, in radians.
# 0.205 degrees, the accepted correction for KITTI's scanner.
_HDL64_THETA = 0.205 * jnp.pi / 180.0


def make_transform(rotation: jax.Array, translation: jax.Array) -> jax.Array:
    """Build a (4, 4) homogeneous transform from (3, 3) R and (3,) t."""
    T = jnp.eye(4, dtype=rotation.dtype)
    T = T.at[:3, :3].set(rotation)
    T = T.at[:3, 3].set(translation)
    return T


def transform_points(points: jax.Array, T: jax.Array) -> jax.Array:
    """Apply a (4, 4) homogeneous transform to (N, 3) points.

    One (N,3)x(3,3) matmul plus a broadcast add -- MXU-friendly, unlike the
    reference's per-pcd Open3D `transform` (point_cloud_utils.py:24-35).
    """
    return points[:, :3] @ T[:3, :3].T + T[:3, 3]


def invert_transform(T: jax.Array) -> jax.Array:
    """Invert a rigid homogeneous transform without a general solve."""
    R = T[:3, :3]
    t = T[:3, 3]
    Ti = jnp.eye(4, dtype=T.dtype)
    Ti = Ti.at[:3, :3].set(R.T)
    Ti = Ti.at[:3, 3].set(-R.T @ t)
    return Ti


def correct_kitti_scan_calibration(points: jax.Array) -> jax.Array:
    """Rotate every point by 0.205 deg about axis = (point x z_hat).

    Equivalent behavior to the reference's per-point Rodrigues construction
    (kitti_odometry_dataset.py:305-335), but expressed directly with the
    Rodrigues rotation formula on vectors -- no (N,3,3) matrix materialization,
    so it stays bandwidth-light on TPU:

        v' = v cos(t) + (k x v) sin(t) + k (k.v) (1 - cos(t))

    with k = normalize(v x z_hat).
    """
    xyz = points[:, :3]
    z_hat = jnp.array([0.0, 0.0, 1.0], dtype=xyz.dtype)
    axes = jnp.cross(xyz, jnp.broadcast_to(z_hat, xyz.shape))
    norm = jnp.linalg.norm(axes, axis=1, keepdims=True)
    k = axes / norm  # points along +-z give nan, matching reference behavior
    c = jnp.cos(_HDL64_THETA).astype(xyz.dtype)
    s = jnp.sin(_HDL64_THETA).astype(xyz.dtype)
    k_cross_v = jnp.cross(k, xyz)
    k_dot_v = jnp.sum(k * xyz, axis=1, keepdims=True)
    return xyz * c + k_cross_v * s + k * k_dot_v * (1.0 - c)


def range_mask(points: jax.Array, min_range: float, max_range: float) -> jax.Array:
    """Boolean mask of points whose distance from the origin is in [min, max].

    Mirrors the reference RangeFilter (dataset/filters/range_filter.py:10).
    """
    norm = jnp.linalg.norm(points[:, :3], axis=1)
    return (norm >= min_range) & (norm <= max_range)


def points_in_aabb(points: jax.Array, min_bound: jax.Array, max_bound: jax.Array,
                   strict: bool = True) -> jax.Array:
    """Mask of points strictly inside an axis-aligned box.

    The reference chunk cropping uses strict inequalities
    (chunk_generation.py:134-137); `strict=False` gives closed bounds.
    """
    if strict:
        return jnp.all(points > min_bound, axis=1) & jnp.all(points < max_bound, axis=1)
    return jnp.all(points >= min_bound, axis=1) & jnp.all(points <= max_bound, axis=1)
