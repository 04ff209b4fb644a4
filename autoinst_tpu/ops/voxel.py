"""Voxel-grid ops as sort + segment reductions (TPU-native Open3D replacement).

The reference leans on Open3D's C++ voxel_down_sample(_and_trace)
(reference: pipeline/dataset/dataset_utils.py:285-293, :534-535). On TPU the
same computation is a radix-sortable integer key per point plus segment means:
no trees, no hash maps, fully jit-able with static shapes.

Determinism note: Open3D's voxel hash map iterates in unspecified order; we
emit voxels in ascending linearized-key order, which is deterministic across
runs and platforms. Downstream consumers (label transfer, chunking) are
order-invariant, so this is a strict improvement.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def voxel_keys(points: jax.Array, voxel_size: float, min_bound: jax.Array,
               grid_shape: tuple[int, int, int]) -> jax.Array:
    """Linearized int32 voxel key per point.

    grid_shape must be a static upper bound on the grid extent; points
    outside are clamped into the boundary cells.
    """
    ijk = jnp.floor((points[:, :3] - min_bound) / voxel_size).astype(jnp.int32)
    dims = jnp.array(grid_shape, dtype=jnp.int32)
    ijk = jnp.clip(ijk, 0, dims - 1)
    return (ijk[:, 0] * grid_shape[1] + ijk[:, 1]) * grid_shape[2] + ijk[:, 2]


@partial(jax.jit, static_argnames=("max_voxels",))
def _downsample_from_keys(keys: jax.Array, points: jax.Array, valid: jax.Array,
                          max_voxels: int):
    n = keys.shape[0]
    big = jnp.iinfo(jnp.int32).max
    keys = jnp.where(valid, keys, big)
    order = jnp.argsort(keys)  # stable; invalid points sink to the end
    skeys = keys[order]
    spts = points[order]
    svalid = valid[order]

    is_new = jnp.concatenate([jnp.ones((1,), jnp.int32),
                              (skeys[1:] != skeys[:-1]).astype(jnp.int32)])
    is_new = is_new * svalid.astype(jnp.int32)
    seg = jnp.cumsum(is_new) - 1  # segment id in sorted order, -1 only possible at head
    seg = jnp.clip(seg, 0, max_voxels - 1)

    ones = svalid.astype(points.dtype)
    counts = jax.ops.segment_sum(ones, seg, num_segments=max_voxels)
    sums = jax.ops.segment_sum(spts * ones[:, None], seg, num_segments=max_voxels)
    centroids = sums / jnp.maximum(counts, 1.0)[:, None]
    voxel_valid = counts > 0

    # inverse map: original point index -> voxel slot
    inv_sorted = seg
    inverse = jnp.zeros((n,), jnp.int32).at[order].set(inv_sorted)
    num_voxels = jnp.sum(is_new)
    return centroids, counts, voxel_valid, inverse, num_voxels


def voxel_downsample(points: jax.Array, voxel_size: float, min_bound: jax.Array,
                     grid_shape: tuple[int, int, int], max_voxels: int,
                     valid: jax.Array | None = None):
    """Voxel-grid downsample to per-voxel centroids, with point->voxel trace.

    Returns (centroids [max_voxels,3], counts [max_voxels], voxel_valid
    [max_voxels] bool, inverse [N] int32 point->voxel slot, num_voxels).
    Matches Open3D's averaging semantics (dataset_utils.py:285-293) with
    deterministic ascending-key output order.
    """
    if valid is None:
        valid = jnp.ones((points.shape[0],), bool)
    keys = voxel_keys(points, voxel_size, min_bound, grid_shape)
    return _downsample_from_keys(keys, points[:, :3], valid, max_voxels)


def uniform_downsample_indices(n: int, target: int) -> jax.Array:
    """Every-k-th-point downsample indices, reference semantics.

    The reference keeps every k-th point with k = floor(n / target), k >= 1
    (point_cloud_utils.py:215-223,290-299). Returns the kept indices.
    """
    k = max(int(n / target), 1)
    return jnp.arange(0, n, k)
