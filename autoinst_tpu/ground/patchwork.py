"""Concentric-zone ground segmentation (Patchwork++-equivalent), in JAX.

The reference calls the external pypatchworkpp C++ binding per scan
(reference: pipeline/utils/point_cloud/aggregate_pointcloud.py:94-115).
Here the same algorithm family -- Concentric Zone Model + Region-wise
Ground Plane Fitting with likelihood gating -- is expressed entirely as
segment reductions and one batched 3x3 eigendecomposition, so every bin of
every scan is fitted simultaneously on the VPU/MXU with zero Python loops:

  1. bin points into (zone, ring, sector) cells of a polar grid;
  2. seed per-bin candidates from the lowest-z points (R-GPF seeding);
  3. iterate: per-bin PCA plane via segment moments -> batched eigh ->
     re-select candidates within th_dist of the plane;
  4. gate each bin by plane uprightness, elevation, and flatness
     (the Patchwork++ GLE tests) -> per-point ground mask.

Static shapes: callers pad scans and pass a validity mask. The defaults are
the published Patchwork++ KITTI settings.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class GroundConfig:
    sensor_height: float = 1.723
    min_ranges: tuple = (2.7, 12.36, 22.6, 41.0)
    max_range: float = 80.0
    num_rings: tuple = (2, 4, 4, 4)
    num_sectors: tuple = (16, 32, 54, 32)
    th_seeds: float = 0.5          # seed band above per-bin lowest point
    th_dist: float = 0.125         # plane inlier distance
    num_iter: int = 3
    uprightness_thr: float = 0.707  # |normal_z| gate (cos 45 deg)
    elevation_thr: tuple = (0.523, 0.746, 0.879, 1.125)
    flatness_thr: tuple = (0.0005, 0.000725, 0.001, 0.001)

    @property
    def num_bins(self) -> int:
        return sum(r * s for r, s in zip(self.num_rings, self.num_sectors))


def _bin_ids(points: jax.Array, valid: jax.Array, cfg: GroundConfig):
    """Map each point to a CZM bin id; invalid/out-of-range -> junk bin."""
    x, y = points[:, 0], points[:, 1]
    r = jnp.sqrt(x * x + y * y)
    theta = jnp.arctan2(y, x) + jnp.pi  # [0, 2pi)

    bounds = list(cfg.min_ranges) + [cfg.max_range]
    bin_id = jnp.full(points.shape[0], cfg.num_bins, jnp.int32)
    offset = 0
    for z in range(len(cfg.min_ranges)):
        lo, hi = bounds[z], bounds[z + 1]
        nr, ns = cfg.num_rings[z], cfg.num_sectors[z]
        in_zone = (r >= lo) & (r < hi)
        ring = jnp.clip(((r - lo) / (hi - lo) * nr).astype(jnp.int32), 0, nr - 1)
        sector = jnp.clip((theta / (2 * jnp.pi) * ns).astype(jnp.int32),
                          0, ns - 1)
        zid = offset + ring * ns + sector
        bin_id = jnp.where(in_zone, zid, bin_id)
        offset += nr * ns
    return jnp.where(valid, bin_id, cfg.num_bins)


def _zone_of_bins(cfg: GroundConfig):
    """Static zone index for every bin id."""
    zones = []
    for z in range(len(cfg.min_ranges)):
        zones += [z] * (cfg.num_rings[z] * cfg.num_sectors[z])
    return jnp.array(zones + [0], jnp.int32)  # + junk bin


@partial(jax.jit, static_argnames=("cfg",))
def estimate_ground(points: jax.Array, valid: jax.Array,
                    cfg: GroundConfig = GroundConfig()):
    """Boolean per-point ground mask (padded points must have valid=False)."""
    nbins = cfg.num_bins + 1  # + junk
    bins = _bin_ids(points, valid, cfg)
    z = points[:, 2]

    # --- seeding: lowest point per bin + th_seeds band (R-GPF) ------------
    big = jnp.float32(1e9)
    zmin = jax.ops.segment_min(jnp.where(valid, z, big), bins,
                               num_segments=nbins)
    cand = valid & (z <= zmin[bins] + cfg.th_seeds) & (bins < cfg.num_bins)
    # reject gross under-ground outliers (reflections below the sensor plane)
    cand = cand & (z > -cfg.sensor_height - 1.0)

    normal = None
    mean = None
    eigvals = None
    for _ in range(cfg.num_iter):
        w = cand.astype(jnp.float32)
        cnt = jax.ops.segment_sum(w, bins, num_segments=nbins)
        s1 = jax.ops.segment_sum(points[:, :3] * w[:, None], bins,
                                 num_segments=nbins)
        mean = s1 / jnp.maximum(cnt, 1.0)[:, None]
        centered = (points[:, :3] - mean[bins]) * w[:, None]
        # second moments -> per-bin covariance (6 unique entries)
        outer = centered[:, :, None] * centered[:, None, :]
        s2 = jax.ops.segment_sum(outer.reshape(-1, 9), bins,
                                 num_segments=nbins)
        cov = s2.reshape(-1, 3, 3) / jnp.maximum(cnt, 1.0)[:, None, None]
        cov = cov + jnp.eye(3) * 1e-9
        eigvals, eigvecs = jnp.linalg.eigh(cov)  # ascending
        normal = eigvecs[:, :, 0]
        normal = normal * jnp.sign(normal[:, 2:3] + 1e-12)  # orient up
        # signed distance above plane
        dist = jnp.sum((points[:, :3] - mean[bins]) * normal[bins], axis=1)
        cand = valid & (bins < cfg.num_bins) & (dist < cfg.th_dist)

    # --- likelihood gating per bin (Patchwork++ GLE) -----------------------
    zone = _zone_of_bins(cfg)
    e_thr = jnp.array(cfg.elevation_thr, jnp.float32)[zone]
    f_thr = jnp.array(cfg.flatness_thr, jnp.float32)[zone]
    upright = normal[:, 2] > cfg.uprightness_thr
    elevation = mean[:, 2] + cfg.sensor_height  # height above nominal ground
    flatness = eigvals[:, 0] / jnp.maximum(jnp.sum(eigvals, axis=1), 1e-12)
    low_enough = elevation < e_thr
    flat_enough = flatness < f_thr
    bin_ground = upright & (low_enough | flat_enough)
    bin_ground = bin_ground.at[cfg.num_bins].set(False)

    return cand & bin_ground[bins]
