"""Ground segmentation accuracy on synthetic LiDAR-like scans."""

import numpy as np
import jax.numpy as jnp

from autoinst_tpu.ground import GroundConfig, estimate_ground


def synthetic_scan(seed=0, n_ground=6000, n_obj=1200, sensor_h=1.723,
                   slope=0.0):
    rng = np.random.default_rng(seed)
    ang = rng.uniform(0, 2 * np.pi, n_ground)
    rad = rng.uniform(3.0, 24.0, n_ground)
    gx, gy = rad * np.cos(ang), rad * np.sin(ang)
    gz = -sensor_h + slope * gx + rng.normal(scale=0.03, size=n_ground)
    ground = np.stack([gx, gy, gz], axis=1)

    objs = []
    for i in range(6):
        c = np.array([rng.uniform(4, 20) * np.cos(i),
                      rng.uniform(4, 20) * np.sin(i * 2.1),
                      -sensor_h + 0.9])
        objs.append(c + rng.uniform(-0.5, 0.5, size=(n_obj // 6, 3))
                    * np.array([1.8, 1.6, 1.6]))
    obj = np.concatenate(objs)
    pts = np.concatenate([ground, obj]).astype(np.float32)
    is_ground = np.zeros(len(pts), bool)
    is_ground[:n_ground] = True
    return pts, is_ground


def _pad(pts, to=16384):
    n = len(pts)
    out = np.zeros((to, 3), np.float32)
    out[:n] = pts
    valid = np.zeros(to, bool)
    valid[:n] = True
    return out, valid, n


class TestGround:
    def test_flat_ground_recovered(self):
        pts, gt = synthetic_scan(seed=0)
        pp, valid, n = _pad(pts)
        mask = np.asarray(estimate_ground(jnp.asarray(pp), jnp.asarray(valid)))[:n]
        recall = mask[gt].mean()
        precision = gt[mask].mean() if mask.any() else 0.0
        assert recall > 0.92, f"ground recall {recall}"
        assert precision > 0.95, f"ground precision {precision}"
        # objects must NOT be ground
        assert mask[~gt].mean() < 0.12

    def test_sloped_ground(self):
        pts, gt = synthetic_scan(seed=1, slope=0.03)
        pp, valid, n = _pad(pts)
        mask = np.asarray(estimate_ground(jnp.asarray(pp), jnp.asarray(valid)))[:n]
        assert mask[gt].mean() > 0.85

    def test_padding_inert(self):
        pts, gt = synthetic_scan(seed=2)
        pp, valid, n = _pad(pts)
        mask = np.asarray(estimate_ground(jnp.asarray(pp), jnp.asarray(valid)))
        assert not mask[n:].any()


class TestNativeGround:
    def test_native_matches_jax(self):
        from autoinst_tpu.hostops.ground_native import ground_segment_native
        pts, gt = synthetic_scan(seed=4)
        mask_native = ground_segment_native(pts)
        assert mask_native is not None, "C++ kernel must build here"
        assert mask_native[gt].mean() > 0.9
        assert gt[mask_native].mean() > 0.95

        pp, valid, n = _pad(pts)
        mask_jax = np.asarray(estimate_ground(jnp.asarray(pp),
                                              jnp.asarray(valid)))[:n]
        agree = (mask_native == mask_jax).mean()
        assert agree > 0.97, agree
