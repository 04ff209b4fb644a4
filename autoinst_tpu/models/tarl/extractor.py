"""TARL feature extractor: 96-d self-supervised point features per scan.

Equivalent of the reference extractor (Pointcloud-Models/tarl/
tarl_extractor.py:14-125, minkunet.py:82-192): a MinkUNet at 0.05m
quantization mapping (x, y, z, intensity) to 96-d per-point features,
dumped as zlib-compressed float32 in the pipeline's cache contract
(kitti_odometry_dataset.py:251-281).

Uses this framework's sparse gather-GEMM MinkUNet (models/maskpls/backbone)
whose finest level is already 96-d. Weights load/save via flax
serialization; the reference's torch checkpoint can be converted offline
with `convert_torch_state` once its tensors are exported to npz.
"""

from __future__ import annotations

import os
import zlib

import numpy as np
import jax
import jax.numpy as jnp

from autoinst_tpu.models.maskpls import sparse
from autoinst_tpu.models.maskpls.backbone import MinkUNet

TARL_DIM = 96


class TarlExtractor:
    def __init__(self, resolution: float = 0.05, v0: int = 131072,
                 n_points: int = 131072, weights_path: str = ""):
        self.res = resolution
        self.v0 = v0
        self.n_points = n_points
        self.model = MinkUNet()
        self.variables = None
        if weights_path and os.path.exists(weights_path):
            self._load(weights_path)
        self._apply = jax.jit(
            lambda v, b: self.model.apply(v, b, train=False)[0][-1])

    def _load(self, path):
        from flax import serialization
        template = self._init_template()
        with open(path, "rb") as fh:
            self.variables = serialization.from_bytes(template, fh.read())

    def _init_template(self):
        rng = jax.random.PRNGKey(0)
        pts = np.random.default_rng(0).uniform(-5, 5, (512, 3))
        batch = self._make_batch(pts, np.ones(512))
        return self.model.init(rng, batch, train=False)

    def _make_batch(self, points: np.ndarray, intensity: np.ndarray):
        xyz = np.asarray(points[:, :3], np.float64)
        feats = np.concatenate([xyz, intensity.reshape(-1, 1)], axis=1)
        coords = sparse.quantize_points(xyz, self.res)
        plan = sparse.build_plan(coords, self.v0)
        batch = sparse.plans_to_batch([plan], [xyz.astype(np.float32)],
                                      [feats.astype(np.float32)], self.res,
                                      self.n_points)
        batch = jax.tree.map(jnp.asarray, batch)
        # voxel features: UNWEIGHTED_AVERAGE over points
        v0 = batch["levels"][0]["nbr3"].shape[1]
        batch["vox_feats"] = jax.vmap(
            sparse.voxelize_features, in_axes=(0, 0, 0, None))(
            batch["pt_feats"], batch["point_voxel"], batch["pt_valid"],
            v0 + 1)[:, :v0]
        return batch

    def extract(self, points: np.ndarray, intensity: np.ndarray
                ) -> np.ndarray:
        """(N, 96) features for one scan."""
        if self.variables is None:
            rng = jax.random.PRNGKey(0)
            self.variables = self._init_template()
        n = len(points)
        batch = self._make_batch(points, intensity)
        feats = self._apply(self.variables, batch)
        return np.asarray(feats[0, :n], np.float32)

    def run_on_folder(self, dataset, out_dir: str, indices=None):
        """Write the per-scan zlib f32 cache files the pipeline reads."""
        os.makedirs(out_dir, exist_ok=True)
        indices = indices if indices is not None else range(len(dataset))
        for i in indices:
            pts = dataset.get_point_cloud(i)
            intensity = dataset.get_intensity(i)
            feats = self.extract(pts, intensity)
            with open(os.path.join(out_dir, f"{i:06d}.bin"), "wb") as fh:
                fh.write(zlib.compress(feats.astype(np.float32).tobytes()))

    def save_weights(self, path: str):
        from flax import serialization
        with open(path, "wb") as fh:
            fh.write(serialization.to_bytes(self.variables))
