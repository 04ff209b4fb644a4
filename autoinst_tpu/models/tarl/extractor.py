"""TARL feature extractor: 96-d self-supervised point features per scan.

Equivalent of the reference extractor (Pointcloud-Models/tarl/
tarl_extractor.py:14-125, minkunet.py:82-192): a MinkUNet at 0.05m
quantization mapping (x, y, z, intensity) to 96-d per-point features,
dumped as zlib-compressed float32 in the pipeline's cache contract
(kitti_odometry_dataset.py:251-281).

Architecture parity with the reference MinkUNet: identical channel schedule
to the MaskPLS backbone but voxel-level output (no knn-up/sem head,
minkunet.py:166-199 returns y4) and plain-ReLU down/up blocks
(minkunet.py:18,36). Faithful input contract:

  * coordinates quantize by np.round (tarl_extractor.py:100-106), not the
    floor used by the MaskPLS TensorField path;
  * a voxel's input features are its REPRESENTATIVE point's raw
    (x, y, z, intensity) -- the first point mapped to the voxel -- matching
    ME.sparse_quantize(return_index=True), not an unweighted average;
  * per-point output = the point's own voxel's output features. (Deviation:
    the reference assigns non-representative points the feature of the
    globally nearest representative point, tarl_extractor.py:74-81; the own
    -voxel representative is that nearest point in all but boundary cases.)

The released tarl.pt converts via `load_torch_checkpoint` (tensor mapping in
models/maskpls/torch_convert.py::convert_tarl_state_dict).
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
        self.model = MinkUNet(voxel_output=True, updown_act="relu")
        self.variables = None
        if weights_path and os.path.exists(weights_path):
            self._load(weights_path)
        self._apply = jax.jit(
            lambda v, b: self.model.apply(v, b, train=False))

    def _load(self, path):
        from flax import serialization
        template = self._init_template()
        with open(path, "rb") as fh:
            self.variables = serialization.from_bytes(template, fh.read())

    def _init_template(self):
        rng = jax.random.PRNGKey(0)
        pts = np.random.default_rng(0).uniform(-5, 5, (512, 3))
        batch, _ = self._make_batch(pts, np.ones(512))
        return self.model.init(rng, batch, train=False)

    def load_torch_checkpoint(self, path_or_state):
        """Convert the released tarl.pt (checkpoint["model"]) into this
        model's variables."""
        from autoinst_tpu.models.maskpls.torch_convert import (
            convert_tarl_state_dict)
        if isinstance(path_or_state, (str, os.PathLike)):
            import torch
            ckpt = torch.load(path_or_state, map_location="cpu",
                              weights_only=False)
            state = ckpt.get("model", ckpt)
            state = {k: v.numpy() for k, v in state.items()}
        else:
            state = path_or_state
        template = self._init_template()
        self.variables = convert_tarl_state_dict(state, template)
        return self.variables

    def _make_batch(self, points: np.ndarray, intensity: np.ndarray):
        xyz = np.asarray(points[:, :3], np.float64)
        feats = np.concatenate([xyz, np.reshape(intensity, (-1, 1))], axis=1)
        # np.round quantization (tarl_extractor.py:102): voxel centers
        coords = np.round(xyz / self.res).astype(np.int64)
        plan = sparse.build_plan(coords, self.v0)
        batch = sparse.plans_to_batch([plan], [xyz.astype(np.float32)],
                                      [feats.astype(np.float32)], self.res,
                                      self.n_points)
        # representative-point voxel features (ME sparse_quantize picks the
        # first point of each voxel): scatter-min of point index per voxel
        v0 = batch["levels"][0]["nbr3"].shape[1]
        n = len(xyz)
        rep = np.full(v0, n, np.int64)
        np.minimum.at(rep, plan.point_voxel[:n], np.arange(n))
        feats_ext = np.concatenate(
            [feats, np.zeros((1, feats.shape[1]))], axis=0).astype(np.float32)
        vox_feats = feats_ext[np.minimum(rep, n)]
        batch = jax.tree.map(jnp.asarray, batch)
        batch["vox_feats"] = jnp.asarray(vox_feats)[None]
        return batch, plan

    def extract(self, points: np.ndarray, intensity: np.ndarray
                ) -> np.ndarray:
        """(N, 96) features for one scan: voxel output gathered per point."""
        if self.variables is None:
            self.variables = self._init_template()
        n = len(points)
        batch, plan = self._make_batch(points, intensity)
        vox_out = self._apply(self.variables, batch)   # [1, V0, 96]
        return np.asarray(vox_out[0])[plan.point_voxel[:n]].astype(np.float32)

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
