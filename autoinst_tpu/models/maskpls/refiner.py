"""MaskPLS refiner inference for the pipeline (reference RefinerModel,
pipeline/utils/maskpls/predict_maskpls.py:21-181).

Loads a trained checkpoint (orbax/msgpack of this framework, or a converted
torch state dict), runs the class-agnostic MaskPS forward on 60k-point
chunks, assembles panoptic instances, colors + 1-NN-reprojects labels to the
full-resolution chunk, and tracks per-instance confidences keyed by the RGB
string contract used by the metrics stage (predict_maskpls.py:96-171)."""

from __future__ import annotations

import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from autoinst_tpu.models.maskpls import sparse
from autoinst_tpu.models.maskpls.model import (MaskPLSConfig, MaskPS,
                                               panoptic_inference)
from autoinst_tpu.utils.colors import generate_random_colors
from autoinst_tpu.utils.pointcloud import PointCloud


class RefinerModel:
    def __init__(self, dataset: str = "kitti", weights_path: str = "",
                 cfg: MaskPLSConfig = MaskPLSConfig(), v0: int = 65536,
                 n_points: int = 61440, level_widths: list | None = None,
                 bn_mode: str = "train"):
        """level_widths: optional fixed per-level voxel widths so every
        chunk shares one compiled forward executable (otherwise widths are
        data-dependent and each new occupancy pattern recompiles; on the
        axon transport, re-executing an older executable after a newer
        compile also crashes the worker -- see NOTES_ROUND1.md).

        bn_mode: "train" (default) runs the backbone's BatchNorms on the
        current chunk's statistics, matching the reference RefinerModel
        which deliberately leaves the backbone in .train() at inference
        (predict_maskpls.py:51); checkpoints trained at batch size 1 rely
        on per-chunk normalization, so "eval" (running averages) degrades
        them badly. No other layer is train-gated (the decoder has no
        dropout), so this toggles exactly the BN statistics source."""
        is_torch = weights_path.endswith((".ckpt", ".pt", ".pth"))
        if is_torch:
            # reference checkpoints were trained with exact KeOps kNN-up;
            # the grid approximation would confound parity evaluation
            # (docs/PARITY.md "kNN-up"), so converted weights default to
            # the exact path
            import dataclasses
            cfg = dataclasses.replace(cfg, knn_mode="exact")
        self.cfg = cfg
        self.v0 = v0
        self.n_points = n_points
        self.level_widths = level_widths
        self.model = MaskPS(cfg)
        self.confs_dict = {}
        self.variables = None
        if weights_path and os.path.exists(weights_path):
            self.variables = (self._load_torch(weights_path) if is_torch
                              else self._load_weights(weights_path))
        if bn_mode == "train":
            def fwd(v, b):
                out, _ = self.model.apply(v, b, train=True,
                                          mutable=["batch_stats"])
                return out
            self._apply = jax.jit(fwd)
        else:
            self._apply = jax.jit(
                lambda v, b: self.model.apply(v, b, train=False))

    def _load_weights(self, path: str):
        from flax import serialization
        with open(path, "rb") as fh:
            raw = fh.read()
        # template init to get the tree structure (the training CLI exports
        # {"params", "batch_stats"} via flax serialization)
        template = self._init_template()
        template = {"params": template["params"],
                    "batch_stats": template.get("batch_stats", {})}
        return serialization.from_bytes(template, raw)

    def _load_torch(self, path: str):
        """Released MaskPLS .ckpt (reference predict_maskpls.py:46-49):
        torch-load, strip the lightning 'model.' prefix, convert."""
        import torch
        from autoinst_tpu.models.maskpls.torch_convert import \
            convert_state_dict
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        state = ckpt.get("state_dict", ckpt)
        state = {(k[len("model."):] if k.startswith("model.") else k):
                 np.asarray(v) for k, v in state.items()}
        return convert_state_dict(state, self._init_template())

    def _init_template(self):
        rng = jax.random.PRNGKey(0)
        pts = np.random.default_rng(0).uniform(-5, 5, (256, 3))
        batch, _ = self._make_batch(pts)
        return self.model.init(rng, batch, train=False)

    def _make_batch(self, xyz: np.ndarray):
        coords = sparse.quantize_points(xyz, self.cfg.resolution)
        plan = sparse.build_plan(coords, self.v0,
                                 level_widths=self.level_widths)
        feats = np.concatenate([xyz, np.ones((len(xyz), 1))], 1)
        batch = sparse.plans_to_batch([plan], [xyz.astype(np.float32)],
                                      [feats.astype(np.float32)],
                                      self.cfg.resolution, self.n_points)
        return {k: (jnp.asarray(v) if not isinstance(v, list) else
                    [{kk: jnp.asarray(vv) for kk, vv in lv.items()}
                     for lv in v]) for k, v in batch.items()}, len(xyz)

    def _downsample(self, points: np.ndarray, target: int = 60000):
        # ceil stride (reference predict_maskpls.py:78 floors, but its torch
        # batch is dynamic; our batch is static at n_points, so the result
        # must actually fit or points would be silently truncated)
        every_k = max(-(-points.shape[0] // target), 1)
        return points[np.arange(0, len(points), every_k)]

    def forward_point_cloud(self, pcd_full: PointCloud):
        target = min(60000, self.n_points)
        minor = self._downsample(np.asarray(pcd_full.points), target)
        xyz = minor - minor.mean(axis=0)
        if self.variables is None:
            raise RuntimeError("RefinerModel has no weights loaded")
        batch, n = self._make_batch(xyz)
        (outputs, pad, _) = self._apply(self.variables, batch)
        sem, ins, confs = panoptic_inference(
            np.asarray(outputs["pred_logits"][0]),
            np.asarray(outputs["pred_masks"][0]),
            np.asarray(~pad[0]), num_classes=self.cfg.num_classes,
            overlap_threshold=self.cfg.overlap_threshold)
        return ins, PointCloud(minor), confs

    def color_pcd_by_labels(self, pcd_minor: PointCloud, labels, confs,
                            colors=None):
        """Color instances; the largest cluster is painted black (ground)
        and every color records its mean confidence
        (predict_maskpls.py:96-131)."""
        if colors is None:
            colors = generate_random_colors(2000)
        labels = np.asarray(labels)
        pcd_colors = np.zeros((len(pcd_minor), 3))
        unique_labels = list(np.unique(labels))
        sizes = {i: int((labels == i).sum()) for i in unique_labels}
        largest = max(sizes, key=sizes.get)
        for i in unique_labels:
            if i == -1:
                continue
            idcs = np.where(labels == i)[0]
            cur_conf = float(np.mean(confs[idcs]))
            if i == largest:
                pcd_colors[idcs] = 0.0
                self.confs_dict["0|0|0"] = cur_conf
            else:
                col = np.array(colors[unique_labels.index(i)])
                pcd_colors[idcs] = col
                self.confs_dict[f"{col[0]}|{col[1]}|{col[2]}"] = cur_conf
        return PointCloud(pcd_minor.points, pcd_colors / 255.0)

    def forward_and_project(self, pcd_full: PointCloud) -> PointCloud:
        from autoinst_tpu.pipeline.ncuts_chunk import kdtree_1nn_reprojection
        ins, pcd_minor, confs = self.forward_point_cloud(pcd_full)
        pcd_minor = self.color_pcd_by_labels(pcd_minor, ins, confs)
        colors = kdtree_1nn_reprojection(
            np.zeros((len(pcd_full), 3)), pcd_full,
            np.asarray(pcd_minor.colors), pcd_minor)
        pcd_full.colors = colors
        return pcd_full

    def label_to_conf(self, merge_ncuts: PointCloud, instance_preds):
        """Map merged instance labels back to confidences via the RGB string
        key contract (predict_maskpls.py:144-158)."""
        out = {}
        cols = np.asarray(merge_ncuts.colors)
        for label in np.unique(instance_preds):
            idcs = np.where(instance_preds == label)[0]
            c = cols[idcs[0]]
            key = f"{int(c[0] * 255)}|{int(c[1] * 255)}|{int(c[2] * 255)}"
            out[label] = self.confs_dict.get(key, 0.5)
        return out

    def store_conf_dict(self, folder, name, seq, cur_idx):
        with open(os.path.join(folder,
                               f"{name}{seq}_{cur_idx}_confs.json"),
                  "w") as fh:
            json.dump({k: float(v) for k, v in self.confs_dict.items()}, fh)

    def save_weights(self, path: str, variables=None):
        from flax import serialization
        with open(path, "wb") as fh:
            fh.write(serialization.to_bytes(variables or self.variables))
