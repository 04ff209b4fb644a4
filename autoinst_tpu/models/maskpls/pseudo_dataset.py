"""Pseudo-label chunk dataset + static-shape batch collation for MaskPLS.

Numpy port of the reference PseudoSemanticDataset
(self-training/mask_pls/datasets/pseudo_dataset.py:100-352): walks npz chunk
folders (the GEN_SELF_TRAIN_DATA export schema), centers coordinates, builds
per-instance binary masks (> min_points), class-agnostic classes (all 0),
optional augmentation (rotation/flip/scale/jitter) and 80k subsampling.

Collation pads everything to static shapes and builds the sparse-conv
VoxelPlan per sample (TPU input contract)."""

from __future__ import annotations

import os

import numpy as np

from autoinst_tpu.models.maskpls import sparse


class PseudoDataset:
    def __init__(self, data_path: str, min_points: int = 100,
                 sub_pts: int = 80000, subsample: bool = True,
                 aug: bool = False, split: str = "train", seed: int = 0):
        # accept either the export root (sequence subdirectories of .npz
        # chunks, the GEN_SELF_TRAIN_DATA layout) or a leaf directory of
        # .npz files directly (round-3 chain regression: passing train/0
        # instead of train/ found zero chunks and crashed the trainer)
        self.files = [os.path.join(data_path, fn)
                      for fn in sorted(os.listdir(data_path))
                      if fn.endswith(".npz")]
        for folder in sorted(os.listdir(data_path)):
            sub = os.path.join(data_path, folder)
            if not os.path.isdir(sub):
                continue
            for fn in sorted(os.listdir(sub)):
                if fn.endswith(".npz"):
                    self.files.append(os.path.join(sub, fn))
        self.min_points = min_points
        self.sub_pts = sub_pts
        self.subsample = subsample
        self.aug = aug
        self.split = split
        self.rng = np.random.default_rng(seed)
        self.things_ids = [0]

    def __len__(self):
        return len(self.files)

    def __getitem__(self, index: int):
        with np.load(self.files[index]) as data:
            xyz = data["pts"].astype(np.float64)
            ins_labels = data["ncut_labels"].astype(np.int32)
        xyz = xyz - xyz.mean(axis=0)

        if self.split == "train" and self.subsample \
                and len(xyz) > self.sub_pts:
            idx = self.rng.choice(len(xyz), self.sub_pts, replace=False)
            xyz, ins_labels = xyz[idx], ins_labels[idx]

        if self.split == "train" and self.aug:
            xyz = self._augment(xyz)

        ids, counts = np.unique(ins_labels, return_counts=True)
        keep = ids[counts > self.min_points]
        masks = np.stack([(ins_labels == i) for i in keep]) if len(keep) \
            else np.zeros((0, len(xyz)), bool)
        classes = np.zeros(len(keep), np.int32)  # class-agnostic

        feats = np.concatenate([xyz, np.ones((len(xyz), 1))], axis=1)
        return {"xyz": xyz, "feats": feats, "masks": masks,
                "classes": classes, "ins_labels": ins_labels,
                "fname": self.files[index]}

    def _augment(self, xyz, rng=None):
        # reference pseudo_dataset.py:319-352: rot around z, flip, scale,
        # jitter
        rng = rng if rng is not None else self.rng
        rot = np.deg2rad(rng.random() * 360)
        c, s = np.cos(rot), np.sin(rot)
        xyz[:, :2] = xyz[:, :2] @ np.array([[c, s], [-s, c]])
        flip = rng.integers(0, 4)
        if flip == 1:
            xyz[:, 0] = -xyz[:, 0]
        elif flip == 2:
            xyz[:, 1] = -xyz[:, 1]
        elif flip == 3:
            xyz[:, :2] = -xyz[:, :2]
        xyz *= rng.uniform(0.95, 1.05)
        xyz += rng.normal(scale=0.01, size=xyz.shape)
        return xyz


def collate(items: list, res: float, v0: int, n_points: int, t_max: int,
            level_widths: list | None = None):
    """Static-shape batch: (model_batch, targets).

    level_widths (optional): uniform per-level voxel widths (see
    dataset_level_widths) so every batch of a training run shares one
    compiled executable."""
    plans, pts_list, feats_list = [], [], []
    for it in items:
        coords = sparse.quantize_points(it["xyz"], res)
        plans.append(sparse.build_plan(coords, v0,
                                       level_widths=level_widths))
        pts_list.append(it["xyz"].astype(np.float32))
        feats_list.append(it["feats"].astype(np.float32))
    batch = sparse.plans_to_batch(plans, pts_list, feats_list, res, n_points)

    b = len(items)
    classes = np.zeros((b, t_max), np.int32)
    masks = np.zeros((b, t_max, n_points), np.float32)
    valid = np.zeros((b, t_max), bool)
    for i, it in enumerate(items):
        t = min(len(it["classes"]), t_max)
        classes[i, :t] = it["classes"][:t]
        n = min(it["masks"].shape[1], n_points)
        masks[i, :t, :n] = it["masks"][:t, :n]
        valid[i, :t] = True
    targets = {"classes": classes, "masks": masks, "valid": valid,
               "point_valid": batch["pt_valid"]}
    if all("sem_labels" in it for it in items):
        sem = np.zeros((b, n_points), np.int32)
        for i, it in enumerate(items):
            n = min(len(it["sem_labels"]), n_points)
            sem[i, :n] = it["sem_labels"][:n]
        targets["sem_labels"] = sem
    return batch, targets


def dataset_level_widths(dataset: PseudoDataset, res: float, v0: int,
                         num_levels: int = 5, margin: float = 0.05,
                         margin_abs: int = 64, sub_pts: int | None = None,
                         n_draws: int = 2) -> list:
    """Uniform static level widths covering every chunk in the dataset.

    One pass of cheap unique-coordinate counting (no neighbor maps); the
    result makes collate() produce identical padded shapes for all chunks,
    so the jitted train step compiles exactly once per run (the axon
    transport bug makes a mid-run second compile a crash risk, CLAUDE.md).

    sub_pts: when the training run subsamples chunks (PseudoDataset
    sub_pts), pass it so widths measure SUBSAMPLED occupancy -- counting
    the full 100k+-point chunk would pad every level ~(full/sub)x too
    wide and multiply the train-step cost accordingly. Occupancy is
    counted on n_draws fixed-seed subsample draws (hypergeometric
    occupancy concentrates tightly across draws).

    The safety margin (relative + absolute) covers draw variation,
    subsample-induced origin parity shifts at coarse levels, and
    augmentation (rot/flip/scale/jitter), so a training epoch never
    exceeds a width and triggers a second shape set.
    """
    max_counts = [0] * num_levels
    rng = np.random.default_rng(12345)
    for i, f in enumerate(dataset.files):
        if hasattr(dataset, "full_xyz"):
            xyz = dataset.full_xyz(i)   # un-subsampled item coordinates
        else:
            with np.load(f) as data:
                xyz = data["pts"].astype(np.float64)
            xyz = xyz - xyz.mean(axis=0)
        draws = [xyz]
        if sub_pts is not None and len(xyz) > sub_pts:
            draws = [xyz[rng.choice(len(xyz), sub_pts, replace=False)]
                     for _ in range(n_draws)]
        if getattr(dataset, "aug", False):
            # rotation/scale change occupancy; measure actual augmented
            # draws instead of trusting the margin alone
            draws = draws + [dataset._augment(d.copy(), rng=rng)
                             for d in draws]
        for d in draws:
            q = sparse.quantize_points(d, res)
            for lvl, c in enumerate(
                    sparse.plan_level_counts(q, num_levels)):
                max_counts[lvl] = max(max_counts[lvl], c)
    padded = [int(c * (1.0 + margin)) + margin_abs for c in max_counts]
    return [sparse.level_budget(v0 >> lvl, c)
            for lvl, c in enumerate(padded)]
