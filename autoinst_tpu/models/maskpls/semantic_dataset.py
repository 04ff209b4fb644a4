"""Supervised SemanticKITTI scan dataset for MaskPLS evaluation/training.

Equivalent of the reference SemanticDataset / MaskSemanticDataset
(self-training/mask_pls/datasets/semantic_dataset.py:115-390): walks the
standard velodyne/labels split layout, decodes panoptic labels, applies the
learning map, crops to the coordinate space, builds per-instance masks with
stuff/things separation, optional subsampling and augmentation. Emits the
same item dict as PseudoDataset so the shared collate() feeds the model.
"""

from __future__ import annotations

import os

import numpy as np

from autoinst_tpu.datasets.semantic_kitti import apply_learning_map

SPLITS = {
    "train": (0, 1, 2, 3, 4, 5, 6, 7, 9, 10),
    "valid": (8,),
    "test": (11, 12, 13, 14, 15, 16, 17, 18, 19, 20, 21),
}
THINGS_IDS = (1, 2, 3, 4, 5, 6, 7, 8)  # car..motorcyclist (train ids)
DEFAULT_SPACE = ((-48.0, 48.0), (-48.0, 48.0), (-4.0, 1.5))


class SemanticKittiScanDataset:
    def __init__(self, data_path: str, split: str = "train",
                 min_points: int = 100, space=DEFAULT_SPACE,
                 sub_pts: int = 80000, subsample: bool = False,
                 aug: bool = False, seed: int = 0):
        self.split = split
        self.min_points = min_points
        self.space = space
        self.sub_pts = sub_pts
        self.subsample = subsample
        self.aug = aug
        self.rng = np.random.default_rng(seed)
        self.things_ids = list(THINGS_IDS)
        self.files = []
        for seq in SPLITS[split]:
            velo = os.path.join(data_path, "sequences", f"{seq:02d}",
                                "velodyne")
            if not os.path.isdir(velo):
                continue
            for fn in sorted(os.listdir(velo)):
                if fn.endswith(".bin"):
                    self.files.append((seq, os.path.join(velo, fn)))

    def __len__(self):
        return len(self.files)

    def full_xyz(self, index: int) -> np.ndarray:
        """Un-subsampled item coordinates (for dataset_level_widths)."""
        _, path = self.files[index]
        xyz = np.fromfile(path, np.float32).reshape(-1, 4)[:, :3] \
            .astype(np.float64)
        keep = np.ones(len(xyz), bool)
        for d, (lo, hi) in enumerate(self.space):
            keep &= (xyz[:, d] >= lo) & (xyz[:, d] <= hi)
        return xyz[keep]

    def _labels(self, seq: int, scan_path: str):
        label_path = scan_path.replace("velodyne", "labels").replace(
            ".bin", ".label")
        if not os.path.exists(label_path):
            return None, None
        raw = np.fromfile(label_path, np.uint32)
        sem = apply_learning_map(raw & 0xFFFF)
        inst = (raw >> 16).astype(np.int64)
        return sem, inst

    def __getitem__(self, index: int):
        seq, path = self.files[index]
        scan = np.fromfile(path, np.float32).reshape(-1, 4)
        xyz = scan[:, :3].astype(np.float64)
        intensity = scan[:, 3].astype(np.float64)
        sem, inst = self._labels(seq, path)
        if sem is None:
            sem = np.zeros(len(xyz), np.int64)
            inst = np.zeros(len(xyz), np.int64)

        # crop to the model's coordinate space (semantic_dataset.py space)
        keep = np.ones(len(xyz), bool)
        for d, (lo, hi) in enumerate(self.space):
            keep &= (xyz[:, d] >= lo) & (xyz[:, d] <= hi)
        xyz, intensity, sem, inst = (xyz[keep], intensity[keep], sem[keep],
                                     inst[keep])

        if self.split == "train" and self.subsample \
                and len(xyz) > self.sub_pts:
            idx = self.rng.choice(len(xyz), self.sub_pts, replace=False)
            xyz, intensity, sem, inst = (xyz[idx], intensity[idx], sem[idx],
                                         inst[idx])

        # instance masks: things keyed by (semantic, instance), stuff by
        # semantic class (semantic_dataset.py:246-320)
        masks, classes = [], []
        stuff = np.array([0 if s in self.things_ids else s for s in sem])
        for cls in np.unique(stuff):
            if cls == 0:
                continue
            m = stuff == cls
            if m.sum() > self.min_points:
                masks.append(m)
                classes.append(cls)
        thing_key = sem * (1 << 32) + inst
        thing_key[~np.isin(sem, self.things_ids)] = 0
        for key in np.unique(thing_key):
            if key == 0:
                continue
            m = thing_key == key
            if m.sum() > self.min_points:
                masks.append(m)
                classes.append(key >> 32)

        masks = np.stack(masks) if masks else np.zeros((0, len(xyz)), bool)
        feats = np.concatenate([xyz, intensity[:, None]], axis=1)
        return {"xyz": xyz, "feats": feats, "masks": masks,
                "classes": np.asarray(classes, np.int32),
                "ins_labels": inst.astype(np.int32),
                "sem_labels": sem.astype(np.int32),
                "fname": path}
