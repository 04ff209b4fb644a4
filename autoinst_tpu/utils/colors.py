"""Deterministic random instance colors + label coloring.

The metric stack identifies instances by np.unique over float RGB rows
(run_pipeline.py:216-218), so color assignment must be deterministic: same
seeded python-random draw sequence and same set-accumulation semantics as
the reference (visualization_utils.py:13-33). CPython's tuple-hash set
iteration order is deterministic for a fixed insertion sequence, so these
reproduce the reference's exact palettes on the same Python version.
"""

from __future__ import annotations

import random

import numpy as np

from autoinst_tpu.utils.pointcloud import PointCloud


def generate_random_colors_map(n: int, seed: int = 0) -> list:
    random.seed(seed)
    colors = set()
    while len(colors) < n:
        col = (random.randint(0, 255), random.randint(0, 255),
               random.randint(0, 255))
        if col != (0, 0, 0) and col not in list(colors):
            colors.add(col)
    return list(colors)


def generate_random_colors(n: int, seed: int = 0) -> list:
    # NOTE: unlike the _map variant the reference does NOT reseed here
    # (visualization_utils.py:25-33); in the pipeline it is always called
    # after something that seeded the global RNG. We keep an optional seed
    # but default to reproducing the reference call pattern.
    colors = set()
    while len(colors) < n:
        col = (random.randint(0, 255), random.randint(0, 255),
               random.randint(0, 255))
        if col != (0, 0, 0):
            colors.add(col)
    return list(colors)


def color_pcd_by_labels(pcd: PointCloud, labels: np.ndarray, colors=None,
                        gt_labels=None, semantics: bool = False) -> PointCloud:
    """Color instance/semantic id arrays into RGB (dataset_utils.py:49-71).

    The color index of label i is its position among the unique labels of
    `gt_labels` (global palette), not of the local chunk."""
    labels = np.asarray(labels).reshape(-1)
    out = pcd.copy()
    pcd_colors = np.zeros((len(pcd), 3))
    base = labels if gt_labels is None else np.asarray(gt_labels)
    unique_labels = list(np.unique(base))
    for i in unique_labels:
        if i == -1:
            continue
        idcs = np.where(labels == i)[0]
        if i == 0 and not semantics:
            pcd_colors[idcs] = np.zeros(3)
        else:
            pcd_colors[idcs] = np.array(colors[unique_labels.index(i)])
    out.colors = pcd_colors / 255.0
    return out
