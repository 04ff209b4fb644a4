"""Visualization helpers: point-cloud-on-image overlays and label coloring.

Equivalent of the reference visualization_utils
(pipeline/utils/visualization_utils.py:36-184): project points into a
camera frame and paint them by depth or by a label map. Returns numpy RGB
images (no GUI dependencies).
"""

from __future__ import annotations

import numpy as np

from autoinst_tpu.pipeline.image_features import point_to_pixel_arrays
from autoinst_tpu.utils.colors import generate_random_colors_map


def _depth_colormap(depth: np.ndarray) -> np.ndarray:
    """Map depth to RGB via a cyclic hue ramp (cv2-free)."""
    t = np.clip(depth / max(float(depth.max()), 1e-6), 0, 1)
    # simple HSV->RGB with s=v=1
    h = t * 5.0
    i = np.floor(h).astype(int)
    f = h - i
    comp = np.stack([np.ones_like(f), 1 - f, f], axis=1)
    lut = {0: (0, 2, 1), 1: (1, 0, 2), 2: (2, 0, 1),
           3: (2, 1, 0), 4: (1, 2, 0), 5: (0, 2, 1)}
    rgb = np.zeros((len(t), 3))
    for key, (a, b, c) in lut.items():
        m = i == key
        rgb[m, 0] = comp[m, a]
        rgb[m, 1] = comp[m, b]
        rgb[m, 2] = comp[m, c]
    return (rgb * 255).astype(np.uint8)


def unite_pcd_and_img(points_cam: np.ndarray, K: np.ndarray,
                      image: np.ndarray, labels: np.ndarray | None = None,
                      coloring: str = "depth", radius: int = 2) -> np.ndarray:
    """Overlay projected points on an image (reference
    visualization_utils.py:36-100). coloring: "depth" or "labels"."""
    img = np.array(image).copy()
    h, w = img.shape[:2]
    idx, pix, depth = point_to_pixel_arrays(points_cam[:, :3], K, h, w)
    if coloring == "depth" or labels is None:
        colors = _depth_colormap(depth)
    else:
        palette = np.array(generate_random_colors_map(
            int(labels.max()) + 2))
        colors = palette[labels[idx] % len(palette)]
    for (px, py), col in zip(pix, colors):
        y0, y1 = max(py - radius, 0), min(py + radius + 1, h)
        x0, x1 = max(px - radius, 0), min(px + radius + 1, w)
        img[y0:y1, x0:x1] = col
    return img


def color_points_by_labels(points: np.ndarray, labels: np.ndarray,
                           seed: int = 0) -> np.ndarray:
    """RGB (0-1) per point from a deterministic palette; label 0 black."""
    palette = np.array(generate_random_colors_map(
        int(labels.max()) + 2, seed=seed)) / 255.0
    colors = palette[labels % len(palette)]
    colors[labels == 0] = 0.0
    return colors
