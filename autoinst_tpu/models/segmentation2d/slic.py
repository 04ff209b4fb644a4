"""SLIC superpixels, self-contained numpy implementation.

Equivalent capability to the reference SLIC adapter (2D-VFMs/SLIC/
adapter.py:11-94, which wraps skimage.segmentation.slic): k-means over
(color * m/S, x/S, y/S) with localized assignment windows, producing
SAM-compatible mask dicts for the pipeline's vote term."""

from __future__ import annotations

import numpy as np


def slic_superpixels(image: np.ndarray, n_segments: int = 100,
                     compactness: float = 10.0, n_iter: int = 5
                     ) -> np.ndarray:
    """Label map [H, W] of ~n_segments superpixels."""
    img = np.asarray(image, np.float64)
    if img.max() > 1.5:
        img = img / 255.0
    H, W = img.shape[:2]
    S = max(int(np.sqrt(H * W / n_segments)), 1)

    ys = np.arange(S // 2, H, S)
    xs = np.arange(S // 2, W, S)
    cy, cx = np.meshgrid(ys, xs, indexing="ij")
    centers_xy = np.stack([cy.ravel(), cx.ravel()], axis=1).astype(np.float64)
    centers_col = img[cy.ravel(), cx.ravel()]
    k = len(centers_xy)

    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    labels = np.zeros((H, W), np.int64)
    dist = np.full((H, W), np.inf)
    ratio = (compactness / S) ** 2

    for _ in range(n_iter):
        dist[:] = np.inf
        for c in range(k):
            y0, x0 = centers_xy[c]
            ylo, yhi = max(int(y0) - S, 0), min(int(y0) + S + 1, H)
            xlo, xhi = max(int(x0) - S, 0), min(int(x0) + S + 1, W)
            patch = img[ylo:yhi, xlo:xhi]
            dc = np.sum((patch - centers_col[c]) ** 2, axis=-1)
            dy = yy[ylo:yhi, xlo:xhi] - y0
            dx = xx[ylo:yhi, xlo:xhi] - x0
            d = dc + ratio * (dy * dy + dx * dx)
            win = dist[ylo:yhi, xlo:xhi]
            better = d < win
            win[better] = d[better]
            labels[ylo:yhi, xlo:xhi][better] = c
        # update centers
        flat = labels.ravel()
        cnt = np.bincount(flat, minlength=k).astype(np.float64)
        cnt = np.maximum(cnt, 1)
        centers_xy[:, 0] = np.bincount(flat, weights=yy.ravel(),
                                       minlength=k) / cnt
        centers_xy[:, 1] = np.bincount(flat, weights=xx.ravel(),
                                       minlength=k) / cnt
        for ch in range(img.shape[2]):
            centers_col[:, ch] = np.bincount(
                flat, weights=img[:, :, ch].ravel(), minlength=k) / cnt

    return labels


def labels_to_masks(labels: np.ndarray, min_area: int = 0) -> list[dict]:
    """Label map -> SAM-style mask dicts sorted by area descending
    (the reference extractors' npz contract)."""
    masks = []
    for lab in np.unique(labels):
        seg = labels == lab
        area = int(seg.sum())
        if area < min_area:
            continue
        masks.append({"segmentation": seg, "area": area})
    masks.sort(key=lambda m: m["area"], reverse=True)
    return masks
