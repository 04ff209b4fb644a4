"""2D mask-cache adapter: run a mask generator over a sequence's camera
frames and write SAM-compatible .npz[masks] caches.

Equivalent surface to the reference's dockerized SAM / SLIC adapters
(2D-VFMs/SAM/adapter.py:11-67, 2D-VFMs/SLIC/adapter.py:11-94). The
generator is pluggable: the built-in default is the self-contained SLIC
(no external checkpoints needed); a segment-anything-style callable
returning mask dicts drops in unchanged.
"""

from __future__ import annotations

import os

import numpy as np

from autoinst_tpu.models.segmentation2d.slic import (labels_to_masks,
                                                     slic_superpixels)


class MaskAdapter:
    def __init__(self, generator=None, n_segments: int = 100,
                 min_area: int = 50):
        self.min_area = min_area
        if generator is None:
            generator = lambda img: labels_to_masks(
                slic_superpixels(img, n_segments=n_segments),
                min_area=min_area)
        self.generator = generator

    def run_on_image(self, image: np.ndarray) -> list[dict]:
        return self.generator(np.asarray(image))

    def run_on_folder(self, dataset, cam: str, out_dir: str, indices=None):
        os.makedirs(out_dir, exist_ok=True)
        indices = indices if indices is not None else range(len(dataset))
        for i in indices:
            image = dataset.get_image(cam, i)
            if image is None:
                continue
            masks = self.run_on_image(np.asarray(image))
            np.savez(os.path.join(out_dir, f"{i:06d}.npz"),
                     masks=np.array(masks, dtype=object))
