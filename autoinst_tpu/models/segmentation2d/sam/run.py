"""SAM mask-extraction CLI (reference 2D-VFMs/SAM/run.py surface): run the
automatic mask generator over an image folder and write the npz[masks]
caches the dataset layer reads (kitti_odometry_dataset.py:207-222).

    python -m autoinst_tpu.models.segmentation2d.sam.run \
        -i <images> -f png -o <out> -m sam_vit_h_4b8939.pth [--arch vit_h]

Skips images whose output npz already exists (reference adapter.py:59-62)
and sorts masks by area descending (adapter.py:37-39). Without -m, runs
randomly-initialized weights (pipeline smoke tests only).
"""

from __future__ import annotations

import glob
import os
from argparse import ArgumentParser

import numpy as np

from autoinst_tpu.models.segmentation2d.sam.amg import SamMaskGenerator
from autoinst_tpu.models.segmentation2d.sam.convert import \
    load_torch_checkpoint
from autoinst_tpu.models.segmentation2d.sam.model import (Sam, SamConfig,
                                                          vit_b_config,
                                                          vit_l_config)

ARCHS = {"vit_h": SamConfig, "vit_l": vit_l_config, "vit_b": vit_b_config}


def build_generator(model_path: str, arch: str = "vit_h",
                    **gen_kwargs) -> SamMaskGenerator:
    import jax
    cfg = ARCHS[arch]()
    model = Sam(cfg)
    example = np.zeros((1, cfg.img_size, cfg.img_size, 3), np.float32)
    pts = np.zeros((1, 2, 2), np.float32)
    lbl = np.array([[1, -1]], np.int32)
    s4 = cfg.grid * 4
    template = model.init(jax.random.PRNGKey(0), example, pts, lbl,
                          np.zeros((1, s4, s4, 1), np.float32))
    variables = (load_torch_checkpoint(model_path, template)
                 if model_path else template)
    return SamMaskGenerator(variables, cfg, **gen_kwargs)


def main():
    parser = ArgumentParser()
    parser.add_argument("-i", "--image_path", default="/input")
    parser.add_argument("-f", "--image_format", default="png")
    parser.add_argument("-o", "--output_path", default="/output")
    parser.add_argument("-m", "--model_path", default="",
                        help="released SAM .pth (empty = random init)")
    parser.add_argument("--arch", default="vit_h", choices=sorted(ARCHS))
    args = parser.parse_args()

    os.makedirs(args.output_path, exist_ok=True)
    generator = build_generator(args.model_path, args.arch)
    paths = sorted(glob.glob(
        os.path.join(args.image_path, f"*.{args.image_format}")))
    for path in paths:
        name = os.path.basename(path).split(".")[0] + ".npz"
        out = os.path.join(args.output_path, name)
        if os.path.exists(out):
            print(f"output sam file already exists, skipping {out}")
            continue
        from PIL import Image
        image = np.asarray(Image.open(path))
        masks = generator(image)
        print(f"{path}: {len(masks)} masks -> {out}")
        np.savez_compressed(out, masks=np.array(masks, dtype=object))


if __name__ == "__main__":
    main()
