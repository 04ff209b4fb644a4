#!/usr/bin/env python
"""Release-weight fingerprint check (VERDICT r2 #8): the one-command run
for the day real released checkpoints appear in the environment.

For a MaskPLS checkpoint (reference predict_maskpls.py:46-49 loads
mask_pls_*.ckpt) this converts the weights and runs the twin-verified
forward on a FIXED synthetic chunk under BOTH MinkowskiEngine
kernel-region-order hypotheses -- the one assumption the offline torch
twins cannot settle (tests/torch_twin_mink.py:23-26). A correctly ordered
conversion produces coherent panoptic output (most points assigned, a
plausible instance count); the scrambled order degrades to noise (the
twins' scrambled-permutation negative control diverges immediately). If
"last-fastest" wins, flip the default in
models/maskpls/torch_convert.set_me_region_order.

For a SAM .pth (reference 2D-VFMs/SAM/adapter.py:30-38) it converts and
runs the encoder + one point-prompt decode on fixed inputs and prints
output fingerprints; the converter itself already validates every tensor
name/shape against the Flax template (convert.py::_check_tree), so a
successful run with sane IoU predictions (in [0, 1], not saturated) is
the pass signal.

Usage:
  python scripts/fingerprint_weights.py --maskpls /path/mask_pls_f1.ckpt
  python scripts/fingerprint_weights.py --sam /path/sam_vit_h.pth [--sam-variant h|l|b]

Always prints the checkpoint sha256 so results are pinned to an artifact.
"""

import argparse
import hashlib
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def log(*a):
    print(*a, flush=True)


def sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as fh:
        for block in iter(lambda: fh.read(1 << 20), b""):
            h.update(block)
    return h.hexdigest()


def fixed_chunk(n: int = 6000, n_inst: int = 8, seed: int = 0):
    """Deterministic blob scene, the forward input every run shares."""
    rng = np.random.default_rng(seed)
    pts = []
    for i in range(n_inst):
        c = rng.uniform(-10, 10, 3) * np.array([1, 1, 0.1])
        pts.append(c + rng.normal(scale=0.8, size=(n // n_inst, 3)))
    return np.concatenate(pts)[:n].astype(np.float32)


def maskpls_fingerprint(path: str, order: str) -> dict:
    import jax
    jax.config.update("jax_platforms", "cpu")
    from autoinst_tpu.models.maskpls import torch_convert
    from autoinst_tpu.models.maskpls.model import MaskPLSConfig
    from autoinst_tpu.models.maskpls.refiner import RefinerModel

    from autoinst_tpu.utils.pointcloud import PointCloud

    torch_convert.set_me_region_order(order)
    try:
        model = RefinerModel(weights_path=path,
                             cfg=MaskPLSConfig(),
                             v0=16384, n_points=8192)
        ins, pcd_minor, confs = model.forward_point_cloud(
            PointCloud(fixed_chunk()))
        ins = np.asarray(ins)
        confs = np.asarray(confs)
        assigned = float(np.mean(ins > 0))
        return {
            "region_order": order,
            "n_instances": int(len(np.unique(ins[ins > 0]))),
            "frac_points_assigned": round(assigned, 4),
            "mean_confidence": round(float(confs.mean()), 4),
            "ins_histogram": {int(k): int(v) for k, v in
                              zip(*np.unique(ins, return_counts=True))},
        }
    finally:
        torch_convert.set_me_region_order("first-fastest")


def run_maskpls(path: str):
    log(f"checkpoint: {path}")
    log(f"sha256:     {sha256(path)}")
    results = [maskpls_fingerprint(path, o)
               for o in ("first-fastest", "last-fastest")]
    for r in results:
        log(json.dumps(r))
    a, b = results
    winner = max(results, key=lambda r: r["frac_points_assigned"])
    log(f"VERDICT: region order {winner['region_order']!r} produces the "
        f"coherent forward ({winner['frac_points_assigned']:.0%} of points "
        f"assigned vs "
        f"{min(a['frac_points_assigned'], b['frac_points_assigned']):.0%}).")
    if winner["region_order"] != "first-fastest":
        log("ACTION: flip the default in "
            "models/maskpls/torch_convert.set_me_region_order and "
            "tests/torch_twin_mink.py (see docs/PARITY.md).")
    else:
        log("The converter default (first-fastest) stands; record this "
            "output in docs/PARITY.md.")


def run_sam(path: str, variant: str):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from autoinst_tpu.models.segmentation2d.sam.convert import \
        load_torch_checkpoint
    from autoinst_tpu.models.segmentation2d.sam.model import (
        Sam, SamConfig, vit_b_config, vit_l_config)

    log(f"checkpoint: {path}")
    log(f"sha256:     {sha256(path)}")
    cfg = {"h": SamConfig, "l": vit_l_config, "b": vit_b_config}[variant]()
    model = Sam(cfg)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (1, cfg.img_size, cfg.img_size, 3)),
                      jnp.float32)
    template = model.init(jax.random.PRNGKey(0), img,
                          jnp.zeros((1, 1, 2)), jnp.zeros((1, 1), jnp.int32))
    variables = load_torch_checkpoint(path, template)
    # name/shape manifest is enforced inside the converter (_check_tree);
    # reaching this line means every tensor mapped
    pts = jnp.asarray([[[cfg.img_size / 2, cfg.img_size / 2]]])
    lbl = jnp.ones((1, 1), jnp.int32)
    masks, iou = model.apply(variables, img, pts, lbl)
    masks, iou = np.asarray(masks), np.asarray(iou)
    log(json.dumps({
        "variant": variant,
        "mask_shape": list(masks.shape),
        "mask_mean": round(float(masks.mean()), 6),
        "mask_std": round(float(masks.std()), 6),
        "iou_pred": [round(float(v), 4) for v in iou.ravel()],
    }))
    ok = bool(np.isfinite(masks).all()
              and (0.0 <= iou).all() and (iou <= 1.0).all())
    if ok:
        log("VERDICT: converted forward is finite with in-range IoU "
            "predictions -- record in docs/PARITY.md")
    else:
        log("VERDICT: SUSPECT output -- check the converter mapping")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--maskpls", default="", help="MaskPLS .ckpt/.pt path")
    ap.add_argument("--sam", default="", help="SAM .pth path")
    ap.add_argument("--sam-variant", default="h", choices=["h", "l", "b"])
    args = ap.parse_args()
    if not args.maskpls and not args.sam:
        ap.error("pass --maskpls and/or --sam")
    if args.maskpls:
        run_maskpls(args.maskpls)
    if args.sam:
        run_sam(args.sam, args.sam_variant)


if __name__ == "__main__":
    main()
