"""MaskPLS evaluation CLI: panoptic inference over chunks + PQ suite.

Equivalent of the reference evaluate_model.py (self-training/mask_pls/
scripts/evaluate_model.py:18-90) and testing.save_results
(utils/testing.py:6-31): runs the trained model on exported chunks, scores
PQ/SQ/RQ/IoU against the chunk GT labels, and optionally writes .label
predictions (lower 16 bits semantic, upper 16 instance -- the
SemanticKITTI submission layout).
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import jax
import jax.numpy as jnp

from autoinst_tpu.metrics.panoptic import PanopticEval
from autoinst_tpu.models.maskpls.model import (MaskPLSConfig, MaskPS,
                                               panoptic_inference)
from autoinst_tpu.models.maskpls.pseudo_dataset import (
    PseudoDataset, collate, dataset_level_widths)
from autoinst_tpu.models.maskpls.train import load_checkpoint, \
    create_train_state


def save_label_file(path: str, sem: np.ndarray, ins: np.ndarray):
    out = (ins.astype(np.uint32) << 16) | (sem.astype(np.uint32) & 0xFFFF)
    out.tofile(path)


def evaluate(data_path: str, ckpt: str, cfg: MaskPLSConfig = MaskPLSConfig(),
             v0: int = 65536, n_points: int = 81920, t_max: int = 40,
             results_dir: str | None = None, limit: int | None = None):
    dataset = PseudoDataset(data_path, min_points=100, subsample=False,
                            split="val")
    # accuracy comparisons against the reference must not be confounded by
    # the grid kNN-up approximation (docs/PARITY.md "kNN-up")
    print(f"knn_mode={cfg.knn_mode}"
          + (" (approximate; use exact for reference parity)"
             if cfg.knn_mode == "grid" else ""))
    model = MaskPS(cfg)
    # uniform static shapes across the run: one compiled forward
    # (XLA recompiles per shape set; see train.py / CLAUDE.md axon note)
    level_widths = dataset_level_widths(dataset, cfg.resolution, v0)
    item = dataset[0]
    batch, _ = collate([item], cfg.resolution, v0, n_points, t_max,
                       level_widths=level_widths)
    batch = jax.tree.map(jnp.asarray, batch)
    state = create_train_state(jax.random.PRNGKey(0), cfg, batch)
    state = load_checkpoint(ckpt, state)
    apply_fn = jax.jit(lambda v, b: model.apply(v, b, train=False))
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    evaluator = PanopticEval(cfg.num_classes + 1, ignore=[],
                             min_points=100)
    if results_dir:
        os.makedirs(results_dir, exist_ok=True)

    n_eval = min(limit or len(dataset), len(dataset))
    for i in range(n_eval):
        item = dataset[i]
        batch, _ = collate([item], cfg.resolution, v0, n_points, t_max,
                           level_widths=level_widths)
        batch = jax.tree.map(jnp.asarray, batch)
        outputs, pad, _ = apply_fn(variables, batch)
        n = len(item["xyz"])
        sem, ins, confs = panoptic_inference(
            np.asarray(outputs["pred_logits"][0]),
            np.asarray(outputs["pred_masks"][0]),
            np.asarray(~pad[0]), num_classes=cfg.num_classes,
            overlap_threshold=cfg.overlap_threshold)
        sem, ins = sem[:n], ins[:n]
        gt_ins = item["ins_labels"][:n]
        gt_sem = (gt_ins > 0).astype(np.int64)  # class-agnostic: object=1
        pred_sem = (ins > 0).astype(np.int64)
        evaluator.addBatch(pred_sem, ins, gt_sem, gt_ins)
        if results_dir:
            name = os.path.splitext(os.path.basename(item["fname"]))[0]
            save_label_file(os.path.join(results_dir, name + ".label"),
                            pred_sem, ins)

    pq, sq, rq, *_ = evaluator.getPQ()
    iou, _ = evaluator.getSemIoU()
    out = {"PQ": float(pq), "SQ": float(sq), "RQ": float(rq),
           "IoU": float(iou), "chunks": n_eval}
    print(out)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--results-dir", default=None)
    ap.add_argument("--limit", type=int, default=None)
    args = ap.parse_args()
    evaluate(args.data, args.ckpt, results_dir=args.results_dir,
             limit=args.limit)


if __name__ == "__main__":
    main()
