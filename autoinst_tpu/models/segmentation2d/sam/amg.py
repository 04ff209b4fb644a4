"""SAM automatic mask generation (the reference's only SAM entry point:
`SamAutomaticMaskGenerator(sam).generate(image)`, 2D-VFMs/SAM/adapter.py:
30-43) rebuilt TPU-first.

Faithful pipeline (defaults of the published generator, which the
reference constructs bare):

  1. 32x32 grid of point prompts over the image, in [0,1]^2 at
     (i + 0.5) / n, scaled to original pixels then to the 1024-long-side
     frame.
  2. Batches of points through the mask decoder, 3 multimask outputs per
     point, logits upscaled 256 -> 1024 (bilinear) -> crop the padded
     region -> resize to the original image.
  3. Filter by predicted IoU (0.88) and stability score (>= 0.95,
     stability = |logits > +1| / |logits > -1|).
  4. Greedy box-NMS (IoU 0.7) scored by predicted IoU.
  5. Mask dicts {segmentation, bbox XYWH, area, predicted_iou,
     stability_score}, area-sorted (the npz[masks] cache contract).

TPU mapping: the heavy ViT encode runs once per image; each point batch
is ONE jitted call that also computes, on device, everything the filters
need (IoU, stability, boxes, areas) plus the thresholded masks bit-packed
to uint8 -- the host only unpacks survivors, so the device->host traffic
is H*W/8 bytes per candidate instead of 4*H*W. Crop layers
(crop_n_layers > 0) are not implemented: the reference runs the default
generator, which never crops.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from autoinst_tpu.models.segmentation2d.sam.model import Sam, SamConfig


def preprocess_image(image: np.ndarray, img_size: int,
                     mean=(123.675, 116.28, 103.53),
                     std=(58.395, 57.12, 57.375)):
    """uint8 RGB [H, W, 3] -> (normalized [1, img_size, img_size, 3],
    (scaled_h, scaled_w)). Longest side to img_size, pad bottom-right."""
    h, w = image.shape[:2]
    scale = img_size / max(h, w)
    nh, nw = int(h * scale + 0.5), int(w * scale + 0.5)
    scaled = jax.image.resize(jnp.asarray(image, jnp.float32),
                              (nh, nw, 3), method="bilinear")
    scaled = (scaled - jnp.asarray(mean)) / jnp.asarray(std)
    out = jnp.zeros((img_size, img_size, 3), jnp.float32)
    out = out.at[:nh, :nw].set(scaled)
    return out[None], (nh, nw)


def build_point_grid(per_side: int) -> np.ndarray:
    """[n*n, 2] (x, y) in [0, 1]^2 at cell centers."""
    offset = 1.0 / (2 * per_side)
    line = np.linspace(offset, 1.0 - offset, per_side)
    xs, ys = np.meshgrid(line, line)
    return np.stack([xs.ravel(), ys.ravel()], axis=-1)


def _packbits(bits):
    """[..., N] bool -> [..., ceil(N/8)] uint8 (big-endian like numpy)."""
    n = bits.shape[-1]
    pad = (-n) % 8
    b = jnp.pad(bits.astype(jnp.uint8), [(0, 0)] * (bits.ndim - 1)
                + [(0, pad)])
    b = b.reshape(*b.shape[:-1], -1, 8)
    weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8)
    return jnp.sum(b * weights, axis=-1).astype(jnp.uint8)


def _mask_boxes(masks):
    """[M, H, W] bool -> XYXY boxes [M, 4] (zeros for empty masks)."""
    m, h, w = masks.shape
    any_x = jnp.any(masks, axis=1)              # [M, W]
    any_y = jnp.any(masks, axis=2)              # [M, H]
    xs = jnp.arange(w)
    ys = jnp.arange(h)
    x0 = jnp.min(jnp.where(any_x, xs, w), axis=1)
    x1 = jnp.max(jnp.where(any_x, xs, -1), axis=1)
    y0 = jnp.min(jnp.where(any_y, ys, h), axis=1)
    y1 = jnp.max(jnp.where(any_y, ys, -1), axis=1)
    empty = ~jnp.any(any_x, axis=1)
    box = jnp.stack([x0, y0, x1, y1], axis=1)
    return jnp.where(empty[:, None], 0, box)


@functools.partial(jax.jit, static_argnames=("model", "scaled_hw",
                                             "orig_hw"))
def _decode_batch(model: Sam, variables, image_embed, coords, scaled_hw,
                  orig_hw):
    """One point batch -> per-candidate filter stats + packed masks.

    coords [P, 2] in model-input pixels. Returns (iou [P*3],
    stability [P*3], boxes XYXY [P*3, 4], areas [P*3], packed masks
    [P*3, ceil(H*W/8)] uint8) at the original resolution."""
    cfg = model.cfg
    pts = coords[:, None, :]                       # [P, 1, 2]
    labels = jnp.ones(pts.shape[:2], jnp.int32)
    pad_pts = jnp.concatenate([pts, jnp.zeros_like(pts[:, :1])], axis=1)
    pad_lbl = jnp.concatenate(
        [labels, -jnp.ones_like(labels[:, :1])], axis=1)
    masks, iou = model.apply(variables, image_embed, pad_pts, pad_lbl,
                             method=model.decode)
    masks = masks[:, 1:]                           # multimask slice
    iou = iou[:, 1:]
    p, m = masks.shape[:2]
    masks = masks.reshape(p * m, *masks.shape[2:])
    iou = iou.reshape(p * m)

    # 256 -> model input -> crop padding -> original resolution (the
    # published predictor.postprocess_masks chain, bilinear twice)
    masks = jax.image.resize(masks, (p * m, cfg.img_size, cfg.img_size),
                             method="bilinear")
    masks = masks[:, :scaled_hw[0], :scaled_hw[1]]
    masks = jax.image.resize(masks, (p * m,) + tuple(orig_hw),
                             method="bilinear")

    hi = jnp.sum(masks > 1.0, axis=(1, 2))
    lo = jnp.sum(masks > -1.0, axis=(1, 2))
    stability = hi / jnp.maximum(lo, 1)
    binary = masks > 0.0
    areas = jnp.sum(binary, axis=(1, 2))
    boxes = _mask_boxes(binary)
    packed = _packbits(binary.reshape(p * m, -1))
    return iou, stability, boxes, areas, packed


def _box_nms(boxes: np.ndarray, scores: np.ndarray,
             thresh: float) -> np.ndarray:
    """Greedy NMS on XYXY boxes; returns kept indices (host-side, small)."""
    order = np.argsort(-scores)
    keep = []
    while len(order):
        i = order[0]
        keep.append(i)
        if len(order) == 1:
            break
        rest = order[1:]
        xx0 = np.maximum(boxes[i, 0], boxes[rest, 0])
        yy0 = np.maximum(boxes[i, 1], boxes[rest, 1])
        xx1 = np.minimum(boxes[i, 2], boxes[rest, 2])
        yy1 = np.minimum(boxes[i, 3], boxes[rest, 3])
        # torchvision IoU convention (no inclusive +1 terms) so borderline
        # candidates at the 0.7 threshold match the reference's batched_nms
        inter = np.maximum(xx1 - xx0, 0) * np.maximum(yy1 - yy0, 0)
        area_i = ((boxes[i, 2] - boxes[i, 0])
                  * (boxes[i, 3] - boxes[i, 1]))
        area_r = ((boxes[rest, 2] - boxes[rest, 0])
                  * (boxes[rest, 3] - boxes[rest, 1]))
        iou = inter / np.maximum(area_i + area_r - inter, 1e-9)
        order = rest[iou <= thresh]
    return np.asarray(keep, np.int64)


class SamMaskGenerator:
    """Drop-in `generator` for MaskAdapter: image -> list of mask dicts.

    variables: converted released-checkpoint params (convert.py) or any
    init of Sam(cfg) (zero-egress environments run random weights through
    the identical code path)."""

    def __init__(self, variables, cfg: SamConfig = SamConfig(),
                 points_per_side: int = 32, points_per_batch: int = 64,
                 pred_iou_thresh: float = 0.88,
                 stability_score_thresh: float = 0.95,
                 box_nms_thresh: float = 0.7):
        self.model = Sam(cfg)
        self.cfg = cfg
        self.variables = variables
        self.grid01 = build_point_grid(points_per_side)
        self.points_per_batch = points_per_batch
        self.pred_iou_thresh = pred_iou_thresh
        self.stability_score_thresh = stability_score_thresh
        self.box_nms_thresh = box_nms_thresh
        self._encode = jax.jit(
            lambda v, im: self.model.apply(v, im, method=self.model.encode))

    def __call__(self, image: np.ndarray) -> list[dict]:
        image = np.asarray(image)
        if image.ndim == 2:
            image = np.stack([image] * 3, axis=-1)
        h, w = image.shape[:2]
        batched, scaled_hw = preprocess_image(image, self.cfg.img_size)
        embed = self._encode(self.variables, batched)

        scale = self.cfg.img_size / max(h, w)
        pts = self.grid01 * np.array([w, h])          # original pixels
        pts = pts * scale                              # model-input pixels

        per = self.points_per_batch
        n = len(pts)
        pad_n = -(-n // per) * per
        pts = np.concatenate([pts, np.zeros((pad_n - n, 2))])
        cand = {"iou": [], "stab": [], "box": [], "area": [], "pack": []}
        for s in range(0, pad_n, per):
            iou, stab, box, area, pack = _decode_batch(
                self.model, self.variables, embed,
                jnp.asarray(pts[s:s + per], jnp.float32), scaled_hw,
                (h, w))
            take = min(per, n - s) * 3
            cand["iou"].append(np.asarray(iou)[:take])
            cand["stab"].append(np.asarray(stab)[:take])
            cand["box"].append(np.asarray(box)[:take])
            cand["area"].append(np.asarray(area)[:take])
            cand["pack"].append(np.asarray(pack)[:take])
        iou = np.concatenate(cand["iou"])
        stab = np.concatenate(cand["stab"])
        boxes = np.concatenate(cand["box"])
        areas = np.concatenate(cand["area"])
        packed = np.concatenate(cand["pack"])

        keep = (iou > self.pred_iou_thresh) \
            & (stab >= self.stability_score_thresh) & (areas > 0)
        idx = np.where(keep)[0]
        if len(idx) == 0:
            return []
        nms = _box_nms(boxes[idx].astype(np.float64), iou[idx],
                       self.box_nms_thresh)
        idx = idx[nms]

        out = []
        for i in idx:
            seg = np.unpackbits(packed[i])[:h * w].reshape(h, w).astype(bool)
            x0, y0, x1, y1 = boxes[i]
            out.append({
                "segmentation": seg,
                "bbox": [int(x0), int(y0), int(x1 - x0), int(y1 - y0)],
                "area": int(areas[i]),
                "predicted_iou": float(iou[i]),
                "stability_score": float(stab[i]),
            })
        out.sort(key=lambda d: d["area"], reverse=True)
        return out
