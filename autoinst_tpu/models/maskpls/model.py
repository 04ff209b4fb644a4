"""MaskPS: backbone + decoder + DETR-style mask losses + training step.

JAX equivalent of the reference LightningModule MaskPS
(self-training/mask_pls/models/mask_model.py:13-217) with its MaskLoss /
HungarianMatcher (loss.py:14-361, matcher.py:12-125):

  * Hungarian matching runs on host (scipy linear_sum_assignment) via
    jax.pure_callback on device-computed cost matrices -- the reference
    also falls back to CPU for LSAP (matcher.py:116);
  * targets are padded to a static [B, T, N] layout; padded targets get a
    +1e6 matching cost (constant-cost dummy columns leave the real
    assignment optimal);
  * mask losses evaluate on a shared per-sample point pool: ~500 points per
    target mask plus uniform fill (reference utils/misc.py:38-52), sampled
    with replacement (deviation: the reference takes each mask's first 500
    ids; with-replacement uniform sampling is unbiased and shape-static);
  * class CE uses unit weights, matching the reference's shipped state
    (loss.py:44-46 -- the eos_coef line is commented out there).

Loss weights: ce 2.0, dice 5.0, mask 5.0 (model.yaml LOSS.WEIGHTS).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from autoinst_tpu.models.maskpls import sparse
from autoinst_tpu.models.maskpls.backbone import MinkUNet
from autoinst_tpu.models.maskpls.decoder import MaskedTransformerDecoder


@dataclass(frozen=True)
class MaskPLSConfig:
    num_classes: int = 1          # class-agnostic (reference mink.py:18)
    resolution: float = 0.05
    compute_dtype: str = "float32"  # "bfloat16" = MXU-native backbone GEMMs
    num_queries: int = 40
    overlap_threshold: float = 0.8
    # loss
    w_ce: float = 2.0
    w_dice: float = 5.0
    w_mask: float = 5.0
    p_ratio: float = 0.4
    num_points: int = 50000      # shared pool size (model.yaml NUM_POINTS)
    n_mask_pts: int = 500
    # optimization (model.yaml TRAIN)
    lr: float = 1e-4
    grad_clip: float = 0.5
    batch_acc: int = 4
    # LR schedule (deviation: the reference ships a bare constant-LR AdamW,
    # mask_model.py:107-109, and its STEP/DECAY config is neutralized with
    # DECAY 1.0. Constant LR destabilizes late memorization runs -- the
    # round-4 overfit probe reached dice ~0 then repeatedly lost masks to
    # assignment flips. warmup+cosine settles the endpoint; 0 = parity.)
    lr_warmup: int = 0            # linear warmup steps
    lr_total_steps: int = 0       # cosine horizon in optimizer steps;
    # 0 = constant LR (reference parity)
    lr_min_frac: float = 0.01     # floor as a fraction of peak lr
    # Matching stabilizers (deviations from the reference matcher; both
    # default OFF = parity). Motivation (round-4 probes, NOTES_ROUND4.md):
    # the trained model's own mask-feature space linearly separates EVERY
    # target (probe IoU 0.9-1.0 incl. 105-pt masks) while queries own only
    # the biggest ones and the class head stays at chance -- the failure is
    # Hungarian-assignment churn, not capacity.
    #   match_exact: compute matching costs on ALL valid points instead of
    #     the reference's random 40% subset (matcher.py:83-86, a torch-era
    #     memory hack). Exact costs are two [Q,P]x[P,T] GEMMs -- MXU food --
    #     and remove the sampling noise that flips small-mask assignments
    #     step to step.
    #   match_joint: one assignment from the summed per-level costs applied
    #     to every deep-supervision level (the reference re-matches per
    #     level, loss.py:54-103); per-level churn feeds the class head
    #     contradictory object/no-object targets each step.
    match_exact: bool = False
    match_joint: bool = False
    remat: bool = False          # rematerialize backbone conv blocks
    # (jax.checkpoint) to fit large point budgets in HBM
    knn_mode: str = "grid"       # voxel->point kNN-up: "grid" | "exact"
    # optional loss terms; defaults match the reference's SHIPPED behavior
    # (model.yaml: FREEPOINT_LOSS False; loss.py: self.drop_loss = False;
    # sem_loss constructed but unused by the class-agnostic getLoss,
    # mask_model.py:31,47-53)
    sem_loss: bool = False       # SemLoss on bb_logits (loss.py:366-476)
    sem_w: tuple = (2.0, 6.0)    # (CE, Lovasz) weights (model.yaml SEM)
    freepoint_loss: bool = False  # box/center terms (loss.py:296-340)
    w_box: float = 0.5
    w_center: float = 1.0
    drop_loss: bool = False      # drop low-IoU matched masks (loss.py:247+)
    drop_loss_thresh: float = 0.15
    # no-object CE class weight. The reference CONFIG carries EOS_COEF 0.1
    # (model.yaml LOSS.EOS_COEF, the DETR/MaskPLS standard) but its shipped
    # code comments the weight line out (loss.py:47), so 1.0 is literal
    # shipped parity. With few training chunks the uniform weight lets
    # Hungarian-assignment churn collapse the classifier to all-no-object
    # (observed: mask IoUs improving while kept queries -> 0); 0.1 is the
    # documented fix and matches the reference's own config intent.
    eos_coef: float = 1.0


class MaskPS(nn.Module):
    cfg: MaskPLSConfig = MaskPLSConfig()

    @nn.compact
    def __call__(self, batch: dict, train: bool = False):
        v0 = batch["levels"][0]["nbr3"].shape[1]
        vox_feats = jax.vmap(sparse.voxelize_features,
                             in_axes=(0, 0, 0, None))(
            batch["pt_feats"], batch["point_voxel"], batch["pt_valid"],
            v0 + 1)[:, :v0]
        bb = MinkUNet(n_classes=self.cfg.num_classes,
                      dtype=jnp.dtype(self.cfg.compute_dtype).type,
                      remat=self.cfg.remat, knn_mode=self.cfg.knn_mode,
                      name="backbone")
        feats, coords, pad_masks, bb_logits = bb(
            {**batch, "vox_feats": vox_feats}, train=train)
        dec = MaskedTransformerDecoder(
            num_queries=self.cfg.num_queries,
            num_classes=self.cfg.num_classes, name="decoder")
        outputs = dec(feats, coords, pad_masks)
        return outputs, pad_masks, bb_logits


# ----------------------------------------------------------------- losses


def _bce_logits(logits, targets):
    return jnp.maximum(logits, 0) - logits * targets + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))


def _pair_costs(out_mask, tgt_mask, weight=None):
    """Mask2Former pairwise BCE + dice costs over a shared point set.

    out_mask [Q, P] logits, tgt_mask [T, P] binary. weight [P] (optional):
    per-point weight (e.g. a validity mask so padded points contribute
    exactly zero). Returns ([Q,T], [Q,T])."""
    pos = _bce_logits(out_mask, jnp.ones_like(out_mask))   # [Q, P]
    neg = _bce_logits(out_mask, jnp.zeros_like(out_mask))
    sig = jax.nn.sigmoid(out_mask)
    if weight is None:
        denom_p = out_mask.shape[1]
    else:
        pos = pos * weight[None, :]
        neg = neg * weight[None, :]
        sig = sig * weight[None, :]
        tgt_mask = tgt_mask * weight[None, :]
        denom_p = jnp.maximum(jnp.sum(weight), 1.0)
    cost_mask = (pos @ tgt_mask.T + neg @ (1 - tgt_mask).T) / denom_p
    num = 2 * (sig @ tgt_mask.T)
    den = sig.sum(1, keepdims=True) + tgt_mask.sum(1)[None, :]
    cost_dice = 1 - (num + 1) / (den + 1)
    return cost_mask, cost_dice


def matching_costs(outputs, targets, rng, cfg: MaskPLSConfig):
    """[B, Q, T] matching cost for one prediction level
    (reference matcher.py:64-118)."""
    logits = outputs["pred_logits"]          # [B, Q, C+1]
    masks = outputs["pred_masks"]            # [B, P, Q]
    tgt_cls = targets["classes"]             # [B, T]
    tgt_msk = targets["masks"]               # [B, T, P]
    tgt_valid = targets["valid"]             # [B, T]
    b, p, q = masks.shape
    n_sub = max(int(cfg.p_ratio * p), 1)

    def one(logit_b, mask_b, cls_b, tmask_b, tvalid_b, pvalid_b, key):
        prob = jax.nn.softmax(logit_b, axis=-1)
        cost_class = -prob[:, cls_b]                   # [Q, T]
        if cfg.match_exact:
            # exact costs over all valid points (cfg.match_exact): two
            # [Q,P]x[P,T] GEMMs, no sampling noise
            cost_mask, cost_dice = _pair_costs(
                mask_b.T, tmask_b, weight=pvalid_b.astype(mask_b.dtype))
        else:
            # shared random subset of valid points (randint w/ replacement,
            # matcher.py:83-86)
            nvalid_b = jnp.sum(pvalid_b)
            u = jax.random.uniform(key, (n_sub,))
            pt_idx = jnp.floor(u * nvalid_b).astype(jnp.int32)
            om = mask_b.T[:, pt_idx]                   # [Q, n_sub]
            tm = tmask_b[:, pt_idx]                    # [T, n_sub]
            cost_mask, cost_dice = _pair_costs(om, tm)
        c = cfg.w_mask * cost_mask + cfg.w_ce * cost_class \
            + cfg.w_dice * cost_dice
        return jnp.where(tvalid_b[None, :], c, 1e6)

    keys = jax.random.split(rng, b)
    return jax.vmap(one)(logits, masks, tgt_cls, tgt_msk, tgt_valid,
                         targets["point_valid"], keys)


def _host_lsa(costs: np.ndarray) -> np.ndarray:
    """costs [L, B, Q, T] -> assignment [L, B, T] (query index per target)."""
    from scipy.optimize import linear_sum_assignment
    L, B, Q, T = costs.shape
    out = np.zeros((L, B, T), np.int32)
    for l in range(L):
        for b in range(B):
            row, col = linear_sum_assignment(costs[l, b])
            assign = np.zeros(T, np.int32)
            assign[col] = row
            out[l, b] = assign
    return out


def _match_callback(all_costs: jax.Array) -> jax.Array:
    shape = jax.ShapeDtypeStruct(all_costs.shape[:2] + (all_costs.shape[3],),
                                 jnp.int32)
    return jax.pure_callback(_host_lsa, shape, all_costs)


def hungarian_match(all_costs: jax.Array) -> jax.Array:
    """Exact LSAP fully in-graph: [L, B, Q, T] costs -> [L, B, T] query
    index per target.

    Runs this framework's shortest-augmenting-path solver (ops/lsa.py,
    same optimum as the reference's scipy call, matcher.py:116) under vmap
    on device -- no host callback, so it works on transports without
    callback support and costs no device->host round trip per step.
    Matching is done under stop_gradient (the reference matches inside
    no_grad, matcher.py:39)."""
    from autoinst_tpu.ops.lsa import linear_sum_assignment
    L, B, Q, T = all_costs.shape
    c = jax.lax.stop_gradient(all_costs)
    ct = jnp.transpose(c, (0, 1, 3, 2)).reshape(L * B, T, Q)
    assign = jax.vmap(linear_sum_assignment)(ct)
    return assign.reshape(L, B, T).astype(jnp.int32)


@jax.custom_jvp
def _hungarian_float(all_costs: jax.Array) -> jax.Array:
    return _match_callback(all_costs).astype(jnp.float32)


@_hungarian_float.defjvp
def _hungarian_jvp(primals, tangents):
    # the assignment is a piecewise-constant function of the costs: zero
    # tangent (the reference also matches under no_grad, matcher.py:39)
    out = _hungarian_float(primals[0])
    return out, jnp.zeros_like(out)


def hungarian_match_host(all_costs: jax.Array) -> jax.Array:
    """scipy-via-callback variant (host LSAP round trip inside jit); kept
    for cross-checking the in-graph solver on callback-capable backends."""
    return _hungarian_float(jax.lax.stop_gradient(all_costs)
                            ).astype(jnp.int32)


def _box_center_losses(pred, tgt, coords_pool, tgt_valid_b):
    """FREEPOINT box + center terms for one sample (loss.py:296-340).

    pred/tgt [T, S] (matched mask logits / binary targets on the sampled
    pool), coords_pool [S, 3]. Each sampled point is assigned to its
    argmax mask; per-mask center/min/max of the point coords feed
    Frobenius-norm penalties (the reference's torch.norm(..., p=2).sum()
    over the [T, 3] matrix)."""
    t, s = pred.shape
    winner = jnp.argmax(pred, axis=0)                       # [S]
    pmask = (jax.nn.one_hot(winner, t, axis=0)
             * tgt_valid_b[:, None])                        # [T, S]
    gmask = tgt * tgt_valid_b[:, None]

    def stats(m):
        cnt = jnp.sum(m, axis=1)                            # [T]
        ctr = (m @ coords_pool) / jnp.maximum(cnt, 1.0)[:, None]
        big = 1e9
        mins = jnp.min(jnp.where(m[..., None] > 0, coords_pool[None],
                                 big), axis=1)
        maxs = jnp.max(jnp.where(m[..., None] > 0, coords_pool[None],
                                 -big), axis=1)
        has = (cnt > 0)[:, None]
        return (jnp.where(has, ctr, 0.0), jnp.where(has, mins, 0.0),
                jnp.where(has, maxs, 0.0))

    pc, pmin, pmax = stats(pmask)
    gc, gmin, gmax = stats(gmask)
    box = (jnp.linalg.norm(pmin - gmin) + jnp.linalg.norm(gmax - pmax))
    center = jnp.linalg.norm(pc - gc)
    return box, center


def level_losses(outputs, targets, assign, pool, cfg: MaskPLSConfig,
                 coords=None):
    """CE + dice + mask losses for one level given the matching.

    assign [B, T]: query index per target. pool [B, P_pool]: shared sampled
    point ids per batch element. coords [B, P, 3] (point coords, needed
    when cfg.freepoint_loss)."""
    logits = outputs["pred_logits"]          # [B, Q, C+1]
    masks = outputs["pred_masks"]            # [B, P, Q]
    tgt_cls = targets["classes"]
    tgt_msk = targets["masks"]
    tgt_valid = targets["valid"].astype(jnp.float32)
    b, q = logits.shape[:2]
    num_classes = logits.shape[2] - 1

    # ---- classification CE (loss.py:117-157), unit class weights
    target_classes = jnp.full((b, q), num_classes, jnp.int32)
    qidx = assign
    updates = jnp.where(targets["valid"], tgt_cls, num_classes)
    target_classes = jax.vmap(
        lambda tc, qi, up: tc.at[qi].set(up))(target_classes, qidx, updates)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, target_classes[..., None], axis=-1)
    # per-element class weight (torch F.cross_entropy(weight=) semantics:
    # weighted mean); no-object entries get cfg.eos_coef
    eos_w = jnp.where(target_classes == num_classes, cfg.eos_coef, 1.0)

    # ---- mask + dice on the shared pool (loss.py:159-213)
    num_masks = jnp.maximum(jnp.sum(tgt_valid), 1.0)

    def one(mask_b, tmask_b, assign_b, pool_b):
        pred = mask_b.T[assign_b][:, pool_b]      # [T, P_pool] logits
        tgt = tmask_b[:, pool_b]                  # [T, P_pool]
        lm = jnp.mean(_bce_logits(pred, tgt), axis=1)
        sig = jax.nn.sigmoid(pred)
        num = 2 * jnp.sum(sig * tgt, axis=1)
        den = jnp.sum(sig, axis=1) + jnp.sum(tgt, axis=1)
        ld = 1 - (num + 1) / (den + 1)
        # per-target IoU of the argmax-assignment masks (loss.py:247-274
        # batch_iou) for the drop-loss filter
        winner = jnp.argmax(pred, axis=0)
        pm = jax.nn.one_hot(winner, pred.shape[0], axis=0)
        inter = jnp.sum(pm * tgt, axis=1)
        union = jnp.sum(pm, axis=1) + jnp.sum(tgt, axis=1) - inter
        iou = inter / jnp.maximum(union, 1.0)
        return lm, ld, iou

    lm, ld, iou = jax.vmap(one)(masks, tgt_msk, assign, pool)

    if cfg.drop_loss:
        # keep only matched masks whose argmax-IoU clears the threshold
        # (reference loss.py:34,243-274 -- shipped disabled, keep weights
        # replace the dynamic keep_idcs gather for static shapes)
        keep = (iou > cfg.drop_loss_thresh).astype(jnp.float32) * tgt_valid
        denom = jnp.maximum(jnp.sum(keep), 1.0)
        loss_mask = jnp.sum(lm * keep) / denom
        loss_dice = jnp.sum(ld * keep) / denom
        # CE: weight matched-query terms by keep, unmatched as usual
        ce_w = jnp.ones((b, q))
        ce_w = jax.vmap(lambda w, qi, kp: w.at[qi].set(kp))(
            ce_w, qidx, keep)
        ce_w = ce_w * eos_w
        loss_ce = jnp.sum(ce[..., 0] * ce_w) / jnp.maximum(
            jnp.sum(ce_w), 1.0)
    else:
        loss_mask = jnp.sum(lm * tgt_valid) / num_masks
        loss_dice = jnp.sum(ld * tgt_valid) / num_masks
        loss_ce = jnp.sum(ce[..., 0] * eos_w) / jnp.maximum(
            jnp.sum(eos_w), 1e-8)

    out = {"loss_ce": loss_ce * cfg.w_ce,
           "loss_mask": loss_mask * cfg.w_mask,
           "loss_dice": loss_dice * cfg.w_dice}

    if cfg.freepoint_loss:
        assert coords is not None, "freepoint_loss needs point coords"

        def one_box(mask_b, tmask_b, assign_b, pool_b, coords_b, tv_b):
            pred = mask_b.T[assign_b][:, pool_b]
            tgt = tmask_b[:, pool_b]
            return _box_center_losses(pred, tgt, coords_b[pool_b], tv_b)

        box, center = jax.vmap(one_box)(masks, tgt_msk, assign, pool,
                                        coords, tgt_valid)
        out["loss_box"] = jnp.sum(box) / num_masks * cfg.w_box
        out["loss_center"] = jnp.sum(center) / num_masks * cfg.w_center
    return out


def sem_loss_fn(bb_logits, sem_labels, pt_valid, w_ce, w_lov):
    """SemLoss: CE (ignore class 0) + Lovasz-softmax on the backbone's
    per-point semantic head (reference loss.py:366-476; constructed with
    weights [2, 6] in mask_model.py:31 but unused by the shipped
    class-agnostic run -- gate with cfg.sem_loss).

    bb_logits [B, N, C], sem_labels [B, N] int32, pt_valid [B, N]."""
    b, n, c = bb_logits.shape
    logp = jax.nn.log_softmax(bb_logits, -1)
    lab = jnp.clip(sem_labels, 0, c - 1)
    ce_all = -jnp.take_along_axis(logp, lab[..., None], -1)[..., 0]
    valid_ce = pt_valid & (sem_labels != 0)      # ignore_index=0
    ce = jnp.sum(ce_all * valid_ce) / jnp.maximum(jnp.sum(valid_ce), 1)

    probas = jax.nn.softmax(bb_logits, -1).reshape(b * n, c)
    labels = sem_labels.reshape(-1)
    valid = pt_valid.reshape(-1)

    def per_class(cid):
        fg = ((labels == cid) & valid).astype(jnp.float32)
        pred = probas[:, cid]
        # invalid entries: error 0 -> sorted last -> contribute exactly 0
        errors = jnp.where(valid, jnp.abs(fg - pred), 0.0)
        order = jnp.argsort(-errors)
        e_sorted = errors[order]
        fg_sorted = fg[order]
        gts = jnp.sum(fg_sorted)
        inter = gts - jnp.cumsum(fg_sorted)
        union = gts + jnp.cumsum(1.0 - fg_sorted)
        jac = 1.0 - inter / union
        grad = jnp.concatenate([jac[:1], jac[1:] - jac[:-1]])
        return jnp.dot(e_sorted, grad), (gts > 0).astype(jnp.float32)

    losses, present = jax.vmap(per_class)(jnp.arange(c))
    lov = jnp.sum(losses * present) / jnp.maximum(jnp.sum(present), 1.0)
    return {"sem_ce": w_ce * ce, "sem_lov": w_lov * lov}


def sample_point_pool(rng, targets, cfg: MaskPLSConfig, p_total: int):
    """Per-sample shared point pool: ~n_mask_pts per valid mask (with
    replacement) + uniform fill (reference utils/misc.py:38-52)."""
    tgt_msk = targets["masks"]               # [B, T, P]
    b, t, p = tgt_msk.shape
    pool_size = min(cfg.num_points, p_total)

    def one(key, tm, tvalid, nvalid):
        k1, k2, k3 = jax.random.split(key, 3)
        per_mask = min(cfg.n_mask_pts, max(pool_size // max(t, 1), 1))
        # sample per-mask points via inverse cdf over the mask distribution
        cdf = jnp.cumsum(tm, axis=1)
        tot = cdf[:, -1:]
        u = jax.random.uniform(k1, (t, per_mask)) * jnp.maximum(tot, 1.0)
        idx = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu))(cdf, u)
        # invalid / empty target slots fall back to uniform valid points
        # (NOT index 0: with T static at 40 and ~10 real masks, zeroing
        # would flood half the pool with copies of one point, diluting and
        # skewing every mask/dice gradient -- the reference pool is
        # n_pts-per-real-mask + uniform fill, utils/misc.py:38-52)
        uni = jnp.floor(jax.random.uniform(k3, (t, per_mask))
                        * nvalid).astype(idx.dtype)
        idx = jnp.where((tvalid[:, None]) & (tot > 0), idx, uni)
        m_idx = idx.reshape(-1)[:pool_size]
        fill = jnp.floor(jax.random.uniform(
            k2, (pool_size - m_idx.shape[0],)) * nvalid).astype(jnp.int32)
        return jnp.concatenate([m_idx.astype(jnp.int32), fill])

    keys = jax.random.split(rng, b)
    nvalid = jnp.sum(targets["point_valid"], axis=1)
    return jax.vmap(one)(keys, tgt_msk, targets["valid"], nvalid)


def mask_loss(outputs, targets, rng, cfg: MaskPLSConfig, coords=None):
    """Total DETR-style loss over the final + auxiliary levels
    (loss.py:54-103). coords [B, P, 3]: required when cfg.freepoint_loss."""
    levels = [outputs] + list(outputs.get("aux_outputs", []))
    k_match, k_pool = jax.random.split(rng)
    costs = jnp.stack([
        matching_costs(lvl, targets, jax.random.fold_in(k_match, i), cfg)
        for i, lvl in enumerate(levels)])
    if cfg.match_joint:
        # one assignment from the summed per-level costs, applied to every
        # level (cfg.match_joint): consistent class-head supervision
        joint = jnp.mean(costs, axis=0, keepdims=True)
        assign = jnp.tile(hungarian_match(joint), (costs.shape[0], 1, 1))
    else:
        assign = hungarian_match(costs)      # [L, B, T]
    p_total = outputs["pred_masks"].shape[1]
    pool = sample_point_pool(k_pool, targets, cfg, p_total)

    losses = {}
    total = 0.0
    for i, lvl in enumerate(levels):
        ld = level_losses(lvl, targets, assign[i], pool, cfg, coords=coords)
        prefix = "" if i == 0 else f"{i - 1}_"
        for k, v in ld.items():
            losses[prefix + k] = v
            total = total + v
    losses["total"] = total
    return total, losses


# ------------------------------------------------------- panoptic inference


def panoptic_inference(pred_logits: np.ndarray, pred_masks: np.ndarray,
                       pt_valid: np.ndarray, num_classes: int = 1,
                       things_ids=(0,), overlap_threshold: float = 0.8):
    """Greedy panoptic assembly (reference mask_model.py:125-250), host-side.

    Returns (sem [N], ins [N], confs [N]) for one sample."""
    n = int(pt_valid.sum())
    prob = _softmax_np(pred_logits)          # [Q, C+1]
    scores = prob.max(-1)
    labels = prob.argmax(-1)
    sig = _sigmoid_np(pred_masks[:n])        # [N, Q]
    keep = labels != num_classes

    sem = np.zeros(n, np.int32)
    ins = np.zeros(n, np.int32)
    cur_scores = scores[keep]
    cur_masks = sig[:, keep]
    cur_classes = labels[keep]
    if cur_masks.shape[1] == 0:
        return sem, ins, np.zeros(n, np.float32)

    cur_prob_masks = cur_scores[None, :] * cur_masks
    probs = _softmax_np(cur_prob_masks, axis=1)
    confs = probs.max(1)
    mask_ids = cur_prob_masks.argmax(1)

    segment_id = 0
    stuff_memory = {}
    for k in range(cur_classes.shape[0]):
        pred_class = int(cur_classes[k])
        isthing = pred_class in things_ids
        mask_area = int((mask_ids == k).sum())
        original_area = int((cur_masks[:, k] >= 0.5).sum())
        mask = (mask_ids == k) & (cur_masks[:, k] >= 0.5)
        if mask_area > 0 and original_area > 0 and mask.sum() > 0:
            if mask_area / original_area < overlap_threshold:
                continue
            if not isthing:
                if pred_class in stuff_memory:
                    continue
                stuff_memory[pred_class] = segment_id + 1
            segment_id += 1
            sem[mask] = pred_class
            ins[mask] = segment_id if isthing else 0
    return sem, ins, confs.astype(np.float32)


def _softmax_np(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def _sigmoid_np(x):
    # overflow-free piecewise form (exp only ever sees non-positive input)
    out = np.empty_like(x, dtype=np.float64)
    pos = x >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-x[pos]))
    e = np.exp(x[~pos])
    out[~pos] = e / (1.0 + e)
    return out


# ------------------------------------------------------------ train state


def lr_schedule(cfg: MaskPLSConfig):
    """Constant LR (reference parity) or linear-warmup + cosine decay.

    Returns either a float or an optax schedule; also usable standalone to
    report the current LR for telemetry (counts are optimizer steps, i.e.
    post-accumulation updates when cfg.batch_acc > 1)."""
    import optax
    if cfg.lr_total_steps <= 0:
        return cfg.lr
    return optax.warmup_cosine_decay_schedule(
        init_value=cfg.lr * cfg.lr_min_frac, peak_value=cfg.lr,
        warmup_steps=max(cfg.lr_warmup, 1),
        decay_steps=max(cfg.lr_total_steps, cfg.lr_warmup + 1),
        end_value=cfg.lr * cfg.lr_min_frac)


def create_train_state(rng, cfg: MaskPLSConfig, example_batch):
    import optax
    from flax.training import train_state

    class TrainState(train_state.TrainState):
        batch_stats: dict = None

    model = MaskPS(cfg)
    variables = model.init(rng, example_batch, train=False)
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(lr_schedule(cfg)),
    )
    if cfg.batch_acc > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.batch_acc)
    return TrainState.create(apply_fn=model.apply, params=variables["params"],
                             batch_stats=variables.get("batch_stats", {}),
                             tx=tx)


@partial(jax.jit, static_argnames=("cfg",))
def train_step(state, batch, targets, rng, cfg: MaskPLSConfig):
    """One optimizer step: forward, Hungarian matching, losses, grads
    (reference training_step, mask_model.py:55-71 + Trainer grad-clip 0.5
    and accumulate_grad_batches 4, train_model.py:67-76)."""

    def loss_fn(params):
        outputs, mutated = state.apply_fn(
            {"params": params, "batch_stats": state.batch_stats},
            batch, train=True, mutable=["batch_stats"])
        out, pad, bb_logits = outputs
        total, parts = mask_loss(out, targets, rng, cfg,
                                 coords=batch["pt_coords"])
        if cfg.sem_loss and "sem_labels" in targets:
            sem = sem_loss_fn(bb_logits, targets["sem_labels"],
                              batch["pt_valid"], *cfg.sem_w)
            for k, v in sem.items():
                parts = {**parts, k: v}
                total = total + v
        return total, (parts, mutated["batch_stats"])

    (total, (parts, new_stats)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params)
    # pre-clip global grad norm: tells whether cfg.grad_clip (0.5, the
    # reference Trainer value) is throttling the effective step size
    parts = {**parts, "grad_norm": optax_global_norm(grads)}
    state = state.apply_gradients(grads=grads)
    state = state.replace(batch_stats=new_stats)
    return state, total, parts


def optax_global_norm(tree):
    return jnp.sqrt(sum(jnp.sum(jnp.square(x))
                        for x in jax.tree.leaves(tree)))
