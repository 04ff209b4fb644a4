"""Optional-loss parity tests vs literal torch oracles (VERDICT r1 #6).

SemLoss (CE ignore-0 + Lovasz-softmax, reference loss.py:366-476),
FREEPOINT box/center terms (loss.py:296-340), drop-loss filtering
(loss.py:243-274). Oracles are direct torch ports of the reference
formulas on small dense inputs."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp

from autoinst_tpu.models.maskpls.model import (MaskPLSConfig, level_losses,
                                               sem_loss_fn,
                                               _box_center_losses)


def lovasz_oracle(probas, labels):
    """Literal port of reference lovasz_softmax_flat (classes='present')."""
    C = probas.shape[1]
    losses = []
    for c in range(C):
        fg = (labels == c).float()
        if fg.sum() == 0:
            continue
        class_pred = probas[:, 0] if C == 1 else probas[:, c]
        errors = (fg - class_pred).abs()
        errors_sorted, perm = torch.sort(errors, 0, descending=True)
        fg_sorted = fg[perm]
        gts = fg_sorted.sum()
        inter = gts - fg_sorted.cumsum(0)
        union = gts + (1 - fg_sorted).cumsum(0)
        jac = 1.0 - inter / union
        p = len(fg_sorted)
        if p > 1:
            jac[1:p] = jac[1:p] - jac[0:-1]
        losses.append(torch.dot(errors_sorted, jac))
    return torch.stack(losses).mean()


class TestSemLoss:
    def test_matches_torch_oracle(self):
        rng = np.random.default_rng(0)
        n, c = 300, 5
        logits = rng.normal(0, 2, (1, n, c)).astype(np.float32)
        labels = rng.integers(0, c, (1, n)).astype(np.int32)
        valid = np.ones((1, n), bool)

        out = sem_loss_fn(jnp.asarray(logits), jnp.asarray(labels),
                          jnp.asarray(valid), 2.0, 6.0)

        tl = torch.as_tensor(logits[0])
        tt = torch.as_tensor(labels[0]).long()
        ce = torch.nn.CrossEntropyLoss(ignore_index=0)(tl, tt)
        lov = lovasz_oracle(F.softmax(tl, dim=1), tt)
        assert abs(float(out["sem_ce"]) - 2.0 * float(ce)) < 1e-4
        assert abs(float(out["sem_lov"]) - 6.0 * float(lov)) < 1e-4

    def test_padding_is_exactly_ignored(self):
        rng = np.random.default_rng(1)
        n, pad, c = 200, 80, 4
        logits = rng.normal(0, 2, (1, n + pad, c)).astype(np.float32)
        labels = rng.integers(0, c, (1, n + pad)).astype(np.int32)
        valid = np.arange(n + pad)[None] < n

        full = sem_loss_fn(jnp.asarray(logits), jnp.asarray(labels),
                           jnp.asarray(valid), 1.0, 1.0)
        trunc = sem_loss_fn(jnp.asarray(logits[:, :n]),
                            jnp.asarray(labels[:, :n]),
                            jnp.asarray(valid[:, :n]), 1.0, 1.0)
        for k in ("sem_ce", "sem_lov"):
            assert abs(float(full[k]) - float(trunc[k])) < 1e-5, k


def box_oracle(point_logits, point_labels, num_masks, coords):
    """Literal port of reference box_loss (loss.py:296-340), CPU."""
    probabilities = F.softmax(point_logits, dim=0)
    max_indices = torch.argmax(probabilities, dim=0)
    binary = torch.zeros_like(point_logits, dtype=torch.int)
    binary[max_indices, torch.arange(point_logits.shape[1])] = 1
    T = binary.shape[0]
    cp = torch.zeros((T, 3)); cg = torch.zeros((T, 3))
    pmin = torch.zeros((T, 3)); pmax = torch.zeros((T, 3))
    gmin = torch.zeros((T, 3)); gmax = torch.zeros((T, 3))
    for d in range(T):
        ip = torch.where(binary[d] == 1)[0]
        it = torch.where(point_labels[d] == 1)[0]
        cg[d] = coords[it].sum(0) / it.shape[0]
        gmin[d] = coords[it].min(0)[0]
        gmax[d] = coords[it].max(0)[0]
        if ip.shape[0] != 0:
            cp[d] = coords[ip].sum(0) / ip.shape[0]
            pmin[d] = coords[ip].min(0)[0]
            pmax[d] = coords[ip].max(0)[0]
    box = (torch.norm(pmin - gmin, p=2) + torch.norm(gmax - pmax, p=2))
    center = torch.norm(cp - cg, p=2)
    return float(box), float(center)


class TestFreepointLoss:
    def test_box_center_match_torch_oracle(self):
        rng = np.random.default_rng(2)
        t, s = 6, 120
        pred = rng.normal(0, 2, (t, s)).astype(np.float32)
        # every target mask non-empty (the reference divides by its count)
        tgt = np.zeros((t, s), np.float32)
        tgt[rng.integers(0, t, s), np.arange(s)] = 1.0
        coords = rng.uniform(-5, 5, (s, 3)).astype(np.float32)

        box, center = _box_center_losses(
            jnp.asarray(pred), jnp.asarray(tgt), jnp.asarray(coords),
            jnp.ones(t))
        box_o, center_o = box_oracle(torch.as_tensor(pred),
                                     torch.as_tensor(tgt), t,
                                     torch.as_tensor(coords))
        assert abs(float(box) - box_o) < 1e-3
        assert abs(float(center) - center_o) < 1e-3


class TestDropLoss:
    def test_low_iou_masks_are_dropped(self):
        """With drop_loss on, a matched mask whose argmax-assignment IoU is
        below the threshold must not contribute to mask/dice losses."""
        rng = np.random.default_rng(3)
        b, q, p, t = 1, 4, 160, 2
        # query 0 nails target 0; query 1 is noise vs target 1
        masks = rng.normal(-4, 0.5, (b, p, q)).astype(np.float32)
        tgt = np.zeros((b, t, p), np.float32)
        tgt[0, 0, :60] = 1
        tgt[0, 1, 60:120] = 1
        masks[0, :60, 0] = 6.0          # strong correct mask
        masks[0, 60:120, 0] = -1.0      # row 0 wins the contested region
        masks[0, 120:, 1] = 6.0         # wrong region -> IoU 0
        outputs = {
            "pred_logits": jnp.asarray(
                rng.normal(0, 1, (b, q, 2)).astype(np.float32)),
            "pred_masks": jnp.asarray(masks),
        }
        targets = {
            "classes": jnp.zeros((b, t), jnp.int32),
            "masks": jnp.asarray(tgt),
            "valid": jnp.ones((b, t), bool),
            "point_valid": jnp.ones((b, p), bool),
        }
        assign = jnp.asarray([[0, 1]], jnp.int32)
        pool = jnp.tile(jnp.arange(p)[None], (b, 1))

        base = level_losses(outputs, targets, assign, pool,
                            MaskPLSConfig())
        dropped = level_losses(outputs, targets, assign, pool,
                               MaskPLSConfig(drop_loss=True))
        # the bad pair dominates the base dice loss; dropping it must
        # reduce dice substantially
        assert float(dropped["loss_dice"]) < 0.5 * float(base["loss_dice"])
