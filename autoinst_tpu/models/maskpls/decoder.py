"""Masked transformer decoder (Mask2Former-style) in Flax.

Architecture parity with the reference MaskedTransformerDecoder
(self-training/mask_pls/models/decoder.py:8-164, blocks.py:9-138,
positional_encoder.py:7-41): 40 learned queries, hidden 256, 8 heads,
FFN 1024, 3 feature levels x 3 blocks, Fourier positional encoding of
coordinates scaled by (1/48, 1/48, 1/4), per-layer masked cross-attention
(keys blocked where the running mask prediction sigmoid < 0.5), class head
(object / no-object) and a 3-layer mask-embedding MLP. Auxiliary
predictions after every layer for deep supervision.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

_NEG = -1e9


class PositionalEncoder(nn.Module):
    """Fourier features of scaled coords, left-zero-padded to feat_size
    (reference positional_encoder.py:7-41)."""
    feat_size: int = 256
    max_freq: float = 10000.0
    base: float = 2.0
    dimensionality: int = 3

    @nn.compact
    def __call__(self, coords):  # [B, N, 3]
        num_bands = math.floor(self.feat_size / self.dimensionality / 2)
        pad = self.feat_size - num_bands * 2 * self.dimensionality
        x = coords / jnp.array([48.0, 48.0, 4.0], coords.dtype)
        exponents = jnp.linspace(0.0,
                                 math.log(self.max_freq / 2) / math.log(self.base),
                                 num_bands)
        scales = jnp.power(self.base, exponents).astype(coords.dtype)
        x = x[..., None] * scales * jnp.pi       # [B, N, 3, bands]
        enc = jnp.concatenate([jnp.sin(x), jnp.cos(x)], axis=-1)
        enc = enc.reshape(*coords.shape[:-1], -1)  # [B, N, 3*2*bands]
        return jnp.pad(enc, [(0, 0)] * (enc.ndim - 1) + [(pad, 0)])


def _mha(q, k, v, num_heads, attn_mask=None, key_padding=None):
    """Multi-head attention with torch-style boolean masks (True = blocked).

    q [B,Q,D], k/v [B,P,D]; attn_mask [B,H,Q,P] or [B,Q,P]; key_padding
    [B,P]. Returns [B,Q,D] (projections handled by caller)."""
    b, nq, d = q.shape
    h = num_heads
    dh = d // h
    qh = q.reshape(b, nq, h, dh).transpose(0, 2, 1, 3)
    kh = k.reshape(b, -1, h, dh).transpose(0, 2, 1, 3)
    vh = v.reshape(b, -1, h, dh).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhqd,bhpd->bhqp", qh, kh) / jnp.sqrt(dh)
    if attn_mask is not None:
        if attn_mask.ndim == 3:
            attn_mask = attn_mask[:, None]
        logits = jnp.where(attn_mask, _NEG, logits)
    if key_padding is not None:
        logits = jnp.where(key_padding[:, None, None, :], _NEG, logits)
    attn = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqp,bhpd->bhqd", attn, vh)
    return out.transpose(0, 2, 1, 3).reshape(b, nq, d)


class MultiheadAttention(nn.Module):
    d_model: int
    nhead: int

    @nn.compact
    def __call__(self, q, k, v, attn_mask=None, key_padding=None):
        dense = lambda name: nn.Dense(self.d_model, name=name)
        out = _mha(dense("q")(q), dense("k")(k), dense("v")(v), self.nhead,
                   attn_mask, key_padding)
        return nn.Dense(self.d_model, name="out")(out)


class SelfAttentionLayer(nn.Module):
    """Post-norm self-attention (reference blocks.py:9-44)."""
    d_model: int
    nhead: int

    @nn.compact
    def __call__(self, x, query_pos=None):
        q = k = x if query_pos is None else x + query_pos
        h = MultiheadAttention(self.d_model, self.nhead)(q, k, x)
        return nn.LayerNorm()(x + h)


class CrossAttentionLayer(nn.Module):
    """Pre-norm masked cross-attention (reference blocks.py:47-92): note the
    reference adds positional encodings to keys AND values."""
    d_model: int
    nhead: int

    @nn.compact
    def __call__(self, x, mem, attn_mask=None, padding_mask=None, pos=None,
                 query_pos=None):
        xn = nn.LayerNorm()(x)
        q = xn if query_pos is None else xn + query_pos
        kv = mem if pos is None else mem + pos
        h = MultiheadAttention(self.d_model, self.nhead)(
            q, kv, kv, attn_mask=attn_mask, key_padding=padding_mask)
        return x + h


class FFNLayer(nn.Module):
    """Pre-norm FFN (reference blocks.py:95-115)."""
    d_model: int
    dim_ffn: int

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm()(x)
        h = nn.Dense(self.dim_ffn)(h)
        h = nn.relu(h)
        h = nn.Dense(self.d_model)(h)
        return x + h


class MLP(nn.Module):
    hidden: int
    out: int
    layers: int = 3

    @nn.compact
    def __call__(self, x):
        for i in range(self.layers - 1):
            x = nn.relu(nn.Dense(self.hidden)(x))
        return nn.Dense(self.out)(x)


class MaskedTransformerDecoder(nn.Module):
    hidden_dim: int = 256
    nheads: int = 8
    dim_ffn: int = 1024
    feature_levels: int = 3
    dec_blocks: int = 3
    num_queries: int = 40
    num_classes: int = 1
    in_channels: Sequence[int] = (256, 128, 96)   # levels fed to attention
    mask_feat_channels: int = 96                  # finest level -> mask feats

    @nn.compact
    def __call__(self, feats: list, coords, pad_mask):
        """feats: per-level point features [B,N,C] ordered coarse->fine with
        the finest last (mask features); coords [B,N,3]; pad_mask [B,N]."""
        num_layers = self.feature_levels * self.dec_blocks
        pe = PositionalEncoder(self.hidden_dim)

        mask_features = nn.Dense(self.hidden_dim, name="mask_feat_proj")(
            feats[-1]) + pe(coords)

        src, pos = [], []
        for i in range(self.feature_levels):
            pos.append(pe(coords))
            if self.in_channels[i] != self.hidden_dim:
                src.append(nn.Dense(self.hidden_dim,
                                    name=f"input_proj_{i}")(feats[i]))
            else:
                src.append(feats[i])

        b = feats[0].shape[0]
        query_feat = self.param("query_feat", nn.initializers.normal(1.0),
                                (self.num_queries, self.hidden_dim))
        query_embed = self.param("query_embed", nn.initializers.normal(1.0),
                                 (self.num_queries, self.hidden_dim))
        output = jnp.tile(query_feat[None], (b, 1, 1))
        q_pos = jnp.tile(query_embed[None], (b, 1, 1))

        decoder_norm = nn.LayerNorm(name="decoder_norm")
        class_embed = nn.Dense(self.num_classes + 1, name="class_embed")
        mask_embed = MLP(self.hidden_dim, self.hidden_dim, name="mask_embed")

        def pred_heads(x):
            d = decoder_norm(x)
            out_cls = class_embed(d)
            emb = mask_embed(d)
            out_mask = jnp.einsum("bqc,bpc->bpq", emb, mask_features)
            # block keys whose current mask prediction is below 0.5
            attn = (jax.nn.sigmoid(out_mask) < 0.5)
            attn = attn | pad_mask[:, :, None]
            attn = attn.transpose(0, 2, 1)          # [B, Q, P]
            # un-block queries whose mask is empty (decoder.py:97-99)
            all_blocked = jnp.all(attn, axis=-1, keepdims=True)
            attn = attn & ~all_blocked
            return out_cls, out_mask, attn

        cls_preds, mask_preds = [], []
        out_cls, out_mask, attn_mask = pred_heads(output)
        cls_preds.append(out_cls)
        mask_preds.append(out_mask)

        for i in range(num_layers):
            lvl = i % self.feature_levels
            output = CrossAttentionLayer(self.hidden_dim, self.nheads)(
                output, src[lvl], attn_mask=attn_mask,
                padding_mask=pad_mask, pos=pos[lvl], query_pos=q_pos)
            output = SelfAttentionLayer(self.hidden_dim, self.nheads)(
                output, query_pos=q_pos)
            output = FFNLayer(self.hidden_dim, self.dim_ffn)(output)
            out_cls, out_mask, attn_mask = pred_heads(output)
            cls_preds.append(out_cls)
            mask_preds.append(out_mask)

        return {
            "pred_logits": cls_preds[-1],
            "pred_masks": mask_preds[-1],
            "aux_outputs": [{"pred_logits": c, "pred_masks": m}
                            for c, m in zip(cls_preds[:-1], mask_preds[:-1])],
        }
