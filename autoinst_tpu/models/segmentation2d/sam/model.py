"""Segment Anything (SAM) in Flax: ViT image encoder, prompt encoder and
two-way-transformer mask decoder.

TPU-native equivalent of the network the reference drives through
`segment_anything.sam_model_registry` (2D-VFMs/SAM/adapter.py:30-38,
vit_h "default" registry entry): the reference only ever consumes it via
SamAutomaticMaskGenerator (see amg.py), but the full promptable surface
(points / boxes / mask inputs) is implemented.

Architecture facts follow the published SAM model (and were oracle-verified
against a hand-rolled torch twin in tests/test_sam.py):

  * ViT encoder with absolute pos-embed [1,S,S,C], windowed attention
    (window 14, zero-pad to a window multiple) except at the global
    indices, decomposed relative position bias (MViTv2-style per-axis
    tables rel_pos_h/rel_pos_w indexed at q-k+size-1), GELU MLP, and a
    neck conv1x1 -> LN2d -> conv3x3 -> LN2d down to 256 channels.
  * Prompt encoder: random-Fourier point encoding (coords in [0,1] ->
    2c-1 -> @ gaussian [2,128] -> 2pi -> [sin,cos]), per-label learned
    offsets (neg/pos point, two box corners), not-a-point embedding,
    4x mask-downscaling conv stack, no-mask dense embedding.
  * Mask decoder: [iou_token, 4 mask tokens, prompts] run through two
    TwoWayAttentionBlocks (token self-attn; token->image cross-attn at
    half width; MLP; image->token cross-attn) + final token->image
    attention, then 2x2 transposed-conv upscaling of the image state and
    per-token hypernetwork MLPs producing mask logits at 4x the
    embedding grid (256x256 for the 1024 input), plus an IoU MLP head.

Everything is static-shape: labels drive `jnp.where` selections rather
than ragged prompt lists, so the whole decode path jits once and vmaps
over prompt batches (the AMG grid).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclass(frozen=True)
class SamConfig:
    img_size: int = 1024
    patch: int = 16
    enc_dim: int = 1280           # vit_h
    enc_depth: int = 32
    enc_heads: int = 16
    global_idx: tuple = (7, 15, 23, 31)
    window: int = 14
    out_dim: int = 256            # prompt/decoder transformer width
    dec_depth: int = 2
    dec_heads: int = 8
    dec_mlp: int = 2048
    iou_mlp_dim: int = 256
    num_mask_tokens: int = 4      # 1 single + 3 multimask
    mlp_ratio: float = 4.0

    @property
    def grid(self) -> int:
        return self.img_size // self.patch


def vit_b_config() -> SamConfig:
    return SamConfig(enc_dim=768, enc_depth=12, enc_heads=12,
                     global_idx=(2, 5, 8, 11))


def vit_l_config() -> SamConfig:
    return SamConfig(enc_dim=1024, enc_depth=24, enc_heads=16,
                     global_idx=(5, 11, 17, 23))


def tiny_config(img_size: int = 64) -> SamConfig:
    """Small config for tests/oracles (structure identical to vit_h)."""
    return SamConfig(img_size=img_size, enc_dim=32, enc_depth=3,
                     enc_heads=2, global_idx=(1,), window=2, out_dim=16,
                     dec_heads=2, dec_mlp=32, iou_mlp_dim=16)


# ----------------------------------------------------------- image encoder


def _rel_pos_bias(q, rel_pos_h, rel_pos_w, h, w):
    """Decomposed relative position bias (per-axis tables).

    q [B, heads, h*w, d] -> bias [B, heads, h*w, h*w]. Square q/k extent:
    table row for offset (i - j + size - 1)."""
    def take(table, size):
        idx = np.arange(size)[:, None] - np.arange(size)[None, :] + size - 1
        return table[idx]                      # [size, size, d]

    rh = take(rel_pos_h, h)
    rw = take(rel_pos_w, w)
    b, nh, _, d = q.shape
    qr = q.reshape(b, nh, h, w, d)
    bias_h = jnp.einsum("bnhwd,hkd->bnhwk", qr, rh)
    bias_w = jnp.einsum("bnhwd,wkd->bnhwk", qr, rw)
    bias = bias_h[..., :, None] + bias_w[..., None, :]   # [B,nh,h,w,h',w']
    return bias.reshape(b, nh, h * w, h * w)


class WindowAttention(nn.Module):
    """ViTDet attention with decomposed rel-pos, over an [B,h,w,C] tile."""
    dim: int
    heads: int
    rel_size: int     # spatial extent the rel-pos tables cover

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        head_dim = self.dim // self.heads
        qkv = nn.Dense(3 * self.dim, name="qkv")(x.reshape(b, h * w, c))
        qkv = qkv.reshape(b, h * w, 3, self.heads, head_dim)
        q, k, v = [qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3)]
        rel_h = self.param("rel_pos_h", nn.initializers.zeros,
                           (2 * self.rel_size - 1, head_dim))
        rel_w = self.param("rel_pos_w", nn.initializers.zeros,
                           (2 * self.rel_size - 1, head_dim))
        attn = jnp.einsum("bnqd,bnkd->bnqk", q * (head_dim ** -0.5), k)
        attn = attn + _rel_pos_bias(q, rel_h, rel_w, h, w)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bnqk,bnkd->bnqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, h, w, c)
        return nn.Dense(self.dim, name="proj")(out)


class EncoderBlock(nn.Module):
    cfg: SamConfig
    window: int       # 0 = global

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        b, h, w, c = x.shape
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        if self.window > 0:
            ws = self.window
            ph = (ws - h % ws) % ws
            pw = (ws - w % ws) % ws
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
            hp, wp = h + ph, w + pw
            x = x.reshape(b, hp // ws, ws, wp // ws, ws, c)
            x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, c)
        x = WindowAttention(cfg.enc_dim, cfg.enc_heads,
                           self.window if self.window else cfg.grid,
                           name="attn")(x)
        if self.window > 0:
            x = x.reshape(b, hp // ws, wp // ws, ws, ws, c)
            x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, c)
            x = x[:, :h, :w]
        x = shortcut + x
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        y = nn.Dense(int(cfg.enc_dim * cfg.mlp_ratio), name="mlp_lin1")(y)
        y = nn.Dense(cfg.enc_dim, name="mlp_lin2")(nn.gelu(y,
                                                           approximate=False))
        return x + y


class LayerNorm2d(nn.Module):
    """Channel LayerNorm over [..., C] (torch LayerNorm2d, eps 1e-6)."""
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        mu = x.mean(-1, keepdims=True)
        var = ((x - mu) ** 2).mean(-1, keepdims=True)
        return (x - mu) / jnp.sqrt(var + self.eps) * scale + bias


class ImageEncoder(nn.Module):
    cfg: SamConfig

    @nn.compact
    def __call__(self, image):
        """image [B, H, W, 3] (normalized) -> embedding [B, S, S, 256]."""
        cfg = self.cfg
        x = nn.Conv(cfg.enc_dim, (cfg.patch, cfg.patch),
                    strides=(cfg.patch, cfg.patch), padding="VALID",
                    name="patch_embed")(image)
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, cfg.grid, cfg.grid, cfg.enc_dim))
        x = x + pos
        for i in range(cfg.enc_depth):
            win = 0 if i in cfg.global_idx else cfg.window
            x = EncoderBlock(cfg, win, name=f"block{i}")(x)
        x = nn.Conv(cfg.out_dim, (1, 1), use_bias=False, name="neck_conv1")(x)
        x = LayerNorm2d(name="neck_ln1")(x)
        x = nn.Conv(cfg.out_dim, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, name="neck_conv2")(x)
        return LayerNorm2d(name="neck_ln2")(x)


# ---------------------------------------------------------- prompt encoder


class PromptEncoder(nn.Module):
    """Point/box/mask prompts -> (sparse [B,T,256], dense [B,S,S,256]).

    Points come as (coords [B,T,2] in input-image pixels (x, y),
    labels [B,T]): 1 foreground, 0 background, -1 pad/not-a-point,
    2/3 box corners (a box is encoded as two corner "points"). Static
    shapes: every slot is embedded and label-selected with jnp.where.
    """
    cfg: SamConfig

    def setup(self):
        cfg = self.cfg
        half = cfg.out_dim // 2
        self.pe_gaussian = self.param(
            "pe_gaussian", lambda k, s: jax.random.normal(k, s), (2, half))
        self.point_embed = self.param(
            "point_embed", nn.initializers.normal(1.0), (4, cfg.out_dim))
        self.not_a_point = self.param(
            "not_a_point", nn.initializers.normal(1.0), (cfg.out_dim,))
        self.no_mask = self.param(
            "no_mask", nn.initializers.normal(1.0), (cfg.out_dim,))
        ch = 4                                        # 16 // 4
        self.mask_conv1 = nn.Conv(ch, (2, 2), strides=(2, 2))
        self.mask_ln1 = LayerNorm2d()
        self.mask_conv2 = nn.Conv(ch * 4, (2, 2), strides=(2, 2))
        self.mask_ln2 = LayerNorm2d()
        self.mask_conv3 = nn.Conv(cfg.out_dim, (1, 1))

    def pe_encode(self, coords01):
        """Random-Fourier encoding of [..., 2] coords in [0, 1]."""
        c = 2 * coords01 - 1
        c = (c @ self.pe_gaussian) * (2 * np.pi)
        return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)

    def __call__(self, coords, labels, mask_input=None):
        cfg = self.cfg
        pts = (coords + 0.5) / cfg.img_size          # pixel center, [0,1]
        pe = self.pe_encode(pts)                     # [B, T, 256]
        sparse = jnp.where(labels[..., None] == -1, self.not_a_point, pe)
        for lbl in range(4):
            sparse = jnp.where(labels[..., None] == lbl,
                               sparse + self.point_embed[lbl], sparse)

        s = cfg.grid
        if mask_input is None:
            dense = jnp.broadcast_to(self.no_mask,
                                     (coords.shape[0], s, s, cfg.out_dim))
        else:
            m = self.mask_conv1(mask_input)           # [B, 4S, 4S, 1]
            m = nn.gelu(self.mask_ln1(m), approximate=False)
            m = self.mask_conv2(m)
            m = nn.gelu(self.mask_ln2(m), approximate=False)
            dense = self.mask_conv3(m)
        return sparse, dense

    def image_pe(self):
        """Positional map of the embedding grid [S, S, 256]."""
        s = self.cfg.grid
        y, x = jnp.meshgrid(jnp.arange(s) + 0.5, jnp.arange(s) + 0.5,
                            indexing="ij")
        return self.pe_encode(jnp.stack([x / s, y / s], axis=-1))


# ------------------------------------------------------------ mask decoder


class DownAttention(nn.Module):
    """Attention with separate q/k/v widths (internal dim / downsample)."""
    dim: int
    heads: int
    downsample: int = 1

    @nn.compact
    def __call__(self, q, k, v):
        inner = self.dim // self.downsample
        hd = inner // self.heads
        qh = nn.Dense(inner, name="q_proj")(q)
        kh = nn.Dense(inner, name="k_proj")(k)
        vh = nn.Dense(inner, name="v_proj")(v)

        def heads(t):
            return t.reshape(t.shape[0], t.shape[1], self.heads,
                             hd).transpose(0, 2, 1, 3)
        qh, kh, vh = heads(qh), heads(kh), heads(vh)
        attn = jax.nn.softmax(
            jnp.einsum("bnqd,bnkd->bnqk", qh, kh) / math.sqrt(hd), axis=-1)
        out = jnp.einsum("bnqk,bnkd->bnqd", attn, vh)
        out = out.transpose(0, 2, 1, 3).reshape(q.shape[0], q.shape[1],
                                                inner)
        return nn.Dense(self.dim, name="out_proj")(out)


class TwoWayBlock(nn.Module):
    cfg: SamConfig
    skip_first_pe: bool = False

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        cfg = self.cfg
        if self.skip_first_pe:
            queries = DownAttention(cfg.out_dim, cfg.dec_heads,
                                    name="self_attn")(queries, queries,
                                                      queries)
        else:
            q = queries + query_pe
            queries = queries + DownAttention(cfg.out_dim, cfg.dec_heads,
                                              name="self_attn")(q, q,
                                                                queries)
        queries = nn.LayerNorm(name="norm1")(queries)

        q = queries + query_pe
        k = keys + key_pe
        queries = queries + DownAttention(
            cfg.out_dim, cfg.dec_heads, downsample=2,
            name="cross_t2i")(q, k, keys)
        queries = nn.LayerNorm(name="norm2")(queries)

        y = nn.Dense(cfg.dec_mlp, name="mlp_lin1")(queries)
        y = nn.Dense(cfg.out_dim, name="mlp_lin2")(nn.relu(y))
        queries = nn.LayerNorm(name="norm3")(queries + y)

        q = queries + query_pe
        k = keys + key_pe
        keys = keys + DownAttention(
            cfg.out_dim, cfg.dec_heads, downsample=2,
            name="cross_i2t")(k, q, queries)
        keys = nn.LayerNorm(name="norm4")(keys)
        return queries, keys


class MaskDecoder(nn.Module):
    cfg: SamConfig

    @nn.compact
    def __call__(self, image_embed, image_pe, sparse, dense):
        """image_embed [B,S,S,256], image_pe [S,S,256], sparse [B,T,256],
        dense [B,S,S,256] -> (masks [B,M,4S,4S] logits, iou [B,M]) with
        M = num_mask_tokens (slice [1:] outside for multimask)."""
        cfg = self.cfg
        b = sparse.shape[0]      # prompt batch; image_embed batch may be 1
        s = image_embed.shape[1]
        nm = cfg.num_mask_tokens

        iou_token = self.param("iou_token", nn.initializers.normal(1.0),
                               (1, cfg.out_dim))
        mask_tokens = self.param("mask_tokens", nn.initializers.normal(1.0),
                                 (nm, cfg.out_dim))
        tokens = jnp.concatenate([iou_token, mask_tokens], axis=0)
        queries = jnp.concatenate(
            [jnp.broadcast_to(tokens, (b,) + tokens.shape), sparse], axis=1)

        keys = jnp.broadcast_to(image_embed, dense.shape) + dense
        keys = keys.reshape(b, s * s, cfg.out_dim)
        key_pe = jnp.broadcast_to(image_pe.reshape(1, s * s, cfg.out_dim),
                                  keys.shape)
        query_pe = queries     # original token content is the query PE

        for i in range(cfg.dec_depth):
            queries, keys = TwoWayBlock(cfg, skip_first_pe=(i == 0),
                                        name=f"block{i}")(
                queries, keys, query_pe, key_pe)
        q = queries + query_pe
        k = keys + key_pe
        queries = queries + DownAttention(
            cfg.out_dim, cfg.dec_heads, downsample=2,
            name="final_attn")(q, k, keys)
        queries = nn.LayerNorm(name="norm_final")(queries)

        iou_out = queries[:, 0]
        mask_out = queries[:, 1:1 + nm]                  # [B, M, 256]

        src = keys.reshape(b, s, s, cfg.out_dim)
        src = nn.ConvTranspose(cfg.out_dim // 4, (2, 2), strides=(2, 2),
                               name="upscale_conv1")(src)
        src = nn.gelu(LayerNorm2d(name="upscale_ln")(src), approximate=False)
        src = nn.ConvTranspose(cfg.out_dim // 8, (2, 2), strides=(2, 2),
                               name="upscale_conv2")(src)
        src = nn.gelu(src, approximate=False)            # [B, 4S, 4S, 32]

        hyper = []
        for i in range(nm):
            h = mask_out[:, i]
            h = nn.relu(nn.Dense(cfg.out_dim, name=f"hyper{i}_lin0")(h))
            h = nn.relu(nn.Dense(cfg.out_dim, name=f"hyper{i}_lin1")(h))
            hyper.append(nn.Dense(cfg.out_dim // 8, name=f"hyper{i}_lin2")(h))
        hyper = jnp.stack(hyper, axis=1)                 # [B, M, 32]
        masks = jnp.einsum("bmc,bhwc->bmhw", hyper, src)

        h = nn.relu(nn.Dense(cfg.iou_mlp_dim, name="iou_lin0")(iou_out))
        h = nn.relu(nn.Dense(cfg.iou_mlp_dim, name="iou_lin1")(h))
        iou = nn.Dense(nm, name="iou_lin2")(h)
        return masks, iou


class Sam(nn.Module):
    """Full promptable model: image + point prompts -> low-res mask logits.

    `encode` runs the heavy ViT once per image; `decode` is the cheap
    per-prompt path the AMG grid vmaps over."""
    cfg: SamConfig

    def setup(self):
        self.encoder = ImageEncoder(self.cfg)
        self.prompt = PromptEncoder(self.cfg)
        self.decoder = MaskDecoder(self.cfg)

    def encode(self, image):
        return self.encoder(image)

    def decode(self, image_embed, coords, labels, mask_input=None):
        sparse, dense = self.prompt(coords, labels, mask_input)
        return self.decoder(image_embed, self.prompt.image_pe(),
                            sparse, dense)

    def __call__(self, image, coords, labels, mask_input=None):
        # init note: pass a dummy mask_input [B, 4S, 4S, 1] so the
        # mask-downscaling conv params exist in the template tree the
        # converter checks against
        return self.decode(self.encode(image), coords, labels, mask_input)
