"""Torch twin of the published SAM network, as a converter test oracle.

Independent torch reimplementation of the original `segment_anything`
modules (the network the reference loads through
`sam_model_registry["default"]`, 2D-VFMs/SAM/adapter.py:30-38) with
module/attribute naming that reproduces the released checkpoints' state
dict exactly (image_encoder.blocks.N.attn.qkv..., prompt_encoder.
pe_layer..., mask_decoder.transformer.layers.N...). Feeding
`twin.state_dict()` to sam.convert.convert_sam_state_dict verifies every
transpose/permutation in the converter numerically without needing
segment-anything or its checkpoints in this environment.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


class LayerNorm2d(nn.Module):
    def __init__(self, c, eps=1e-6):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(c))
        self.bias = nn.Parameter(torch.zeros(c))
        self.eps = eps

    def forward(self, x):                      # [B, C, H, W]
        u = x.mean(1, keepdim=True)
        s = (x - u).pow(2).mean(1, keepdim=True)
        x = (x - u) / torch.sqrt(s + self.eps)
        return self.weight[:, None, None] * x + self.bias[:, None, None]


class MLPBlock(nn.Module):
    def __init__(self, dim, mlp_dim, act=nn.GELU):
        super().__init__()
        self.lin1 = nn.Linear(dim, mlp_dim)
        self.lin2 = nn.Linear(mlp_dim, dim)
        self.act = act()

    def forward(self, x):
        return self.lin2(self.act(self.lin1(x)))


# ----------------------------------------------------------- image encoder


def get_rel_pos(q_size, k_size, rel_pos):
    assert q_size == k_size and rel_pos.shape[0] == 2 * q_size - 1
    idx = torch.arange(q_size)[:, None] - torch.arange(k_size)[None, :] \
        + k_size - 1
    return rel_pos[idx]


def add_decomposed_rel_pos(attn, q, rel_pos_h, rel_pos_w, q_size, k_size):
    q_h, q_w = q_size
    k_h, k_w = k_size
    rh = get_rel_pos(q_h, k_h, rel_pos_h)
    rw = get_rel_pos(q_w, k_w, rel_pos_w)
    b, _, dim = q.shape
    r_q = q.reshape(b, q_h, q_w, dim)
    rel_h = torch.einsum("bhwc,hkc->bhwk", r_q, rh)
    rel_w = torch.einsum("bhwc,wkc->bhwk", r_q, rw)
    attn = (attn.view(b, q_h, q_w, k_h, k_w)
            + rel_h[:, :, :, :, None] + rel_w[:, :, :, None, :])
    return attn.view(b, q_h * q_w, k_h * k_w)


class TwinVitAttention(nn.Module):
    def __init__(self, dim, heads, input_size):
        super().__init__()
        self.num_heads = heads
        head_dim = dim // heads
        self.scale = head_dim ** -0.5
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim)
        self.rel_pos_h = nn.Parameter(
            torch.zeros(2 * input_size[0] - 1, head_dim))
        self.rel_pos_w = nn.Parameter(
            torch.zeros(2 * input_size[1] - 1, head_dim))

    def forward(self, x):                      # [B, H, W, C]
        b, h, w, _ = x.shape
        qkv = self.qkv(x).reshape(b, h * w, 3, self.num_heads,
                                  -1).permute(2, 0, 3, 1, 4)
        q, k, v = qkv.reshape(3, b * self.num_heads, h * w, -1).unbind(0)
        attn = (q * self.scale) @ k.transpose(-2, -1)
        attn = add_decomposed_rel_pos(attn, q, self.rel_pos_h,
                                      self.rel_pos_w, (h, w), (h, w))
        attn = attn.softmax(dim=-1)
        x = (attn @ v).view(b, self.num_heads, h, w, -1)
        x = x.permute(0, 2, 3, 1, 4).reshape(b, h, w, -1)
        return self.proj(x)


def window_partition(x, ws):
    b, h, w, c = x.shape
    pad_h = (ws - h % ws) % ws
    pad_w = (ws - w % ws) % ws
    x = F.pad(x, (0, 0, 0, pad_w, 0, pad_h))
    hp, wp = h + pad_h, w + pad_w
    x = x.view(b, hp // ws, ws, wp // ws, ws, c)
    win = x.permute(0, 1, 3, 2, 4, 5).contiguous().view(-1, ws, ws, c)
    return win, (hp, wp)


def window_unpartition(win, ws, pad_hw, hw):
    hp, wp = pad_hw
    h, w = hw
    b = win.shape[0] // (hp * wp // ws // ws)
    x = win.view(b, hp // ws, wp // ws, ws, ws, -1)
    x = x.permute(0, 1, 3, 2, 4, 5).contiguous().view(b, hp, wp, -1)
    return x[:, :h, :w, :].contiguous()


class TwinVitBlock(nn.Module):
    def __init__(self, dim, heads, mlp_ratio, window, input_size):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = TwinVitAttention(
            dim, heads,
            input_size=(window, window) if window else input_size)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = MLPBlock(dim, int(dim * mlp_ratio))
        self.window_size = window

    def forward(self, x):
        shortcut = x
        x = self.norm1(x)
        if self.window_size > 0:
            h, w = x.shape[1], x.shape[2]
            x, pad_hw = window_partition(x, self.window_size)
        x = self.attn(x)
        if self.window_size > 0:
            x = window_unpartition(x, self.window_size, pad_hw, (h, w))
        x = shortcut + x
        return x + self.mlp(self.norm2(x))


class PatchEmbed(nn.Module):
    def __init__(self, patch, in_ch, dim):
        super().__init__()
        self.proj = nn.Conv2d(in_ch, dim, kernel_size=patch, stride=patch)

    def forward(self, x):
        return self.proj(x).permute(0, 2, 3, 1)


class TwinImageEncoder(nn.Module):
    def __init__(self, img_size=64, patch=16, dim=32, depth=3, heads=2,
                 mlp_ratio=4.0, out_dim=16, window=2, global_idx=(1,)):
        super().__init__()
        grid = img_size // patch
        self.patch_embed = PatchEmbed(patch, 3, dim)
        self.pos_embed = nn.Parameter(torch.zeros(1, grid, grid, dim))
        self.blocks = nn.ModuleList([
            TwinVitBlock(dim, heads, mlp_ratio,
                         0 if i in global_idx else window, (grid, grid))
            for i in range(depth)])
        self.neck = nn.Sequential(
            nn.Conv2d(dim, out_dim, 1, bias=False),
            LayerNorm2d(out_dim),
            nn.Conv2d(out_dim, out_dim, 3, padding=1, bias=False),
            LayerNorm2d(out_dim))

    def forward(self, x):                      # [B, 3, H, W]
        x = self.patch_embed(x) + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        return self.neck(x.permute(0, 3, 1, 2))


# ---------------------------------------------------------- prompt encoder


class PositionEmbeddingRandom(nn.Module):
    def __init__(self, num_pos_feats):
        super().__init__()
        self.register_buffer(
            "positional_encoding_gaussian_matrix",
            torch.randn(2, num_pos_feats))

    def _pe_encoding(self, coords):
        coords = 2 * coords - 1
        coords = coords @ self.positional_encoding_gaussian_matrix
        coords = 2 * math.pi * coords
        return torch.cat([torch.sin(coords), torch.cos(coords)], dim=-1)

    def forward(self, size):
        h, w = size
        grid = torch.ones(h, w)
        y = (grid.cumsum(0) - 0.5) / h
        x = (grid.cumsum(1) - 0.5) / w
        return self._pe_encoding(
            torch.stack([x, y], dim=-1)).permute(2, 0, 1)

    def forward_with_coords(self, coords, image_size):
        c = coords.clone()
        c[..., 0] = c[..., 0] / image_size[1]
        c[..., 1] = c[..., 1] / image_size[0]
        return self._pe_encoding(c.float())


class TwinPromptEncoder(nn.Module):
    def __init__(self, embed_dim, image_embedding_size, input_image_size,
                 mask_in_chans=16):
        super().__init__()
        self.embed_dim = embed_dim
        self.input_image_size = input_image_size
        self.image_embedding_size = image_embedding_size
        self.pe_layer = PositionEmbeddingRandom(embed_dim // 2)
        self.point_embeddings = nn.ModuleList(
            [nn.Embedding(1, embed_dim) for _ in range(4)])
        self.not_a_point_embed = nn.Embedding(1, embed_dim)
        self.mask_downscaling = nn.Sequential(
            nn.Conv2d(1, mask_in_chans // 4, 2, stride=2),
            LayerNorm2d(mask_in_chans // 4), nn.GELU(),
            nn.Conv2d(mask_in_chans // 4, mask_in_chans, 2, stride=2),
            LayerNorm2d(mask_in_chans), nn.GELU(),
            nn.Conv2d(mask_in_chans, embed_dim, 1))
        self.no_mask_embed = nn.Embedding(1, embed_dim)

    def _embed_points(self, points, labels, pad):
        points = points + 0.5
        if pad:
            points = torch.cat(
                [points, torch.zeros(points.shape[0], 1, 2)], dim=1)
            labels = torch.cat(
                [labels, -torch.ones(labels.shape[0], 1)], dim=1)
        pe = self.pe_layer.forward_with_coords(
            points, (self.input_image_size, self.input_image_size))
        pe[labels == -1] = 0.0
        pe[labels == -1] += self.not_a_point_embed.weight[0]
        pe[labels == 0] += self.point_embeddings[0].weight[0]
        pe[labels == 1] += self.point_embeddings[1].weight[0]
        pe[labels == 2] += self.point_embeddings[2].weight[0]
        pe[labels == 3] += self.point_embeddings[3].weight[0]
        return pe

    def forward(self, points, labels, masks=None, pad=True):
        sparse = self._embed_points(points, labels, pad=pad)
        if masks is not None:
            dense = self.mask_downscaling(masks)
        else:
            s = self.image_embedding_size
            dense = self.no_mask_embed.weight.reshape(
                1, -1, 1, 1).expand(points.shape[0], -1, s, s)
        return sparse, dense


# ------------------------------------------------------------ mask decoder


class TwinAttention(nn.Module):
    def __init__(self, dim, heads, downsample_rate=1):
        super().__init__()
        self.internal_dim = dim // downsample_rate
        self.num_heads = heads
        self.q_proj = nn.Linear(dim, self.internal_dim)
        self.k_proj = nn.Linear(dim, self.internal_dim)
        self.v_proj = nn.Linear(dim, self.internal_dim)
        self.out_proj = nn.Linear(self.internal_dim, dim)

    def forward(self, q, k, v):
        q, k, v = self.q_proj(q), self.k_proj(k), self.v_proj(v)

        def heads(x):
            b, n, c = x.shape
            return x.reshape(b, n, self.num_heads,
                             c // self.num_heads).transpose(1, 2)
        q, k, v = heads(q), heads(k), heads(v)
        scale = 1.0 / math.sqrt(q.shape[-1])
        attn = torch.softmax(q @ k.transpose(2, 3) * scale, dim=-1)
        out = attn @ v
        b, nh, n, ch = out.shape
        return self.out_proj(out.transpose(1, 2).reshape(b, n, nh * ch))


class TwinTwoWayBlock(nn.Module):
    def __init__(self, dim, heads, mlp_dim, skip_first_layer_pe):
        super().__init__()
        self.self_attn = TwinAttention(dim, heads)
        self.norm1 = nn.LayerNorm(dim)
        self.cross_attn_token_to_image = TwinAttention(
            dim, heads, downsample_rate=2)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = MLPBlock(dim, mlp_dim, act=nn.ReLU)
        self.norm3 = nn.LayerNorm(dim)
        self.norm4 = nn.LayerNorm(dim)
        self.cross_attn_image_to_token = TwinAttention(
            dim, heads, downsample_rate=2)
        self.skip_first_layer_pe = skip_first_layer_pe

    def forward(self, queries, keys, query_pe, key_pe):
        if self.skip_first_layer_pe:
            queries = self.self_attn(queries, queries, queries)
        else:
            q = queries + query_pe
            queries = queries + self.self_attn(q, q, queries)
        queries = self.norm1(queries)
        q = queries + query_pe
        k = keys + key_pe
        queries = self.norm2(
            queries + self.cross_attn_token_to_image(q, k, keys))
        queries = self.norm3(queries + self.mlp(queries))
        q = queries + query_pe
        k = keys + key_pe
        keys = self.norm4(
            keys + self.cross_attn_image_to_token(k, q, queries))
        return queries, keys


class TwinTwoWayTransformer(nn.Module):
    def __init__(self, depth, dim, heads, mlp_dim):
        super().__init__()
        self.layers = nn.ModuleList([
            TwinTwoWayBlock(dim, heads, mlp_dim,
                            skip_first_layer_pe=(i == 0))
            for i in range(depth)])
        self.final_attn_token_to_image = TwinAttention(
            dim, heads, downsample_rate=2)
        self.norm_final_attn = nn.LayerNorm(dim)

    def forward(self, image_embedding, image_pe, point_embedding):
        b, c, h, w = image_embedding.shape
        image_embedding = image_embedding.flatten(2).permute(0, 2, 1)
        image_pe = image_pe.flatten(2).permute(0, 2, 1)
        queries, keys = point_embedding, image_embedding
        for layer in self.layers:
            queries, keys = layer(queries, keys, point_embedding, image_pe)
        q = queries + point_embedding
        k = keys + image_pe
        queries = queries + self.final_attn_token_to_image(q, k, keys)
        return self.norm_final_attn(queries), keys


class MLP(nn.Module):
    def __init__(self, input_dim, hidden_dim, output_dim, num_layers):
        super().__init__()
        dims = [input_dim] + [hidden_dim] * (num_layers - 1)
        self.layers = nn.ModuleList(
            nn.Linear(a, b) for a, b in zip(dims, dims[1:] + [output_dim]))
        self.num_layers = num_layers

    def forward(self, x):
        for i, layer in enumerate(self.layers):
            x = F.relu(layer(x)) if i < self.num_layers - 1 else layer(x)
        return x


class TwinMaskDecoder(nn.Module):
    def __init__(self, dim, depth=2, heads=2, mlp_dim=32,
                 num_multimask=3, iou_head_hidden=16):
        super().__init__()
        self.num_mask_tokens = num_multimask + 1
        self.iou_token = nn.Embedding(1, dim)
        self.mask_tokens = nn.Embedding(self.num_mask_tokens, dim)
        self.transformer = TwinTwoWayTransformer(depth, dim, heads, mlp_dim)
        self.output_upscaling = nn.Sequential(
            nn.ConvTranspose2d(dim, dim // 4, 2, stride=2),
            LayerNorm2d(dim // 4), nn.GELU(),
            nn.ConvTranspose2d(dim // 4, dim // 8, 2, stride=2), nn.GELU())
        self.output_hypernetworks_mlps = nn.ModuleList(
            [MLP(dim, dim, dim // 8, 3)
             for _ in range(self.num_mask_tokens)])
        self.iou_prediction_head = MLP(dim, iou_head_hidden,
                                       self.num_mask_tokens, 3)

    def forward(self, image_embeddings, image_pe, sparse, dense):
        b = sparse.shape[0]
        output_tokens = torch.cat(
            [self.iou_token.weight, self.mask_tokens.weight], dim=0)
        tokens = torch.cat(
            [output_tokens.unsqueeze(0).expand(b, -1, -1), sparse], dim=1)
        src = image_embeddings + dense
        pos_src = image_pe.unsqueeze(0).expand(b, -1, -1, -1)
        bb, c, h, w = src.shape
        hs, src = self.transformer(src, pos_src, tokens)
        iou_token_out = hs[:, 0, :]
        mask_tokens_out = hs[:, 1:1 + self.num_mask_tokens, :]
        src = src.transpose(1, 2).view(bb, c, h, w)
        upscaled = self.output_upscaling(src)
        hyper = torch.stack(
            [self.output_hypernetworks_mlps[i](mask_tokens_out[:, i])
             for i in range(self.num_mask_tokens)], dim=1)
        bb, c, h, w = upscaled.shape
        masks = (hyper @ upscaled.view(bb, c, h * w)).view(bb, -1, h, w)
        iou_pred = self.iou_prediction_head(iou_token_out)
        return masks, iou_pred


class TwinSam(nn.Module):
    """Assembled twin emitting the released-checkpoint key layout."""

    def __init__(self, img_size=64, patch=16, enc_dim=32, enc_depth=3,
                 enc_heads=2, window=2, global_idx=(1,), out_dim=16,
                 dec_heads=2, dec_mlp=32, iou_mlp_dim=16):
        super().__init__()
        grid = img_size // patch
        self.img_size = img_size
        self.image_encoder = TwinImageEncoder(
            img_size, patch, enc_dim, enc_depth, enc_heads, 4.0, out_dim,
            window, global_idx)
        self.prompt_encoder = TwinPromptEncoder(out_dim, grid, img_size)
        self.mask_decoder = TwinMaskDecoder(
            out_dim, heads=dec_heads, mlp_dim=dec_mlp,
            iou_head_hidden=iou_mlp_dim)

    @torch.no_grad()
    def forward(self, image, coords, labels):
        """image [B,3,H,W], coords [B,T,2] (x,y), labels [B,T] ->
        (low-res mask logits [B,4,4S,4S], iou [B,4])."""
        embed = self.image_encoder(image)
        sparse, dense = self.prompt_encoder(coords, labels, pad=False)
        s = self.prompt_encoder.image_embedding_size
        image_pe = self.prompt_encoder.pe_layer((s, s))
        return self.mask_decoder(embed, image_pe, sparse, dense)


def randomize(module, seed=0):
    """Give every parameter/buffer a non-degenerate random value (zero
    pos-embeds/rel-pos tables would hide indexing mistakes)."""
    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.1)
        for b in module.buffers():
            b.copy_(torch.randn(b.shape, generator=gen))
    return module
