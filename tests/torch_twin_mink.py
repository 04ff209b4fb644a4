"""Torch twin of the reference MaskPLS network, as a converter test oracle.

Independent torch reimplementation of the reference MinkEncoderDecoder +
MaskedTransformerDecoder (self-training/mask_pls/models/mink.py:9-263,
decoder.py:8-164, blocks.py:9-138, positional_encoder.py:7-41) with the
MinkowskiEngine sparse convolutions hand-rolled from coordinates:

  * kernel parameters are stored exactly like ME: `kernel` of shape
    [K, Ci, Co], offsets enumerated with the FIRST spatial axis fastest
    (ME KernelRegion / RegionIterator odometer order; e.g. for kernel 3:
    (-1,-1,-1), (0,-1,-1), (1,-1,-1), (-1,0,-1), ...).
  * kernel_size=2 stride=2 convs aggregate children at offsets {0,1}^3 in
    fine-coordinate units; the transpose conv scatters each coarse voxel
    back to its {0,1}^3 children (the coordinate-manager-cached fine
    coords), which for kernel 2 means exactly one parent per fine voxel.
  * module naming matches the reference state_dict so that
    `twin.state_dict()` feeds torch_convert.convert_state_dict directly.

The twin lets tests verify the torch->flax converter numerically without
MinkowskiEngine: both models consume the same voxelization (floor
quantization, min-shifted coords), so any converter permutation/transpose
mistake shows up as forward divergence. The single remaining assumption
NOT verifiable offline is ME's region enumeration order itself (the twin
asserts what the converter assumes); docs/PARITY.md documents how to pin
it against a real released checkpoint.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

CS = (32, 32, 64, 128, 256, 256, 128, 96, 96)

# ME hypercube region: first axis fastest
ME_K3 = [(i, j, k) for k in (-1, 0, 1) for j in (-1, 0, 1)
         for i in (-1, 0, 1)]
ME_K2 = [(i, j, k) for k in (0, 1) for j in (0, 1) for i in (0, 1)]


def build_maps(coords0: np.ndarray, num_levels: int = 5):
    """Per-level absolute coords + lookup dicts (independent of sparse.py).

    coords0: [V0, 3] int64 level-0 coords (already min-shifted, like
    build_plan). Level l coords are multiples of 2**l.
    """
    levels = []
    cur = np.unique(coords0, axis=0)
    for lvl in range(num_levels):
        stride = 2 ** lvl
        cmap = {tuple(c): i for i, c in enumerate(cur.tolist())}
        levels.append({"coords": cur, "stride": stride, "map": cmap})
        if lvl + 1 < num_levels:
            nxt = np.unique((cur // (2 * stride)) * (2 * stride), axis=0)
            cur = nxt
    return levels


class TwinSparseConv(nn.Module):
    """MinkowskiConvolution(kernel_size=3, stride=1) twin."""

    def __init__(self, ci, co):
        super().__init__()
        self.kernel = nn.Parameter(torch.randn(27, ci, co) * 0.05)

    def forward(self, feats, level):
        coords, cmap, s = level["coords"], level["map"], level["stride"]
        out = feats.new_zeros(len(coords), self.kernel.shape[-1])
        for k, off in enumerate(ME_K3):
            src, dst = [], []
            for i, c in enumerate(coords.tolist()):
                j = cmap.get((c[0] + off[0] * s, c[1] + off[1] * s,
                              c[2] + off[2] * s))
                if j is not None:
                    dst.append(i)
                    src.append(j)
            if src:
                out[dst] += feats[src] @ self.kernel[k]
        return out


class TwinDownConv(nn.Module):
    """MinkowskiConvolution(kernel_size=2, stride=2) twin."""

    def __init__(self, ci, co):
        super().__init__()
        self.kernel = nn.Parameter(torch.randn(8, ci, co) * 0.05)

    def forward(self, feats, level_in, level_out):
        s = level_in["stride"]
        out = feats.new_zeros(len(level_out["coords"]),
                              self.kernel.shape[-1])
        for k, off in enumerate(ME_K2):
            src, dst = [], []
            for i, c in enumerate(level_out["coords"].tolist()):
                j = level_in["map"].get((c[0] + off[0] * s,
                                         c[1] + off[1] * s,
                                         c[2] + off[2] * s))
                if j is not None:
                    dst.append(i)
                    src.append(j)
            if src:
                out[dst] += feats[src] @ self.kernel[k]
        return out


class TwinUpConv(nn.Module):
    """MinkowskiConvolutionTranspose(kernel_size=2, stride=2) twin: fine
    output u receives W[k(u - v)] @ in[v] from its unique coarse parent v
    (output coords = the cached finer-level coords)."""

    def __init__(self, ci, co):
        super().__init__()
        self.kernel = nn.Parameter(torch.randn(8, ci, co) * 0.05)

    def forward(self, feats, level_in, level_out):
        s = level_out["stride"]  # fine stride
        out = feats.new_zeros(len(level_out["coords"]),
                              self.kernel.shape[-1])
        for k, off in enumerate(ME_K2):
            src, dst = [], []
            for i, c in enumerate(level_out["coords"].tolist()):
                v = (c[0] - off[0] * s, c[1] - off[1] * s, c[2] - off[2] * s)
                if (v[0] % (2 * s) == 0 and v[1] % (2 * s) == 0
                        and v[2] % (2 * s) == 0):
                    j = level_in["map"].get(v)
                    if j is not None:
                        dst.append(i)
                        src.append(j)
            if src:
                out[dst] += feats[src] @ self.kernel[k]
        return out


class TwinConv1(nn.Module):
    """MinkowskiConvolution(kernel_size=1) twin (residual downsample)."""

    def __init__(self, ci, co):
        super().__init__()
        self.kernel = nn.Parameter(torch.randn(ci, co) * 0.05)

    def forward(self, feats, *_):
        return feats @ self.kernel


class MEBatchNorm(nn.Module):
    """MinkowskiBatchNorm twin (owns `.bn`, matching the state dict)."""

    def __init__(self, c):
        super().__init__()
        self.bn = nn.BatchNorm1d(c)

    def forward(self, feats):
        return self.bn(feats)


class TwinResidualBlock(nn.Module):
    def __init__(self, ci, co):
        super().__init__()
        self.net = nn.ModuleList([
            TwinSparseConv(ci, co), MEBatchNorm(co), nn.Identity(),
            TwinSparseConv(co, co), MEBatchNorm(co)])
        self.downsample = (nn.ModuleList()
                           if ci == co else
                           nn.ModuleList([TwinConv1(ci, co),
                                          MEBatchNorm(co)]))

    def forward(self, x, level):
        h = self.net[1](self.net[0](x, level))
        h = F.relu(h)
        h = self.net[4](self.net[3](h, level))
        skip = x
        if len(self.downsample):
            skip = self.downsample[1](self.downsample[0](x))
        return F.relu(h + skip)


class TwinDownBlock(nn.Module):
    """BasicConvolutionBlock twin: k2 s2 conv + BN + act."""

    def __init__(self, ci, co, act):
        super().__init__()
        self.net = nn.ModuleList([TwinDownConv(ci, co), MEBatchNorm(co)])
        self.act = act

    def forward(self, x, level_in, level_out):
        return self.act(self.net[1](self.net[0](x, level_in, level_out)))


class TwinUpBlock(nn.Module):
    """BasicDeconvolutionBlock twin."""

    def __init__(self, ci, co, act):
        super().__init__()
        self.net = nn.ModuleList([TwinUpConv(ci, co), MEBatchNorm(co)])
        self.act = act

    def forward(self, x, level_in, level_out):
        return self.act(self.net[1](self.net[0](x, level_in, level_out)))


def knn_up_torch(v_coor, v_feats, p_coor, k=3):
    """Reference knn_up (utils/interpolate.py:9-45): squared distances,
    reciprocal weights."""
    d2 = torch.cdist(p_coor, v_coor) ** 2
    kk = min(k, v_coor.shape[0])
    dists, idx = torch.topk(d2, kk, dim=1, largest=False)
    w = 1.0 / (dists + 1e-8)
    w = w / w.sum(dim=1, keepdim=True)
    return (v_feats[idx] * w[..., None]).sum(dim=1)


class TwinMinkUNet(nn.Module):
    """MinkEncoderDecoder twin (MaskPLS layout) / TARL MinkUNet twin.

    heads=False, relu_updown=True reproduces the TARL MinkUNet
    (Pointcloud-Models/tarl/minkunet.py:82-199; returns y4 voxel feats).
    """

    def __init__(self, input_dim=4, heads=True, relu_updown=False,
                 res=0.1, knn_k=3):
        super().__init__()
        cs = CS
        self.res = res
        self.knn_k = knn_k
        self.heads = heads
        act = F.relu if relu_updown else (lambda x: F.leaky_relu(x, 0.01))
        self.stem = nn.ModuleList([
            TwinSparseConv(input_dim, cs[0]), MEBatchNorm(cs[0]),
            nn.Identity(),
            TwinSparseConv(cs[0], cs[0]), MEBatchNorm(cs[0])])
        chans = [(cs[0], cs[1]), (cs[1], cs[2]), (cs[2], cs[3]),
                 (cs[3], cs[4])]
        for s, (ci, co) in enumerate(chans, start=1):
            self.add_module(f"stage{s}", nn.ModuleList([
                TwinDownBlock(ci, ci, act),
                TwinResidualBlock(ci, co),
                TwinResidualBlock(co, co)]))
        ups = [(cs[4], cs[5], cs[3]), (cs[5], cs[6], cs[2]),
               (cs[6], cs[7], cs[1]), (cs[7], cs[8], cs[0])]
        for u, (ci, co, skip) in enumerate(ups, start=1):
            self.add_module(f"up{u}", nn.ModuleList([
                TwinUpBlock(ci, co, act),
                nn.ModuleList([TwinResidualBlock(co + skip, co),
                               TwinResidualBlock(co, co)])]))
        if heads:
            self.sem_head = nn.Linear(cs[8], 1)
            levels = [cs[-i] for i in range(4, 0, -1)]
            self.out_bnorm = nn.ModuleList(
                [nn.BatchNorm1d(c) for c in levels])

    def forward(self, vox_feats, levels, pts=None, origin=None):
        """vox_feats [V0, Cin] torch; levels from build_maps; pts [N, 3]
        original metric points (heads mode); origin the int shift that was
        subtracted from the quantized coords."""
        x = self.stem[1](self.stem[0](vox_feats, levels[0]))
        x = F.relu(x)
        x0 = F.relu(self.stem[4](self.stem[3](x, levels[0])))

        def stage(mod, x, li, lo):
            h = mod[0](x, levels[li], levels[lo])
            h = mod[1](h, levels[lo])
            return mod[2](h, levels[lo])

        x1 = stage(self.stage1, x0, 0, 1)
        x2 = stage(self.stage2, x1, 1, 2)
        x3 = stage(self.stage3, x2, 2, 3)
        x4 = stage(self.stage4, x3, 3, 4)

        def up(mod, x, skip, li, lo):
            h = mod[0](x, levels[li], levels[lo])
            h = torch.cat([h, skip], dim=-1)
            h = mod[1][0](h, levels[lo])
            return mod[1][1](h, levels[lo])

        y1 = up(self.up1, x4, x3, 4, 3)
        y2 = up(self.up2, y1, x2, 3, 2)
        y3 = up(self.up3, y2, x1, 2, 1)
        y4 = up(self.up4, y3, x0, 1, 0)

        if not self.heads:
            return y4

        # knn-up each level to points + out BN (reference mink.py:130-147);
        # voxel coords: absolute ints (+origin shift-back) * res
        feats = []
        for lvl_id, vf, bn in ((3, y1, self.out_bnorm[0]),
                               (2, y2, self.out_bnorm[1]),
                               (1, y3, self.out_bnorm[2]),
                               (0, y4, self.out_bnorm[3])):
            vc = torch.as_tensor(
                (levels[lvl_id]["coords"] + origin) * self.res,
                dtype=torch.float32)
            pf = knn_up_torch(vc, vf, pts, self.knn_k)
            feats.append(bn(pf))
        logits = self.sem_head(feats[-1])
        return feats, logits


class TwinPositionalEncoder(nn.Module):
    def __init__(self, feat_size=256, max_freq=10000.0, base=2.0, dim=3):
        super().__init__()
        self.num_bands = math.floor(feat_size / dim / 2)
        self.max_freq, self.base = max_freq, base
        self.pad = feat_size - self.num_bands * 2 * dim

    def forward(self, x):
        x = x.clone()
        x[:, :, 0] = x[:, :, 0] / 48
        x[:, :, 1] = x[:, :, 1] / 48
        x[:, :, 2] = x[:, :, 2] / 4
        x = x.unsqueeze(-1)
        scales = torch.logspace(
            0.0, math.log(self.max_freq / 2) / math.log(self.base),
            self.num_bands, base=self.base, dtype=x.dtype)
        x = x * scales * math.pi
        x = torch.cat([x.sin(), x.cos()], dim=-1).flatten(2)
        return F.pad(x, (self.pad, 0))


class TwinSelfAttentionLayer(nn.Module):
    def __init__(self, d, h):
        super().__init__()
        self.self_attn = nn.MultiheadAttention(d, h, batch_first=True)
        self.norm = nn.LayerNorm(d)

    def forward(self, q_embed, query_pos):
        q = k = q_embed + query_pos
        h = self.self_attn(q, k, q_embed, need_weights=False)[0]
        return self.norm(q_embed + h)


class TwinCrossAttentionLayer(nn.Module):
    def __init__(self, d, h):
        super().__init__()
        self.multihead_attn = nn.MultiheadAttention(d, h, batch_first=True)
        self.norm = nn.LayerNorm(d)

    def forward(self, q_embed, mem, attn_mask, padding_mask, pos,
                query_pos):
        qn = self.norm(q_embed)
        h = self.multihead_attn(
            qn + query_pos, mem + pos, mem + pos, attn_mask=attn_mask,
            key_padding_mask=padding_mask, need_weights=False)[0]
        return q_embed + h


class TwinFFNLayer(nn.Module):
    def __init__(self, d, ffn):
        super().__init__()
        self.linear1 = nn.Linear(d, ffn)
        self.linear2 = nn.Linear(ffn, d)
        self.norm = nn.LayerNorm(d)

    def forward(self, x):
        h = self.norm(x)
        return x + self.linear2(F.relu(self.linear1(h)))


class TwinMLP(nn.Module):
    def __init__(self, d, out, n=3):
        super().__init__()
        self.layers = nn.ModuleList(
            [nn.Linear(d, d) for _ in range(n - 1)] + [nn.Linear(d, out)])

    def forward(self, x):
        for i, l in enumerate(self.layers):
            x = F.relu(l(x)) if i < len(self.layers) - 1 else l(x)
        return x


class TwinDecoder(nn.Module):
    """MaskedTransformerDecoder twin (decoder.py:8-164)."""

    def __init__(self, hidden=256, heads=8, ffn=1024, levels=3, blocks=3,
                 queries=40):
        super().__init__()
        self.nheads = heads
        self.num_layers = levels * blocks
        self.num_feature_levels = levels
        self.pe_layer = TwinPositionalEncoder(hidden)
        self.transformer_self_attention_layers = nn.ModuleList(
            [TwinSelfAttentionLayer(hidden, heads)
             for _ in range(self.num_layers)])
        self.transformer_cross_attention_layers = nn.ModuleList(
            [TwinCrossAttentionLayer(hidden, heads)
             for _ in range(self.num_layers)])
        self.transformer_ffn_layers = nn.ModuleList(
            [TwinFFNLayer(hidden, ffn) for _ in range(self.num_layers)])
        self.decoder_norm = nn.LayerNorm(hidden)
        self.query_feat = nn.Embedding(queries, hidden)
        self.query_embed = nn.Embedding(queries, hidden)
        self.level_embed = nn.Embedding(levels, hidden)  # unused (parity)
        self.mask_feat_proj = nn.Linear(CS[8], hidden)
        in_ch = [CS[4], CS[6], CS[7]]
        self.input_proj = nn.ModuleList(
            [nn.Sequential() if c == hidden else nn.Linear(c, hidden)
             for c in in_ch])
        self.class_embed = nn.Linear(hidden, 2)
        self.mask_embed = TwinMLP(hidden, hidden, 3)

    def pred_heads(self, output, mask_features, pad_mask):
        d = self.decoder_norm(output)
        out_cls = self.class_embed(d)
        emb = self.mask_embed(d)
        out_mask = torch.einsum("bqc,bpc->bpq", emb, mask_features)
        attn = (out_mask.sigmoid() < 0.5).detach().bool()
        attn[pad_mask] = True
        attn = (attn.unsqueeze(1).repeat(1, self.nheads, 1, 1)
                .flatten(0, 1).permute(0, 2, 1))
        return out_cls, out_mask, attn

    def forward(self, feats, coors, pad_masks):
        # feats [y1..y4]; finest (y4) -> mask features
        mask_features = (self.mask_feat_proj(feats[-1])
                         + self.pe_layer(coors[-1]))
        last_pad = pad_masks[-1]
        src = [self.input_proj[i](feats[i])
               for i in range(self.num_feature_levels)]
        pos = [self.pe_layer(coors[i])
               for i in range(self.num_feature_levels)]
        bs = src[0].shape[0]
        query_embed = self.query_embed.weight.unsqueeze(0).repeat(bs, 1, 1)
        output = self.query_feat.weight.unsqueeze(0).repeat(bs, 1, 1)

        out_cls, out_mask, attn_mask = self.pred_heads(
            output, mask_features, last_pad)
        for i in range(self.num_layers):
            lvl = i % self.num_feature_levels
            attn_mask[attn_mask.sum(-1) == attn_mask.shape[-1]] = False
            output = self.transformer_cross_attention_layers[i](
                output, src[lvl], attn_mask, pad_masks[lvl], pos[lvl],
                query_embed)
            output = self.transformer_self_attention_layers[i](
                output, query_embed)
            output = self.transformer_ffn_layers[i](output)
            out_cls, out_mask, attn_mask = self.pred_heads(
                output, mask_features, last_pad)
        return {"pred_logits": out_cls, "pred_masks": out_mask}


class TwinMaskPS(nn.Module):
    def __init__(self, queries=40, res=0.1):
        super().__init__()
        self.backbone = TwinMinkUNet(input_dim=4, heads=True, res=res)
        self.decoder = TwinDecoder(queries=queries)

    def forward(self, vox_feats, levels, pts, origin):
        feats, logits = self.backbone(vox_feats, levels, pts, origin)
        b_feats = [f.unsqueeze(0) for f in feats]
        coors = [pts.unsqueeze(0)] * 4
        pad = [torch.zeros(1, pts.shape[0], dtype=torch.bool)] * 4
        out = self.decoder(b_feats, coors, pad)
        return out, logits


def voxelize_mean(feats: torch.Tensor, point_voxel: np.ndarray, nv: int):
    """ME TensorField UNWEIGHTED_AVERAGE: mean of point feats per voxel."""
    out = feats.new_zeros(nv, feats.shape[1])
    cnt = feats.new_zeros(nv)
    idx = torch.as_tensor(point_voxel, dtype=torch.long)
    out.index_add_(0, idx, feats)
    cnt.index_add_(0, idx, torch.ones(len(feats)))
    return out / cnt.clamp(min=1).unsqueeze(1)
