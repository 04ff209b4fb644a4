"""Sparse 3D convolution for TPU: host coordinate plans + device gather-GEMM.

MinkowskiEngine (reference mink.py:1, C++/CUDA hash maps at runtime) is
replaced by a two-phase design that fits XLA's static-shape model:

  * on host, a `VoxelPlan` is built once per input from integer coordinates
    alone: per-level voxel tables, 27-neighbor maps for kernel-3 convs,
    8-child maps for stride-2 down convs, and parent/offset maps for
    stride-2 transposed convs. All index arrays are padded to static bucket
    sizes with a sentinel row.
  * on device, every sparse conv is one gather + one [V, K*Ci] x [K*Ci, Co]
    GEMM -- pure MXU work, batchable and differentiable.

Kernel offset order: lexicographic np.ndindex over the kernel cube
((-1,-1,-1) .. (1,1,1) for k=3; (0,0,0) .. (1,1,1) for k=2).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

K3_OFFSETS = np.array([(i - 1, j - 1, k - 1)
                       for i, j, k in np.ndindex(3, 3, 3)], np.int64)
K2_OFFSETS = np.array(list(np.ndindex(2, 2, 2)), np.int64)


def _keys(coords: np.ndarray, dims: np.ndarray) -> np.ndarray:
    return (coords[:, 0] * dims[1] + coords[:, 1]) * dims[2] + coords[:, 2]


def _lookup(table_keys_sorted, order, query_keys, sentinel):
    """Index of each query key in the table (sentinel where absent)."""
    pos = np.searchsorted(table_keys_sorted, query_keys)
    pos = np.clip(pos, 0, len(table_keys_sorted) - 1)
    hit = table_keys_sorted[pos] == query_keys
    return np.where(hit, order[pos], sentinel)


@dataclass
class LevelPlan:
    coords: np.ndarray      # [V, 3] int64 (units of this level's stride)
    num: int                # real voxels (<= V)
    nbr3: np.ndarray        # [V, 27] neighbor index (V = sentinel/missing)
    child: np.ndarray | None     # [V_next, 8] -> this level (down conv)
    parent: np.ndarray | None    # [V] -> next level index (up conv)
    parent_off: np.ndarray | None  # [V] which of the 8 offsets


@dataclass
class VoxelPlan:
    levels: list            # 5 LevelPlan: stride 1, 2, 4, 8, 16
    point_voxel: np.ndarray  # [N] point -> level-0 voxel
    num_points: int
    origin: np.ndarray | None = None  # integer coord shift applied at build


def _pad_rows(a: np.ndarray, v: int, fill) -> np.ndarray:
    out = np.full((v,) + a.shape[1:], fill, a.dtype)
    out[:len(a)] = a
    return out


def plan_level_counts(coords_int: np.ndarray, num_levels: int = 5) -> list:
    """Occupied-voxel count per level for the given level-0 integer coords.

    Cheap pre-scan (np.unique per level, no neighbor maps) used to pick
    uniform static level widths across a whole dataset, so every sample
    shares ONE compiled executable (XLA recompiles per distinct shape set;
    data-dependent widths would mean one compile per chunk).

    Mirrors build_plan exactly: coords are shifted to their per-axis min
    before the stride-2 halvings, because //2 grouping depends on the
    origin parity (unshifted counts disagree with build_plan on ~half of
    random samples at levels >= 1)."""
    coords_int = np.asarray(coords_int, np.int64)
    coords_int = coords_int - coords_int.min(axis=0)
    cur = np.unique(coords_int, axis=0)
    counts = []
    for lvl in range(num_levels):
        counts.append(len(cur))
        if lvl + 1 < num_levels:
            cur = np.unique(cur // 2, axis=0)
    return counts


def level_budget(nominal: int, count: int) -> int:
    """Static width for a level: the nominal power-of-two budget, doubled
    until it fits `count` occupied voxels."""
    b = max(nominal, 64)
    while b < count:
        b *= 2
    return b


def build_plan(coords_int: np.ndarray, v0: int, num_levels: int = 5,
               level_widths: list | None = None) -> VoxelPlan:
    """Build the multi-level coordinate plan from level-0 integer coords.

    v0: static voxel budget of level 0; level l gets v0 >> l (sparse LiDAR
    occupancy roughly halves per stride-2 level). level_widths (optional):
    fixed per-level minimum widths (from plan_level_counts over a dataset)
    so all samples share one padded shape set; a sample that still exceeds
    a fixed width grows to the next power of two (rare recompile, never
    wrong).
    """
    coords_int = np.asarray(coords_int, np.int64)
    origin = coords_int.min(axis=0)
    coords_int = coords_int - origin  # nonnegative

    def budget(nominal, count, lvl):
        if level_widths is not None:
            nominal = max(nominal, level_widths[lvl])
        return level_budget(nominal, count)

    levels = []
    cur, point_voxel = np.unique(coords_int, axis=0, return_inverse=True)
    pv = point_voxel
    for lvl in range(num_levels):
        v = budget(v0 >> lvl, len(cur), lvl)
        dims = cur.max(axis=0) + 2
        keys = _keys(cur, dims)
        order = np.argsort(keys)
        skeys = keys[order]

        # 27-neighborhood map (kernel-3 stride-1 convs at this level)
        nbr = np.empty((len(cur), 27), np.int64)
        for o, off in enumerate(K3_OFFSETS):
            q = cur + off
            ok = np.all((q >= 0) & (q < dims), axis=1)
            qk = _keys(np.clip(q, 0, dims - 1), dims)
            hit = _lookup(skeys, order, qk, v)
            nbr[:, o] = np.where(ok, hit, v)

        plan = LevelPlan(coords=_pad_rows(cur, v, 0), num=len(cur),
                         nbr3=_pad_rows(nbr, v, v).astype(np.int32),
                         child=None, parent=None, parent_off=None)

        if lvl + 1 < num_levels:
            nxt, parent = np.unique(cur // 2, axis=0, return_inverse=True)
            v_next = budget(v0 >> (lvl + 1), len(nxt), lvl + 1)
            # children map: for each next-level voxel, its 8 fine voxels
            child = np.full((len(nxt), 8), v, np.int64)
            rel = cur - nxt[parent] * 2                 # (0|1)^3 per voxel
            off_id = rel[:, 0] * 4 + rel[:, 1] * 2 + rel[:, 2]
            child[parent, off_id] = np.arange(len(cur))
            plan.child = _pad_rows(child, v_next, v).astype(np.int32)
            plan.parent = _pad_rows(parent, v, len(nxt)).astype(np.int32)
            plan.parent_off = _pad_rows(off_id, v, 0).astype(np.int32)
            cur = nxt

        levels.append(plan)

    return VoxelPlan(levels=levels, point_voxel=pv.astype(np.int32),
                     num_points=len(coords_int), origin=origin)


# ------------------------------------------------------------- device ops


def _gc_impl(feats, nbr, weights, compute_dtype):
    """scan over kernel taps: per-tap row gather + [V,Ci]x[Ci,Co] GEMM.

    Peak temp O(V*(Ci+Co)) instead of the [V, K, Ci] gather a single
    flattened GEMM materializes (1.3 GB per level-0 conv at 64k voxels;
    the dominant HBM cost of MaskPLS training)."""
    ci = feats.shape[1]
    vout, k = nbr.shape
    co = weights.shape[-1]
    ext = jnp.concatenate([feats, jnp.zeros((1, ci), feats.dtype)], axis=0)

    def body(acc, xs):
        nbr_k, w_k = xs
        g = ext[nbr_k].astype(compute_dtype)
        return acc + jax.lax.dot_general(
            g, w_k.astype(compute_dtype),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32), None

    acc0 = jnp.zeros((vout, co), jnp.float32)
    out, _ = jax.lax.scan(body, acc0, (nbr.T, weights))
    return out


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _gather_conv_vjp(feats, nbr, weights, compute_dtype):
    return _gc_impl(feats, nbr, weights, compute_dtype)


def gather_conv(feats: jax.Array, nbr: jax.Array, weights: jax.Array,
                compute_dtype=jnp.float32) -> jax.Array:
    """Sparse conv: out[v] = sum_k W[k] @ feats[nbr[v,k]] (missing -> 0).

    feats [V, Ci], nbr [V, K] with sentinel V, weights [K, Ci, Co]; with
    compute_dtype=bfloat16 the GEMMs run native-bf16 on the MXU with f32
    accumulation. Custom VJP: the backward re-gathers per tap instead of
    storing the [V, K, Ci] gather (flash-style recompute), so training
    memory is O(V*C) regardless of K."""
    return _gather_conv_vjp(feats, nbr, weights,
                            jnp.dtype(compute_dtype).name)


def _gc_fwd(feats, nbr, weights, compute_dtype):
    # (nondiff args reach fwd at their ORIGINAL positions; only bwd gets
    # them as leading arguments)
    return _gc_impl(feats, nbr, weights, compute_dtype), (feats, nbr,
                                                          weights)


def _gc_bwd(compute_dtype, res, dout):
    feats, nbr, weights = res
    ci = feats.shape[1]
    ext = jnp.concatenate([feats, jnp.zeros((1, ci), feats.dtype)], axis=0)
    dout_c = dout.astype(compute_dtype)

    def body(dext, xs):
        nbr_k, w_k = xs
        g = ext[nbr_k].astype(compute_dtype)                  # [Vout, Ci]
        dw_k = jax.lax.dot_general(                           # [Ci, Co]
            g, dout_c, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dg = jax.lax.dot_general(                             # [Vout, Ci]
            dout_c, w_k.astype(compute_dtype),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        return dext.at[nbr_k].add(dg), dw_k

    dext0 = jnp.zeros((feats.shape[0] + 1, ci), jnp.float32)
    dext, dws = jax.lax.scan(body, dext0, (nbr.T, weights))
    dnbr = np.zeros(nbr.shape, jax.dtypes.float0)
    return (dext[:-1].astype(feats.dtype), dnbr,
            dws.astype(weights.dtype))


_gather_conv_vjp.defvjp(_gc_fwd, _gc_bwd)


def down_conv(feats: jax.Array, child: jax.Array, weights: jax.Array,
              compute_dtype=jnp.float32) -> jax.Array:
    """Stride-2 kernel-2 conv: gather the 8 children of each coarse voxel."""
    return gather_conv(feats, child, weights, compute_dtype)


def up_conv(feats_coarse: jax.Array, parent: jax.Array,
            parent_off: jax.Array, weights: jax.Array) -> jax.Array:
    """Stride-2 kernel-2 transposed conv: each fine voxel reads its parent
    through the kernel tap matching its (0|1)^3 position.

    feats_coarse [Vc, Ci], parent [Vf] (sentinel Vc), parent_off [Vf],
    weights [8, Ci, Co]. Computed as 8 full GEMMs masked per tap: the
    per-voxel-kernel form `einsum(g, weights[parent_off])` materializes a
    [Vf, Ci, Co] tensor in the backward pass (8 GB at 32k x 256 x 256),
    while the masked accumulation's residual is just g [Vf, Ci]."""
    vc, ci = feats_coarse.shape
    ext = jnp.concatenate([feats_coarse, jnp.zeros((1, ci),
                                                   feats_coarse.dtype)], 0)
    g = ext[parent]                               # [Vf, Ci]
    out = jnp.zeros((parent.shape[0], weights.shape[-1]), jnp.float32)
    for o in range(weights.shape[0]):
        sel = (parent_off == o).astype(g.dtype)[:, None]
        out = out + sel * jax.lax.dot_general(
            g, weights[o], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    return out


def voxelize_features(point_feats: jax.Array, point_voxel: jax.Array,
                      point_valid: jax.Array, num_voxels: int) -> jax.Array:
    """UNWEIGHTED_AVERAGE quantization (reference mink.py:156-164):
    voxel feature = mean of its points' features."""
    w = point_valid.astype(point_feats.dtype)
    sums = jax.ops.segment_sum(point_feats * w[:, None], point_voxel,
                               num_segments=num_voxels)
    cnt = jax.ops.segment_sum(w, point_voxel, num_segments=num_voxels)
    return sums / jnp.maximum(cnt, 1.0)[:, None]


def knn_up(vox_coords: jax.Array, vox_valid: jax.Array, vox_feats: jax.Array,
           pt_coords: jax.Array, k: int = 3) -> jax.Array:
    """Inverse-distance k-NN interpolation voxel->points
    (reference utils/interpolate.py:9-45; note the reference's KeOps kNN
    returns SQUARED distances and weights by their reciprocal -- kept)."""
    from autoinst_tpu.ops.neighbors import knn_bruteforce
    idx, d2 = knn_bruteforce(pt_coords, vox_coords, k, ref_valid=vox_valid)
    w = 1.0 / (d2 + 1e-8)
    w = w / jnp.sum(w, axis=1, keepdims=True)
    return jnp.sum(vox_feats[idx] * w[:, :, None], axis=1)


def knn_up_grid(vox_coords: jax.Array, vox_feats: jax.Array,
                pt_coords: jax.Array, pt_voxel: jax.Array, nbr3: jax.Array,
                cell=None, k: int = 3) -> jax.Array:
    """Grid-accelerated kNN-up: O(N*27) instead of the O(N*V) brute force.

    Candidate neighbors for each point are the 27-neighborhood (`nbr3`) of
    the point's containing voxel at this level -- which is occupied by
    construction (voxels exist exactly where points are). Exact k-NN
    whenever >= k occupied voxels lie in that 3^3 cube; in sparser
    neighborhoods it degenerates toward the available candidates, whose
    missing far-away alternatives carry negligible 1/d^2 weight.

    vox_coords [V,3] meters; vox_feats [V,C]; pt_coords [N,3];
    pt_voxel [N] containing-voxel index at this level (sentinel >= V for
    padded points -- their output is garbage and masked downstream);
    nbr3 [V,27] neighbor map with sentinel V; cell (optional scalar) voxel
    edge length in meters -- when given, candidate corner positions are
    the containing corner plus the fixed 27 offsets (one [N,3] gather)
    instead of a [N,27,3] neighbor-coords gather (tiny misaligned rows,
    the dominant cost of this op on TPU).
    """
    v, c = vox_feats.shape
    pv = jnp.minimum(pt_voxel, v - 1)
    cand = nbr3[pv]                                     # [N, 27]
    if cell is None:
        coords_ext = jnp.concatenate(
            [vox_coords, jnp.zeros((1, 3), vox_coords.dtype)], axis=0)
        cc = coords_ext[cand]                           # [N, 27, 3]
        d2 = jnp.sum((pt_coords[:, None, :] - cc) ** 2, axis=-1)
    else:
        base = vox_coords[pv]                           # [N, 3]
        offs = jnp.asarray(K3_OFFSETS, vox_coords.dtype) * cell  # [27, 3]
        diff = (pt_coords - base)[:, None, :] - offs[None]
        d2 = jnp.sum(diff * diff, axis=-1)
    d2 = jnp.where(cand >= v, jnp.inf, d2)              # missing neighbors
    neg, sel = jax.lax.top_k(-d2, k)
    idx = jnp.take_along_axis(cand, sel, axis=1)        # [N, k]
    w = 1.0 / (-neg + 1e-8)                             # inf distance -> 0
    # padded points land on a pad voxel whose nbr3 is all-sentinel: w sums
    # to 0 there; the guard yields 0 output instead of 0/0 = NaN
    w = w / jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-30)
    feats_ext = jnp.concatenate(
        [vox_feats, jnp.zeros((1, c), vox_feats.dtype)], axis=0)
    return jnp.sum(feats_ext[jnp.minimum(idx, v)] * w[:, :, None], axis=1)


def quantize_points(points: np.ndarray, res: float) -> np.ndarray:
    """Level-0 integer coordinates (ME TensorField quantization, mink.py:156)."""
    return np.floor(np.asarray(points, np.float64) / res).astype(np.int64)


def plans_to_batch(plans: list, points_list: list, feats_list: list,
                   res: float, n_points: int) -> dict:
    """Stack per-sample plans + point data into one static-shape device batch.

    Points are padded to n_points; padded points map to the sentinel voxel
    and are marked invalid. Voxel features are the UNWEIGHTED_AVERAGE of
    their points' features, computed on device in the model entry instead
    (here we just ship the maps).
    """
    B = len(plans)
    num_levels = len(plans[0].levels)

    def repad(a, width, fill):
        out = np.full((width,) + a.shape[1:], fill, a.dtype)
        out[:len(a)] = a
        return out

    widths = [max(p.levels[l].coords.shape[0] for p in plans)
              for l in range(num_levels)]
    levels = []
    for l in range(num_levels):
        v = widths[l]
        nbr3 = []
        for p in plans:
            old_v = p.levels[l].coords.shape[0]
            n = p.levels[l].nbr3.copy()
            n[n == old_v] = v  # remap sentinel to the batch-padded width
            nbr3.append(repad(n, v, v))
        entry = {
            "nbr3": np.stack(nbr3),
            "valid": np.stack([
                np.arange(v) < p.levels[l].num for p in plans]),
            "coords": np.stack([
                repad((p.levels[l].coords * (2 ** l) + p.origin) * res,
                      v, 0.0) for p in plans]).astype(np.float32),
            # voxel edge length in meters at this level (knn_up_grid
            # derives candidate corner positions arithmetically from the
            # containing voxel instead of gathering 27 neighbor coords)
            "cell": np.float32(res * (2 ** l)),
        }
        if plans[0].levels[l].child is not None:
            vn = widths[l + 1]
            child, parent, poff = [], [], []
            for p in plans:
                old_v = p.levels[l].coords.shape[0]
                c = p.levels[l].child.copy()
                c[c == old_v] = v
                child.append(repad(c, vn, v))
                # parent fill rows point at padded (zero-feature) coarse rows
                parent.append(repad(p.levels[l].parent, v,
                                    p.levels[l].parent.max(initial=0)))
                poff.append(repad(p.levels[l].parent_off, v, 0))
            entry["child"] = np.stack(child)
            entry["parent"] = np.stack(parent)
            entry["parent_off"] = np.stack(poff)
        levels.append(entry)

    v0 = widths[0]
    fdim = feats_list[0].shape[1]
    pt_coords = np.zeros((B, n_points, 3), np.float32)
    pt_feats = np.zeros((B, n_points, fdim), np.float32)
    pt_valid = np.zeros((B, n_points), bool)
    point_voxel = np.full((B, n_points), v0, np.int32)
    for b, (plan, pts, fts) in enumerate(zip(plans, points_list, feats_list)):
        n = min(len(pts), n_points)
        pt_coords[b, :n] = pts[:n, :3]
        pt_feats[b, :n] = fts[:n]
        pt_valid[b, :n] = True
        point_voxel[b, :n] = plan.point_voxel[:n]
    return {
        "levels": levels,
        "pt_coords": pt_coords,
        "pt_feats": pt_feats,
        "pt_valid": pt_valid,
        "point_voxel": point_voxel,
    }
