"""Fused pairwise affinity-matrix construction (Pallas TPU kernel + XLA path).

The reference builds the chunk graph as a chain of dense numpy O(N^2) passes:
`cdist` spatial distances, a proximity mask, then elementwise products of
exponential terms for TARL / DINO / SAM feature distances
(reference: pipeline/ncuts/ncuts_utils.py:60-156, image_utils.py:64-89).

Here the whole thing is one tiled kernel: each (TI, TJ) tile computes

    A = [d_xyz <= prox] * exp(-(alpha * d_xyz + theta * d_tarl + extra))

where the 3-D spatial distance uses exact broadcast differences (VPU, no
cancellation) and the 96-d TARL distance an MXU contraction; the proximity
mask, validity mask and no-TARL row masking are fused into the same tile.
One pass over HBM instead of ~8 full N^2 materializations.

Shapes are static: callers pad point counts to a multiple of the tile size
and pass a validity mask. `affinity_xla` is the reference-shaped jnp
implementation used on CPU, in tests, and for the optional DINO/SAM terms.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 256
_XYZ_PAD = 128   # xyz padded to one lane register row
_TARL_PAD = 128  # 96-d TARL features padded to 128


def _pad_cols(x: jax.Array, width: int) -> jax.Array:
    pad = width - x.shape[1]
    if pad < 0:
        raise ValueError(f"feature dim {x.shape[1]} > pad width {width}")
    if pad == 0:
        return x
    return jnp.concatenate([x, jnp.zeros((x.shape[0], pad), x.dtype)], axis=1)


def _tile_sq_dists(a: jax.Array, b: jax.Array) -> jax.Array:
    """Squared distances between high-dim feature row blocks (MXU form)."""
    aa = jnp.sum(a * a, axis=1, keepdims=True)
    bb = jnp.sum(b * b, axis=1, keepdims=True)
    ab = jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    return jnp.maximum(aa + bb.T - 2.0 * ab, 0.0)


def _tile_sq_dists_xyz(a: jax.Array, b: jax.Array) -> jax.Array:
    """Squared distances for 3-D coordinates via exact broadcast differences.

    The (a-b)^2 form has no catastrophic cancellation (coincident points give
    exactly 0, matching cdist's zero diagonal, reference ncuts_utils.py:60)
    and for 3 dims costs less than a 128-padded MXU pass."""
    d2 = jnp.zeros((a.shape[0], b.shape[0]), jnp.float32)
    for k in range(3):
        diff = a[:, k][:, None] - b[:, k][None, :]
        d2 = d2 + diff * diff
    return d2


def _center(points: jax.Array, valid: jax.Array) -> jax.Array:
    """Subtract the valid-point centroid: pairwise distances are translation
    invariant, and centering keeps |x|^2 small so the f32 quadratic-form
    distance stays accurate even for map-frame coordinates far from origin."""
    v = valid.astype(points.dtype)
    mean = jnp.sum(points * v[:, None], axis=0) / jnp.maximum(jnp.sum(v), 1.0)
    return (points - mean) * v[:, None]


def _affinity_kernel(alpha, theta, gamma, beta, prox, with_tarl, n_dino,
                     with_sam, *refs):
    """refs: pi, pj, mi, mj, ti, tj, (d_i, d_j) x n_dino, [sam], out."""
    pi_ref, pj_ref, mi_ref, mj_ref, ti_ref, tj_ref = refs[:6]
    dino_refs = refs[6:6 + 2 * n_dino]
    sam_ref = refs[6 + 2 * n_dino] if with_sam else None
    out_ref = refs[-1]

    d = jnp.sqrt(_tile_sq_dists_xyz(pi_ref[:], pj_ref[:]))
    expo = alpha * d
    if with_tarl:
        dt = jnp.sqrt(_tile_sq_dists(ti_ref[:], tj_ref[:]))
        # rows/cols without TARL coverage contribute distance 0
        # (reference ncuts_utils.py:143-146); mi/mj column 1 is the tarl flag
        has_i = mi_ref[:, 1][:, None]
        has_j = mj_ref[:, 1][None, :]
        expo = expo + theta * dt * has_i * has_j
    for c in range(n_dino):
        # per-camera DINO feature distance plane (reference
        # ncuts_utils.py:125-133): same MXU contraction as TARL
        df = jnp.sqrt(_tile_sq_dists(dino_refs[2 * c][:],
                                     dino_refs[2 * c + 1][:]))
        expo = expo + gamma * df
    if with_sam:
        # precomputed SAM vote-distance plane, summed over cameras
        # (sam_label_distance; reference image_utils.py:64-89)
        expo = expo + beta * sam_ref[:]
    a = jnp.where(d <= prox, jnp.exp(-expo), 0.0)
    vi = mi_ref[:, 0][:, None]
    vj = mj_ref[:, 0][None, :]
    out_ref[:] = a * vi * vj


@partial(jax.jit, static_argnames=("alpha", "theta", "gamma", "beta",
                                   "proximity", "tile", "interpret"))
def affinity_pallas(points: jax.Array, valid: jax.Array,
                    tarl: jax.Array | None = None,
                    tarl_has: jax.Array | None = None,
                    dino_terms: tuple = (),
                    sam_dist: jax.Array | None = None,
                    alpha: float = 1.0, theta: float = 0.0,
                    gamma: float = 0.0, beta: float = 0.0,
                    proximity: float = 1.0, tile: int = _TILE,
                    interpret: bool = False) -> jax.Array:
    """Fused spatial(+TARL)(+DINO)(+SAM) affinity; one pass over HBM.

    N must be a multiple of `tile`. dino_terms: per-camera (N, F) feature
    arrays, each adding exp(-gamma * d_f) (fused as extra MXU planes).
    sam_dist: (N, N) SAM vote distance, pre-summed over cameras, adding
    exp(-beta * sam_dist) (fused as a (tile, tile) input plane)."""
    n = points.shape[0]
    if n % tile:
        raise ValueError(f"N={n} not a multiple of tile={tile}")
    with_tarl = tarl is not None and theta != 0.0
    dino_terms = tuple(dino_terms) if gamma != 0.0 else ()
    with_sam = sam_dist is not None and beta != 0.0

    p = _center(points[:, :3].astype(jnp.float32), valid)
    p = _pad_cols(p, _XYZ_PAD)
    if with_tarl:
        t = _pad_cols(tarl.astype(jnp.float32), _TARL_PAD)
        if tarl_has is None:
            tarl_has = jnp.any(tarl != 0, axis=1)
    else:
        t = jnp.zeros((n, _TARL_PAD), jnp.float32)
        tarl_has = jnp.zeros((n,), bool)
    # masks packed as a [N, 128] f32 plane: col 0 = valid, col 1 = has-tarl
    m = jnp.zeros((n, 128), jnp.float32)
    m = m.at[:, 0].set(valid.astype(jnp.float32))
    m = m.at[:, 1].set(tarl_has.astype(jnp.float32))
    dinos = [_pad_cols(f.astype(jnp.float32), -(-f.shape[1] // 128) * 128)
             for f in dino_terms]

    grid = (n // tile, n // tile)

    def row(width=128):
        return pl.BlockSpec((tile, width), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)

    def col(width=128):
        return pl.BlockSpec((tile, width), lambda i, j: (j, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [row(), col(), row(), col(), row(), col()]
    operands = [p, p, m, m, t, t]
    dino_cols = 0
    for f in dinos:
        in_specs += [row(f.shape[1]), col(f.shape[1])]
        operands += [f, f]
        dino_cols += f.shape[1]
    if with_sam:
        in_specs.append(pl.BlockSpec((tile, tile), lambda i, j: (i, j),
                                     memory_space=pltpu.VMEM))
        operands.append(sam_dist.astype(jnp.float32))
    kernel = partial(_affinity_kernel, float(alpha), float(theta),
                     float(gamma), float(beta), float(proximity), with_tarl,
                     len(dinos), with_sam)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile, tile), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * n * (2 * (128 + dino_cols) + 8
                               + (2 if with_sam else 0)),
            bytes_accessed=(6 + 2 * len(dinos)) * n * 128 * 4
            + (2 if with_sam else 1) * n * n * 4,
            transcendentals=n * n,
        ),
        interpret=interpret,
    )(*operands)


def affinity_xla(points: jax.Array, valid: jax.Array,
                 tarl: jax.Array | None = None,
                 tarl_has: jax.Array | None = None,
                 dino_terms: list[jax.Array] | None = None,
                 sam_terms: list[jax.Array] | None = None,
                 alpha: float = 1.0, theta: float = 0.0, gamma: float = 0.0,
                 beta: float = 0.0, proximity: float = 1.0) -> jax.Array:
    """Reference-shaped affinity in plain jnp (CPU tests / DINO / SAM path).

    dino_terms: per-camera (N, F) feature arrays (already view-averaged,
    reference ncuts_utils.py:125-133); each contributes exp(-gamma * d).
    sam_terms: per-camera (N, N) SAM vote distance matrices
    (see `sam_label_distance`); each contributes exp(-beta * dist).
    """
    pts = _center(points[:, :3].astype(jnp.float32), valid)
    d = jnp.sqrt(_tile_sq_dists_xyz(pts, pts))
    expo = alpha * d
    if tarl is not None and theta != 0.0:
        if tarl_has is None:
            tarl_has = jnp.any(tarl != 0, axis=1)
        dt = jnp.sqrt(_tile_sq_dists(tarl.astype(jnp.float32),
                                     tarl.astype(jnp.float32)))
        h = tarl_has.astype(jnp.float32)
        expo = expo + theta * dt * h[:, None] * h[None, :]
    if dino_terms and gamma != 0.0:
        for f in dino_terms:
            df = jnp.sqrt(_tile_sq_dists(f.astype(jnp.float32),
                                         f.astype(jnp.float32)))
            expo = expo + gamma * df
    if sam_terms and beta != 0.0:
        for s in sam_terms:
            expo = expo + beta * s
    a = jnp.where(d <= proximity, jnp.exp(-expo), 0.0)
    v = valid.astype(jnp.float32)
    return a * v[:, None] * v[None, :]


def sam_label_distance(sam_ids: jax.Array, spatial_mask: jax.Array,
                       num_instances: int) -> jax.Array:
    """Pairwise SAM vote distance: fraction of co-visible views disagreeing.

    sam_ids: (N, V) integer instance ids per view, -1 = not visible
    (reference image_utils.py:64-89, which loops over every masked pair in
    Python). Here each view's agreement matrix is a one-hot GEMM.
    Returns the (N, N) distance matrix (0 where no co-visible view).
    """
    n, v = sam_ids.shape
    vis = (sam_ids >= 0)

    def per_view(ids_v, vis_v):
        onehot = jax.nn.one_hot(jnp.where(vis_v, ids_v, 0), num_instances,
                                dtype=jnp.float32) * vis_v[:, None]
        agree = onehot @ onehot.T
        covis = (vis_v[:, None] & vis_v[None, :]).astype(jnp.float32)
        return agree, covis

    agree, covis = jax.vmap(per_view, in_axes=(1, 1))(sam_ids, vis)
    agree = jnp.sum(agree, axis=0)
    covis = jnp.sum(covis, axis=0)
    disagree = covis - agree
    dist = jnp.where(covis > 0, disagree / jnp.maximum(covis, 1.0), 0.0)
    return dist * spatial_mask
