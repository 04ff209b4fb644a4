"""Exact linear-sum-assignment (Hungarian matching) as a jittable JAX op.

The reference matches DETR queries to ground-truth masks with scipy's
`linear_sum_assignment` on the host (mask_pls matcher.py:116). A host
callback is a per-step device->host->device round-trip -- and some
transports (e.g. tunneled TPUs) cannot run callbacks at all -- so this
implements the same algorithm scipy uses (Crouse's shortest-augmenting-path
/ Jonker-Volgenant variant, "On implementing 2D rectangular assignment
algorithms", IEEE TAES 2016) with static shapes and lax control flow:

  * one fori_loop over rows (each row augments the matching once);
  * an inner while_loop Dijkstra over columns with boolean masks instead
    of scan sets (every sweep is vectorized over all C columns);
  * dual-variable updates and path augmentation as masked vector ops.

Cost matrices here are tiny (queries x targets, <= ~64 each), so the
sequential row loop is negligible; the win is staying in-graph. Returns
the same optimal total cost as scipy (assignments may differ on ties).

Rows must be <= cols (R <= C); every row gets a distinct column.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_INF = jnp.float32(1e30)


def _augment_row(carry, cur_row):
    """Find an augmenting path from `cur_row`, update duals + matching."""
    cost, u, v, row4col, col4row = carry
    R, C = cost.shape

    # ---- Dijkstra over columns until an unassigned column (sink) --------
    def dij_cond(s):
        sink = s[0]
        return sink < 0

    def dij_body(s):
        sink, i, min_val, remaining, shortest, path, sr = s
        r = min_val + cost[i] - u[i] - v          # [C]
        better = remaining & (r < shortest)
        shortest = jnp.where(better, r, shortest)
        path = jnp.where(better, i, path)
        # argmin over remaining; prefer unassigned columns on ties the way
        # scipy does (any optimal tie-break is valid)
        masked = jnp.where(remaining, shortest, _INF)
        lowest = jnp.min(masked)
        tie = remaining & (masked <= lowest)
        free_tie = tie & (row4col < 0)
        j = jnp.where(jnp.any(free_tie),
                      jnp.argmax(free_tie), jnp.argmax(tie))
        min_val = lowest
        remaining = remaining.at[j].set(False)
        sr = sr.at[i].set(True)
        hit_sink = row4col[j] < 0
        sink = jnp.where(hit_sink, j, -1)
        i = jnp.where(hit_sink, i, row4col[j])
        return sink, i, min_val, remaining, shortest, path, sr

    init = (jnp.int32(-1), cur_row, jnp.float32(0.0),
            jnp.ones((C,), bool), jnp.full((C,), _INF),
            jnp.full((C,), -1, jnp.int32), jnp.zeros((R,), bool))
    sink, _, min_val, remaining, shortest, path, sr = jax.lax.while_loop(
        dij_cond, dij_body, init)

    # ---- dual updates (scipy _lsap: u on scanned rows, v on scanned cols)
    sc = ~remaining
    u = u.at[cur_row].add(min_val)
    # scanned rows other than cur_row: u[i] += min_val - shortest[col4row[i]]
    row_scanned = sr.at[cur_row].set(False)
    gain_r = min_val - shortest[jnp.clip(col4row, 0, C - 1)]
    u = jnp.where(row_scanned, u + gain_r, u)
    v = jnp.where(sc, v - (min_val - shortest), v)

    # ---- augment along predecessor path from the sink --------------------
    def aug_cond(s):
        done = s[3]
        return ~done

    def aug_body(s):
        row4col, col4row, j, _ = s
        i = path[j]
        row4col = row4col.at[j].set(i)
        nxt = col4row[i]
        col4row = col4row.at[i].set(j)
        return row4col, col4row, nxt, i == cur_row

    row4col, col4row, _, _ = jax.lax.while_loop(
        aug_cond, aug_body, (row4col, col4row, sink, jnp.bool_(False)))
    return (cost, u, v, row4col, col4row), None


@jax.jit
def linear_sum_assignment(cost: jax.Array, n_rows=None):
    """col4row [R] int32: the optimal column for each row (min total cost).

    cost [R, C] with R <= C. `n_rows` (optional, traced) limits matching to
    the first n_rows rows -- padding rows get column -1. Same optimum as
    scipy.optimize.linear_sum_assignment.
    """
    R, C = cost.shape
    if R > C:
        raise ValueError("linear_sum_assignment requires R <= C")
    cost = cost.astype(jnp.float32)
    if n_rows is None:
        n_rows = R

    u = jnp.zeros((R,), jnp.float32)
    v = jnp.zeros((C,), jnp.float32)
    row4col = jnp.full((C,), -1, jnp.int32)
    col4row = jnp.full((R,), -1, jnp.int32)

    def step(carry, r):
        do = r < n_rows
        new_carry, _ = jax.lax.cond(
            do, lambda c: _augment_row(c, r), lambda c: (c, None), carry)
        return new_carry, None

    (_, _, _, _, col4row), _ = jax.lax.scan(
        step, (cost, u, v, row4col, col4row),
        jnp.arange(R, dtype=jnp.int32))
    return col4row
