"""Exact linear assignment (Hungarian) fully on-device.

DETR-family losses (EDPoseTPUHead) need a one-to-one query<->GT matching
inside the jitted train step. The reference stack calls scipy through mmdet's
``HungarianAssigner`` on host; TPU runtimes cannot service host callbacks
inside jit, so this module implements the Jonker-Volgenant shortest
augmenting path algorithm (the same O(n^3) scheme scipy's
``linear_sum_assignment`` uses) with ``lax.while_loop``/``lax.fori_loop`` —
static shapes, batched via ``vmap``, exact optimum (scipy-oracle-tested).

Cost matrices here are small (G = padded GT slots <= ~50, Q = queries
<= ~900), so the serial augmenting-path outer loop is negligible next to
the model's matmuls; each inner step is a vectorized (Q+1,) update.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_INF = jnp.float32(1e18)


def _solve_one(C: jnp.ndarray) -> jnp.ndarray:
    """Assign each of G rows of ``C`` (G, Q), G <= Q, to a distinct column,
    minimizing total cost. Returns (Q,) int32: row index per column or -1.

    Jonker-Volgenant with dual potentials (u over rows, v over columns) and
    a virtual column 0; 1-indexed internally like the classic formulation.
    """
    G, Q = C.shape

    u0 = jnp.zeros(G + 1, jnp.float32)
    v0 = jnp.zeros(Q + 1, jnp.float32)
    p0 = jnp.zeros(Q + 1, jnp.int32)  # p[j] = row assigned to column j (0 = free)

    def outer(i, carry):
        u, v, p = carry
        i1 = i + 1  # current row, 1-indexed
        p = p.at[0].set(i1)

        def grow_cond(s):
            j0, _, _, p, _, _, _ = s
            return p[j0] != 0

        def grow(s):
            j0, u, v, p, minv, way, used = s
            used = used.at[j0].set(True)
            i0 = p[j0]
            # reduced costs of row i0 against all free columns
            crow = jnp.concatenate(
                [jnp.array([_INF]), C[i0 - 1] - u[i0] - v[1:]]
            )
            better = (~used) & (crow < minv)
            minv = jnp.where(better, crow, minv)
            way = jnp.where(better, j0, way)
            cand = jnp.where(used, _INF, minv)
            j1 = jnp.argmin(cand).astype(jnp.int32)
            delta = cand[j1]
            # dual update keeps reduced costs nonnegative on the tree
            u = u.at[jnp.where(used, p, 0)].add(jnp.where(used, delta, 0.0))
            v = jnp.where(used, v - delta, v)
            minv = jnp.where(used, minv, minv - delta)
            return (j1, u, v, p, minv, way, used)

        state = (
            jnp.int32(0),
            u,
            v,
            p,
            jnp.full(Q + 1, _INF),
            jnp.zeros(Q + 1, jnp.int32),
            jnp.zeros(Q + 1, bool),
        )
        j0, u, v, p, minv, way, used = jax.lax.while_loop(grow_cond, grow, state)

        # augment along the alternating path back to the virtual column
        def aug_cond(s):
            j0, _ = s
            return j0 != 0

        def aug(s):
            j0, p = s
            j1 = way[j0]
            p = p.at[j0].set(p[j1])
            return (j1, p)

        _, p = jax.lax.while_loop(aug_cond, aug, (j0, p))
        return (u, v, p)

    _, _, p = jax.lax.fori_loop(0, G, outer, (u0, v0, p0))
    return p[1:].astype(jnp.int32) - 1  # (Q,) row per column, -1 free


def hungarian_assign(cost: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Batched exact LAP: match queries to valid GT slots.

    Args:
        cost: (B, Q, G) matching cost (finite).
        valid: (B, G) 1 for real GT slots, 0 padding.

    Returns:
        (B, Q) int32 — matched gt index per query, or -1.

    Solves in whichever orientation keeps rows <= columns (JV needs a
    feasible perfect matching on the row side):

    * ``G <= Q``: GT slots are rows. Padded slots get a constant-ZERO cost
      row — indifferent to every query, they soak up leftover queries
      without perturbing the valid slots' optimum (totals separate
      additively) — and are stripped from the result.
    * ``G > Q`` (heavily padded GT): queries are rows, every query takes a
      distinct GT slot. Padded slots get a constant-LARGE cost so the
      optimum first covers as many VALID slots as possible, then minimizes
      their cost; queries landing on padding are stripped.
    """
    B, Q, G = cost.shape
    cost = cost.astype(jnp.float32)
    if G <= Q:
        rows = jnp.swapaxes(cost, 1, 2)  # (B, G, Q)
        rows = jnp.where(valid[:, :, None] > 0, rows, 0.0)
        col_to_row = jax.vmap(_solve_one)(rows)  # (B, Q): gt per query or -1
        g_safe = jnp.clip(col_to_row, 0, G - 1)
        is_valid = jnp.take_along_axis(valid, g_safe, axis=1) > 0
        return jnp.where((col_to_row >= 0) & is_valid, col_to_row, -1)

    # padding constant: must dominate any real matching cost difference
    # while staying well inside f32 precision for the dual potentials
    pad = jnp.float32(1e4)
    rows = jnp.where(valid[:, None, :] > 0, cost, pad)  # (B, Q, G)
    col_to_q = jax.vmap(_solve_one)(rows)  # (B, G): query per gt slot or -1
    # invert to query -> gt, dropping padded slots
    hit = (col_to_q[:, None, :] == jnp.arange(Q, dtype=jnp.int32)[None, :, None]) \
        & (valid[:, None, :] > 0)  # (B, Q, G)
    return jnp.where(hit.any(-1), jnp.argmax(hit, -1).astype(jnp.int32), -1)
