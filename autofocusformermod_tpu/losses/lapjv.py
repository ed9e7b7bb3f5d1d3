"""Exact on-device linear sum assignment (Hungarian with potentials / JV).

The reference solves per-image LSAP with scipy on the host
(matcher.py:154-156).  Host callbacks are unsupported on some TPU PJRT
runtimes and cost a device->host round-trip per step, so this is a pure-JAX
shortest-augmenting-path Hungarian (the O(n^3) potentials formulation used
by Jonker-Volgenant / e-maxx): for each of the T target rows, one Dijkstra
over the Q query columns grows an alternating tree until it reaches a free
column, then the path is augmented.

Why this beats the epsilon-scaling auction (auction.py) here: T <= ~100, so
the total sequential work is sum_r O(r) ~ T^2/2 while-loop iterations of
cheap O(Q) vector ops — a few hundred tiny steps instead of the auction's
~1e5 (dummy-person price wars) — and the result is exactly optimal, not
eps-approximate.  Runs vmapped over the batch (lockstep trip counts).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_INF = jnp.inf
# f32 duals lose ~eps*|cost| absolute precision; the matcher's 1e8
# invalid-column sentinel would swamp real costs (O(100)), so clamp.  All
# sentinel entries are equal, so ordering is preserved.
_CLIP = 3e4


@functools.partial(jax.jit, static_argnames=())
def hungarian_lsap(cost: jnp.ndarray) -> jnp.ndarray:
    """cost: (b, Q, T), T <= Q.  Returns (b, T) int32: distinct query per
    target minimizing total cost (exact, same optimum as scipy)."""
    b, Q, T = cost.shape
    assert T <= Q, (Q, T)

    def solve(c_qt):
        # rows = targets (small side), cols = queries; 1-indexed with a
        # virtual col 0 and virtual row 0 (p[j] == 0 means col j free).
        c = jnp.clip(c_qt.T, -_CLIP, _CLIP).astype(jnp.float32)   # (T, Q)
        c = jnp.pad(c, ((1, 0), (1, 0)))                          # (T+1, Q+1)

        def assign_row(carry, r):
            u, v, p = carry
            # --- Dijkstra / alternating tree from row r ---
            minv0 = jnp.full((Q + 1,), _INF)
            way0 = jnp.zeros((Q + 1,), jnp.int32)
            used0 = jnp.zeros((Q + 1,), bool).at[0].set(True)
            # rows currently in the alternating tree == {p[j] : used[j]}
            # (used cols map to distinct assigned rows; col 0 holds r).
            # Tracked densely so the potential update is a vector select —
            # the scatter-add u.at[p].add(...) serialized on TPU and
            # dominated the solve.
            rows_in0 = jnp.zeros((T + 1,), bool).at[r].set(True)
            p = p.at[0].set(r)

            def sp_cond(s):
                _, _, _, _, _, _, p, j0 = s
                return p[j0] > 0

            def sp_body(s):
                minv, way, used, rows_in, u, v, p, j0 = s
                i0 = p[j0]
                cur = c[i0] - u[i0] - v                           # (Q+1,)
                better = (cur < minv) & ~used
                minv = jnp.where(better, cur, minv)
                way = jnp.where(better, j0, way)
                mm = jnp.where(used, _INF, minv)
                j1 = jnp.argmin(mm).astype(jnp.int32)
                delta = mm[j1]
                # grow potentials inside the tree, shrink slack outside
                u = u + jnp.where(rows_in, delta, 0.0)
                v = jnp.where(used, v - delta, v)
                minv = jnp.where(used, minv, minv - delta)
                used = used.at[j1].set(True)
                rows_in = rows_in.at[p[j1]].set(True)
                return minv, way, used, rows_in, u, v, p, j1

            # first scan step happens with j0 = 0 (virtual col holding r)
            minv, way, used, _, u, v, p, j0 = jax.lax.while_loop(
                sp_cond, sp_body,
                (minv0, way0, used0, rows_in0, u, v, p,
                 jnp.zeros((), jnp.int32)),
            )

            # --- augment: flip the alternating path back to col 0 ---
            def aug_cond(s):
                _, j0 = s
                return j0 > 0

            def aug_body(s):
                p, j0 = s
                j1 = way[j0]
                p = p.at[j0].set(p[j1])
                return p, j1

            p, _ = jax.lax.while_loop(aug_cond, aug_body, (p, j0))
            return (u, v, p), 0

        u0 = jnp.zeros((T + 1,))
        v0 = jnp.zeros((Q + 1,))
        p0 = jnp.zeros((Q + 1,), jnp.int32)
        (_, _, p), _ = jax.lax.scan(
            assign_row, (u0, v0, p0), jnp.arange(1, T + 1, dtype=jnp.int32)
        )
        # invert: col4row[row] = col;  p[j] in [1, T] for assigned cols
        col4row = jnp.zeros((T + 2,), jnp.int32).at[p].set(
            jnp.arange(Q + 1, dtype=jnp.int32), mode="drop"
        )
        return col4row[1 : T + 1] - 1

    return jax.vmap(solve)(cost)
