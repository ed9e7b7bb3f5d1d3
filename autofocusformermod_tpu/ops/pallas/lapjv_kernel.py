"""Pallas lockstep Jonker-Volgenant LSAP: the whole batched solve in ONE
kernel program.

The XLA solver (losses/lapjv.py) is algorithmically right for TPU — a few
hundred cheap O(Q) vector steps — but each ``lax.while_loop`` iteration is a
separate fusion dispatch, and at matcher sizes (80 stacked problems of
100x20 per train step) the dispatch overhead dominates: 125 ms measured of
the 364 ms criterion at batch 8.  Inside one Pallas program the same
iterations are register/VMEM-resident VPU ops with no per-step launch cost.

Same algorithm as losses/lapjv.hungarian_lsap (shortest augmenting path with
potentials, exact optimum; reference semantics: scipy linear_sum_assignment
on the host, matcher.py:154-156), vectorized across all B problems in
lockstep: every per-problem scalar (the tree column j0, the Dijkstra
minimum j1, the active flag) is a (B, 1) vector, per-problem gathers are
iota-compare one-hot reductions along lanes, and finished problems mask out
until the slowest one augments.

Scalar-indexed reads become:
  - c[i0, :]   -> a T+1-step static select sweep over the row axis
  - p[j1], way[j0] -> masked lane reductions (sum of iota==j one-hots)
and scatter updates become iota-compare selects — no serialized .at[] ops.

Mosaic notes (each a measured compile failure, not a style choice):
  - loop-carried vectors hit "scf.yield layout mismatch" when a carry's
    layout differs between entry and body (lane-replicated (B, 1) reductions
    vs canonical {0,0}); ALL vector state therefore lives in VMEM scratch
    refs and the while loops carry only 0-d scalars,
  - (B,) -> (B, 1) i1 reshapes are unsupported ("Insertion of minor dim
    ... only supported for 32-bit types"); masks stay 2-D int32 in refs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = float(jnp.finfo(jnp.float32).max) / 4


def _lane_pick_f(mat: jnp.ndarray, j: jnp.ndarray) -> jnp.ndarray:
    """mat (B, W) float, j (B, 1) int32 -> mat[b, j[b]] (B, 1) one-hot sum."""
    iota = jax.lax.broadcasted_iota(jnp.int32, mat.shape, 1)
    return jnp.sum(jnp.where(iota == j, mat, 0.0), axis=1, keepdims=True)


def _lane_pick_i(mat: jnp.ndarray, j: jnp.ndarray) -> jnp.ndarray:
    """Integer variant of _lane_pick_f."""
    iota = jax.lax.broadcasted_iota(jnp.int32, mat.shape, 1)
    return jnp.sum(jnp.where(iota == j, mat, 0), axis=1, keepdims=True)


def _kernel(c_ref, out_ref, minv_ref, way_ref, used_ref, rows_ref, u_ref,
            v_ref, p_ref, j0_ref, *, T, Q):
    """c_ref: (B, T+1, Q+1) f32 padded cost (row/col 0 virtual);
    out_ref: (B, T) int32 matched query per target; the rest are VMEM
    scratch holding the solver state (masks as int32, see module note)."""
    B = c_ref.shape[0]
    q1 = Q + 1
    t1 = T + 1
    iota_q = jax.lax.broadcasted_iota(jnp.int32, (B, q1), 1)
    iota_t = jax.lax.broadcasted_iota(jnp.int32, (B, t1), 1)

    u_ref[...] = jnp.zeros((B, t1), jnp.float32)
    v_ref[...] = jnp.zeros((B, q1), jnp.float32)
    p_ref[...] = jnp.zeros((B, q1), jnp.int32)

    def assign_row(r, _):
        # --- Dijkstra / alternating tree from target row r (all problems
        # in lockstep; see losses/lapjv.py for the single-problem form) ---
        p_ref[...] = jnp.where(iota_q == 0, r, p_ref[...])
        minv_ref[...] = jnp.full((B, q1), _INF)
        way_ref[...] = jnp.zeros((B, q1), jnp.int32)
        used_ref[...] = (iota_q == 0).astype(jnp.int32)
        rows_ref[...] = (iota_t == r).astype(jnp.int32)
        j0_ref[...] = jnp.zeros((B, 1), jnp.int32)

        def sp_body(n_active):
            del n_active
            p = p_ref[...]
            j0 = j0_ref[...]
            used = used_ref[...] > 0
            active = _lane_pick_i(p, j0) > 0               # p[j0] > 0
            i0 = _lane_pick_i(p, j0)
            # c[i0, :] - u[i0]: static select sweep over the T+1 rows
            c_sel = jnp.zeros((B, q1), jnp.float32)
            for i in range(t1):
                c_sel = jnp.where(i0 == i, c_ref[:, i, :], c_sel)
            cur = c_sel - _lane_pick_f(u_ref[...], i0) - v_ref[...]

            minv = minv_ref[...]
            better = (cur < minv) & ~used & active
            minv = jnp.where(better, cur, minv)
            way_ref[...] = jnp.where(better, j0, way_ref[...])

            mm = jnp.where(used, _INF, minv)
            delta = jnp.min(mm, axis=1, keepdims=True)     # (B, 1)
            # first argmin (ties -> smallest j), manual for Mosaic safety
            j1 = jnp.min(
                jnp.where(mm == delta, iota_q, q1), axis=1, keepdims=True
            ).astype(jnp.int32)

            rows_in = rows_ref[...] > 0
            u_ref[...] = u_ref[...] + jnp.where(rows_in & active, delta, 0.0)
            v_ref[...] = jnp.where(used & active, v_ref[...] - delta,
                                   v_ref[...])
            minv_ref[...] = jnp.where(~used & active, minv - delta, minv)
            used_ref[...] = (used | ((iota_q == j1) & active)).astype(
                jnp.int32
            )
            pj1 = _lane_pick_i(p, j1)                      # (B, 1) = p[j1]
            rows_ref[...] = (
                rows_in | ((iota_t == pj1) & active)
            ).astype(jnp.int32)
            j0_ref[...] = jnp.where(active, j1, j0)
            # continue while any problem's tree head is an assigned column
            still = active & (pj1 > 0)
            return jnp.sum(still.astype(jnp.int32))

        jax.lax.while_loop(lambda n: n > 0, sp_body, jnp.int32(B))

        # --- augment: flip the alternating path back to col 0 ---
        def aug_body(n_live):
            del n_live
            p = p_ref[...]
            j0 = j0_ref[...]
            live = j0 > 0
            wj = _lane_pick_i(way_ref[...], j0)            # j1 = way[j0]
            pwj = _lane_pick_i(p, wj)                      # p[j1]
            p_ref[...] = jnp.where((iota_q == j0) & live, pwj, p)
            j0 = jnp.where(live, wj, j0)
            j0_ref[...] = j0
            return jnp.sum((j0 > 0).astype(jnp.int32))

        jax.lax.while_loop(lambda n: n > 0, aug_body, jnp.int32(B))
        return 0

    jax.lax.fori_loop(1, T + 1, assign_row, 0)

    # invert: matched[t-1] = (the col j with p[j] == t) - 1
    p = p_ref[...]
    matched = jnp.zeros((B, T), jnp.int32)
    iota_out = jax.lax.broadcasted_iota(jnp.int32, (B, T), 1)
    for t in range(1, T + 1):
        col = jnp.sum(jnp.where(p == t, iota_q, 0), axis=1, keepdims=True)
        matched = jnp.where(iota_out == t - 1, col - 1, matched)
    out_ref[...] = matched


def lsap_pallas_supported(cost: jnp.ndarray) -> bool:
    b, q, t = cost.shape
    # select-sweep cost grows with T; VMEM holds the padded block
    return t <= 128 and q <= 2048 and b * (t + 1) * (q + 1) * 4 < 64 * 2**20


@functools.partial(jax.jit, static_argnames=("interpret",))
def lsap_pallas(cost: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """cost (B, Q, T) f32, T <= Q -> (B, T) int32 matched query per target.

    Exact optimum (same as scipy); costs clipped to +-3e4 as in
    losses/lapjv.py so the matcher's 1e8 invalid sentinel cannot swamp f32
    dual updates (all sentinel entries equal => ordering preserved)."""
    b, q, t = cost.shape
    assert t <= q, (q, t)
    c = jnp.clip(cost.astype(jnp.float32), -3e4, 3e4)
    ct = jnp.pad(jnp.transpose(c, (0, 2, 1)), ((0, 0), (1, 0), (1, 0)))
    q1, t1 = q + 1, t + 1
    return pl.pallas_call(
        functools.partial(_kernel, T=t, Q=q),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((b, q1), jnp.float32),   # minv
            pltpu.VMEM((b, q1), jnp.int32),     # way
            pltpu.VMEM((b, q1), jnp.int32),     # used
            pltpu.VMEM((b, t1), jnp.int32),     # rows_in
            pltpu.VMEM((b, t1), jnp.float32),   # u
            pltpu.VMEM((b, q1), jnp.float32),   # v
            pltpu.VMEM((b, q1), jnp.int32),     # p
            pltpu.VMEM((b, 1), jnp.int32),      # j0
        ],
        interpret=interpret,
    )(ct)
