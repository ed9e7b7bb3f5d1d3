"""Balanced clustering of token point clouds via space-filling curves.

JAX port of ``space_filling_cluster`` (reference:
mask2former/modeling/backbone/point_utils.py:135-287).  Sorts tokens along a
space-filling curve over anchor patches, then chunks the sorted sequence into
clusters of exactly ``m`` tokens.  Cluster count ``k = ceil(n/m)`` and all
shapes are static; when ``k*m != n`` the final cluster carries a validity
mask — exactly the padded-fixed-width structure XLA wants.

Everything here is non-differentiable bookkeeping (the reference runs it
under ``torch.no_grad``): outputs are wrapped in ``stop_gradient``.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .sfc import calculate_hilbert_order, calculate_peano_order


def _anchor_grid(h: int, w: int, k: int, sf_type: str):
    """Static anchor-patch layout: grid size, patch extents, curve order."""
    patch_len = (h * w / k) ** 0.5
    num_patch_h = int(round(h / patch_len))
    num_patch_w = int(round(w / patch_len))
    num_patch_h = max(1, num_patch_h)
    num_patch_w = max(1, num_patch_w)
    patch_len_h, patch_len_w = h / num_patch_h, w / num_patch_w
    if sf_type == "peano":
        num_patch_h = max(3, int(3 ** round(math.log(num_patch_h, 3))))
        patch_len_h = h / num_patch_h
        num_patch_w = int(round(w / h * 3) * (num_patch_h / 3))
        patch_len_w = w / num_patch_w
    elif sf_type == "hilbert":
        num_patch_h = max(2, int(2 ** round(math.log(num_patch_h, 2))))
        patch_len_h = h / num_patch_h
        num_patch_w = int(round(w / h * 2) * (num_patch_h / 2))
        patch_len_w = w / num_patch_w
    return num_patch_h, num_patch_w, patch_len_h, patch_len_w


def _grid_curve_order(num_patch_h: int, num_patch_w: int, h: int, w: int, sf_type: str):
    """Order of anchor cells along the space-filling curve (all static numpy).

    Returns (order_grid_idx, order_idx): order_grid_idx[cell] = rank of cell in
    the curve; order_idx[rank] = cell (row-major index).
    """
    xs = np.arange(num_patch_w)[None, :].repeat(num_patch_h, 0)
    ys = np.arange(num_patch_h)[:, None].repeat(num_patch_w, 1)
    grid_pos = np.stack([xs, ys], axis=2).reshape(-1, 2).astype(np.float32)

    if sf_type in ("peano", "hilbert"):
        fn = calculate_peano_order if sf_type == "peano" else calculate_hilbert_order
        order_grid_idx, order_idx = fn(
            num_patch_h, num_patch_w, jnp.asarray(grid_pos)[None]
        )
        return np.asarray(order_grid_idx[0]), np.asarray(order_idx[0]), grid_pos
    # scanline: alternate direction per row (point_utils.py:203-212; note the
    # reference multiplies the row term by the full canvas width w)
    order_mask = np.where(ys % 2 == 0, 1, -1) * xs + ys * w
    order_mask = order_mask + np.where(ys % 2 == 0, 0, w - 1)
    order_mask = order_mask.reshape(-1)
    order_idx = np.argsort(order_mask, kind="stable")
    order_grid_idx = np.zeros_like(order_idx)
    order_grid_idx[order_idx] = np.arange(len(order_idx))
    return order_grid_idx, order_idx, grid_pos


def space_filling_cluster(
    pos: jnp.ndarray,
    m: int,
    h: int,
    w: int,
    no_reorder: bool = False,
    sf_type: str = "",
    use_anchor: bool = True,
) -> Tuple:
    """Balanced clustering based on space-filling curves.

    Args:
        pos - (b, n, 2) token positions
        m   - target cluster size (static)
        h, w - canvas size (static)
        no_reorder - if True, keep original token order and return member
                     indices into it; else reorder tokens along the curve
        sf_type - '', 'peano' or 'hilbert'
        use_anchor - anchor-patch ordering (True) vs direct curve on tokens
    Returns (no_reorder=False):
        pos        - (b, n, 2) reordered positions
        cluster_mean_pos - (b, k, 2)
        member_idx - (b, k, m) int32 indices into the *reordered* tokens
        cluster_mask - (b, k, m) int32 validity (None when k*m == n)
        pos_ranking - (b, n, 1) int32: index of the token of rank i
    Returns (no_reorder=True):
        (cluster_mean_pos, member_idx, cluster_mask)
    """
    pos = jax.lax.stop_gradient(pos).astype(jnp.float32)
    b, n, d = pos.shape
    k = int(math.ceil(n / m))

    if use_anchor:
        nph, npw, plh, plw = _anchor_grid(h, w, k, sf_type)
        if nph * npw < 3:
            # too few anchors for the prev/next-mean refinement (the reference
            # would index out of bounds at point_utils.py:222); order tokens
            # directly on the curve instead
            use_anchor = False

    if use_anchor:
        order_grid_idx, order_idx, grid_pos = _grid_curve_order(nph, npw, h, w, sf_type)
        ordered_grid = grid_pos[np.asarray(order_idx)]  # (P, 2) static
        patch_len_hw = np.array([plw, plh], dtype=np.float32)

        init_pos_means = ordered_grid * patch_len_hw + patch_len_hw / 2 - 0.5  # (P, 2)
        nump = ordered_grid.shape[0]
        prev_means = np.zeros_like(init_pos_means)
        prev_means[1:] = init_pos_means[: nump - 1]
        prev_means[0] = prev_means[1] - (prev_means[2] - prev_means[1])
        next_means = np.zeros_like(init_pos_means)
        next_means[: nump - 1] = init_pos_means[1:]
        next_means[-1] = next_means[-2] + (next_means[-2] - next_means[-3])

        patch_len_hw_j = jnp.asarray(patch_len_hw)
        mean_assignment = jnp.floor(pos / patch_len_hw_j)
        mean_assignment = (mean_assignment[..., 0] + mean_assignment[..., 1] * npw).astype(jnp.int32)
        mean_assignment = jnp.take(
            jnp.asarray(order_grid_idx, dtype=jnp.int32), mean_assignment, axis=0
        )  # (b, n) curve rank of each token's anchor

        prev_assign = jnp.take(jnp.asarray(prev_means), mean_assignment, axis=0)  # (b,n,2)
        next_assign = jnp.take(jnp.asarray(next_means), mean_assignment, axis=0)
        dist_prev = jnp.sum((pos - prev_assign) ** 2, axis=-1)
        dist_next = jnp.sum((pos - next_assign) ** 2, axis=-1)
        dist_ratio = dist_prev / (dist_next + 1e-5)

        key = mean_assignment.astype(jnp.float32) * (jnp.max(dist_ratio) + 1) + dist_ratio
        pos_ranking = jnp.argsort(key, axis=1, stable=True).astype(jnp.int32)  # (b, n)
    else:
        if sf_type == "peano":
            _, pos_ranking = calculate_peano_order(h, w, pos)
        elif sf_type == "hilbert":
            _, pos_ranking = calculate_hilbert_order(h, w, pos)
        else:
            xs = np.arange(w)[None, :].repeat(h, 0)
            ys = np.arange(h)[:, None].repeat(w, 1)
            order_mask = np.where(ys % 2 == 0, 1, -1) * xs + ys * w
            order_mask = order_mask + np.where(ys % 2 == 0, 0, w - 1)
            order_mask = jnp.asarray(order_mask.reshape(-1), dtype=jnp.int32)
            pos_idx = (pos[..., 0] + pos[..., 1] * w).astype(jnp.int32)
            keys = jnp.take(order_mask, pos_idx, axis=0)
            pos_ranking = jnp.argsort(keys, axis=1, stable=True).astype(jnp.int32)

    pos_sorted = jnp.take_along_axis(pos, pos_ranking[..., None], axis=1)  # (b, n, 2)

    if k * m == n:
        cluster_mask = None
        cluster_mean_pos = pos_sorted.reshape(b, k, m, d).mean(axis=2)
    else:
        pad = k * m - n
        pos_pad = jnp.pad(pos_sorted, ((0, 0), (0, pad), (0, 0)))
        cluster_mask = jnp.pad(
            jnp.ones((b, n), dtype=jnp.int32), ((0, 0), (0, pad))
        ).reshape(b, k, m)
        cluster_mean_pos = pos_pad.reshape(b, k, m, d).sum(axis=2) / cluster_mask.sum(
            axis=2, keepdims=True
        ).astype(jnp.float32)

    if no_reorder:
        if k * m == n:
            member_idx = pos_ranking.reshape(b, k, m)
        else:
            member_idx = jnp.pad(pos_ranking, ((0, 0), (0, k * m - n))).reshape(b, k, m)
        return cluster_mean_pos, member_idx, cluster_mask

    member_idx = np.arange(k * m, dtype=np.int32)
    if k * m != n:
        member_idx[n:] = 0
    member_idx = jnp.broadcast_to(jnp.asarray(member_idx), (b, k * m)).reshape(b, k, m)
    return pos_sorted, cluster_mean_pos, member_idx, cluster_mask, pos_ranking[..., None]


def nbhd_from_cluster_ids(pos, nc, span: int, n: int, query_pos=None):
    """Reconstruct fixed-width neighborhoods from neighbor-cluster ids.

    Tokens are sorted so cluster c occupies rows [c*span, (c+1)*span); the
    reference materializes the same spans by gathering an arange table
    (aff.py:478-481).  Entries >= n are padding (mask = 0).
    pos: (b, n, 2); nc: (b, nq, nnc); query_pos: neighborhood centers
    (defaults to pos rows).  Returns (member_idx int32, cluster_mask|None,
    rel_feat5)."""
    from ..models.layers import rel_pos_features

    b, nq, nnc = nc.shape
    member = (
        nc[..., None] * span + jnp.arange(span, dtype=jnp.int32)
    ).reshape(b, nq, nnc * span)
    valid = member < n
    member = jnp.where(valid, member, 0)
    cluster_mask = None if (n % span == 0) else valid.astype(jnp.float32)
    from ..ops.gather import take_rows

    pos_nb = take_rows(pos, member)                   # (b, nq, nnc*span, 2)
    q = pos[:, :nq] if query_pos is None else query_pos
    rel_feat5 = rel_pos_features(pos_nb - q[:, :, None, :])
    return member, cluster_mask, rel_feat5
