"""Space-filling-curve orderings (scanline / Peano / Hilbert) over 2-D positions.

JAX port of the deterministic ordering math in the reference
(mask2former/modeling/backbone/point_utils.py:440-578). All table constants
and level counts are static; the per-token work is gathers + elementwise ops,
so the whole thing traces into a handful of fused XLA ops.

Orders are defined on a canvas of size (h, w); ``pos`` holds float coordinates
``(x, y)`` in that canvas. Each function returns

    order  - (b, n) the rank of token i in the curve order
    argsort- (b, n) index of the token of rank i (i.e. ``argsort(order)``)
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def _ranks_from_keys(keys: jnp.ndarray):
    """keys: (b, n) sortable -> (order (b,n), argsort (b,n))."""
    argsort = jnp.argsort(keys, axis=1, stable=True)
    b, n = keys.shape
    src = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (b, n))
    batch_idx = jnp.broadcast_to(jnp.arange(b)[:, None], (b, n))
    # order[b, argsort[b, r]] = r
    order = jnp.zeros((b, n), dtype=jnp.int32).at[batch_idx, argsort].set(src)
    return order, argsort.astype(jnp.int32)


def scanline_order_keys(h: int, w: int) -> np.ndarray:
    """Boustrophedon scanline rank for every cell of an h x w grid (row-major
    flattened), matching point_utils.py:203-212: even rows left-to-right,
    odd rows right-to-left."""
    xs = np.arange(w)[None, :].repeat(h, 0)
    ys = np.arange(h)[:, None].repeat(w, 1)
    sign = np.where(ys % 2 == 0, 1, -1)
    key = sign * xs + ys * w
    key = key + np.where(ys % 2 == 0, 0, w - 1)
    return key.reshape(-1)  # rank key per cell; argsort gives the curve


def calculate_peano_order(h: int, w: int, pos: jnp.ndarray):
    """Peano curve order of tokens at ``pos`` on an (h, w) canvas.
    Port of point_utils.py:440-511."""
    b, n, _ = pos.shape
    pos = pos.astype(jnp.float32)
    num_levels = max(1, math.ceil(math.log(h, 3)))
    first_w = None
    if h != w:
        fw = round(3 * (w / h))
        if fw != 3:
            first_w = fw

    init_dict = jnp.asarray([[2, 3, 8], [1, 4, 7], [0, 5, 6]], dtype=jnp.float32)
    inverse_dict = jnp.asarray(
        [
            [[1, 1], [1, -1], [1, 1]],
            [[-1, 1], [-1, -1], [-1, 1]],
            [[1, 1], [1, -1], [1, 1]],
        ],
        dtype=jnp.float32,
    )
    if first_w is not None:
        init_flip = jnp.flip(init_dict, axis=0)
        init_f = jnp.concatenate([init_dict, init_flip], axis=1)  # 3 x 6
        reps = math.ceil(first_w / 6)
        init_f = jnp.tile(init_f, (1, reps))[:, :first_w]  # 3 x fw
        w_index = np.arange(math.ceil(first_w / 3)).repeat(3)[:first_w] * 9
        init_f = init_f + jnp.asarray(w_index, dtype=jnp.float32)
        init_dict_f = init_f.reshape(-1)  # 3*fw
        inv_f = jnp.tile(inverse_dict[:, :2], (1, math.ceil(first_w / 2), 1))[:, :first_w]
        inverse_dict_f = inv_f.reshape(-1, 2)
    init_flat = init_dict.reshape(-1)  # 9
    inverse_flat = inverse_dict.reshape(-1, 2)  # 9 x 2

    last_h = float(h)
    rem_pos = pos
    levels_pos = []
    for _ in range(num_levels):
        cur_h = last_h / 3.0
        levels_pos.append(jnp.floor(rem_pos / cur_h))
        rem_pos = jnp.mod(rem_pos, cur_h)
        last_h = cur_h

    orders = []
    for i in range(num_levels):
        inverse = jnp.ones_like(pos)
        for j in range(i):
            cur_level_pos = levels_pos[i - j - 1]
            if i - j - 1 == 0 and first_w is not None:
                idx = (cur_level_pos[..., 0] + cur_level_pos[..., 1] * first_w).astype(jnp.int32)
                cur_inverse = jnp.take(inverse_dict_f, idx, axis=0)
            else:
                idx = (cur_level_pos[..., 0] + cur_level_pos[..., 1] * 3).astype(jnp.int32)
                cur_inverse = jnp.take(inverse_flat, idx, axis=0)
            inverse = cur_inverse * inverse
        level_pos = levels_pos[i]
        inversed_pos = jnp.where(inverse > 0, level_pos, 2.0 - level_pos)
        if i == 0 and first_w is not None:
            iidx = (inversed_pos[..., 0] + inversed_pos[..., 1] * first_w).astype(jnp.int32)
            cur_order = jnp.take(init_dict_f, iidx, axis=0)
        else:
            iidx = (inversed_pos[..., 0] + inversed_pos[..., 1] * 3).astype(jnp.int32)
            cur_order = jnp.take(init_flat, iidx, axis=0)
        orders.append(cur_order)

    final_order = orders[-1]
    for i in range(num_levels - 1):
        final_order = final_order + orders[i] * (9 ** (num_levels - i - 1))
    return _ranks_from_keys(final_order)


def calculate_hilbert_order(h: int, w: int, pos: jnp.ndarray):
    """Hilbert curve order of tokens at ``pos`` on an (h, w) canvas.
    Port of point_utils.py:514-578."""
    b, n, _ = pos.shape
    pos = pos.astype(jnp.float32)
    num_levels = max(1, math.ceil(math.log(h, 2)))
    first_w = None
    if h != w:
        fw = round(2 * (w / h))
        if fw != 2:
            first_w = fw

    rotate_dict = jnp.asarray(
        [[[-1, 1], [0, 0]], [[0, -1], [0, 1]], [[1, 0], [-1, 0]]], dtype=jnp.float32
    )  # 3 x 2 x 2
    if first_w is not None:
        rot_f = jnp.tile(rotate_dict[0], (1, math.ceil(first_w / 2)))[:, :first_w]
        rotate_dict_f = rot_f.reshape(-1)  # 2*fw
    rotate_flat = rotate_dict.reshape(3, -1)  # 3 x 4
    rot_res_dict = jnp.asarray(
        [[0, 3, 1, 2], [2, 3, 1, 0], [2, 1, 3, 0], [0, 1, 3, 2]], dtype=jnp.float32
    )  # 4 x 4

    last_h = float(h)
    rem_pos = pos
    levels_pos = []
    for _ in range(num_levels):
        cur_h = last_h / 2.0
        levels_pos.append(jnp.floor(rem_pos / cur_h))
        rem_pos = jnp.mod(rem_pos, cur_h)
        last_h = cur_h

    orders = []
    for i in range(num_levels):
        level_pos = levels_pos[i]
        if i == 0 and first_w is not None:
            level_pos_index = (level_pos[..., 0] + level_pos[..., 1] * first_w).astype(jnp.int32)
        else:
            level_pos_index = (level_pos[..., 0] + level_pos[..., 1] * 2).astype(jnp.int32)
        rotate = jnp.zeros((b, n), dtype=jnp.float32)
        for j in range(i):
            cur_level_pos = levels_pos[j]
            if j == 0 and first_w is not None:
                cidx = (cur_level_pos[..., 0] + cur_level_pos[..., 1] * first_w).astype(jnp.int32)
                cur_rotate = jnp.take(rotate_dict_f, cidx, axis=0)
            else:
                rotate_d = jnp.take(
                    rotate_flat, jnp.mod(rotate, 3).astype(jnp.int32), axis=0
                )  # (b, n, 4)
                cidx = (cur_level_pos[..., 0] + cur_level_pos[..., 1] * 2).astype(jnp.int32)
                cur_rotate = jnp.take_along_axis(rotate_d, cidx[..., None], axis=2)[..., 0]
            rotate = cur_rotate + rotate
        rotate = jnp.mod(rotate, 4)
        rotate_res = jnp.take(rot_res_dict, rotate.astype(jnp.int32), axis=0)  # (b, n, 4)
        rotate_res = jnp.take_along_axis(rotate_res, level_pos_index[..., None], axis=2)[..., 0]
        orders.append(rotate_res)

    final_order = orders[-1]
    for i in range(num_levels - 1):
        final_order = final_order + orders[i] * (4 ** (num_levels - i - 1))
    return _ranks_from_keys(final_order)
