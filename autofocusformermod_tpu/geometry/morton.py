"""Morton (Z-order) ranks for power-of-two grids.

Used to reorder the pixel decoder's finest-grid neighbor tables so that
spatially-local lookups become RANK-local: consecutive space-filling-curve
queries then hit a narrow band window of the reordered table, which is what
lets the windowed lane-gather kernel (ops/pallas/window_gather.py) replace
the XLA row gather (reference msdeformattn_pc.py:186-194 does this lookup
with a CUDA gather; raster order there is fine because gathers are
random-access on GPU — on TPU the win comes from banded locality, so the
order IS the optimization).

Rectangular grids interleave the low min(log2(W), log2(H)) bits of x and y
and carry the longer dimension's high bits as the most-significant block —
dense ranks in [0, W*H) for any power-of-two W, H.
"""

from __future__ import annotations

import functools

import numpy as np


def _spread_bits(v):
    """Insert a zero between consecutive bits (supports values < 2^16).
    Works on numpy arrays and jax arrays alike (pure ops)."""
    v = (v | (v << 8)) & 0x00FF00FF
    v = (v | (v << 4)) & 0x0F0F0F0F
    v = (v | (v << 2)) & 0x33333333
    v = (v | (v << 1)) & 0x55555555
    return v


def morton_rank(gx, gy, log2_w: int, log2_h: int):
    """Dense Morton rank of integer cell coords on a (2^log2_h, 2^log2_w)
    grid.  gx/gy: int32 arrays (numpy or jax).  Returns same-shape int32."""
    m = min(log2_w, log2_h)
    mask = (1 << m) - 1
    xs = _spread_bits(gx & mask)
    ys = _spread_bits(gy & mask)
    rank = (xs << 1) | ys
    if log2_w > log2_h:
        rank = rank | ((gx >> m) << (2 * m))
    elif log2_h > log2_w:
        rank = rank | ((gy >> m) << (2 * m))
    return rank


@functools.lru_cache(maxsize=None)
def morton_perm(h: int, w: int) -> np.ndarray:
    """Static permutation: perm[rank] = raster cell id (gy*w + gx), so
    ``table[perm]`` lists rows in Morton order.  h, w must be powers of 2."""
    log2_w = int(w).bit_length() - 1
    log2_h = int(h).bit_length() - 1
    assert (1 << log2_w) == w and (1 << log2_h) == h
    ys, xs = np.meshgrid(
        np.arange(h, dtype=np.int64), np.arange(w, dtype=np.int64),
        indexing="ij",
    )
    rank = morton_rank(xs.reshape(-1), ys.reshape(-1), log2_w, log2_h)
    perm = np.empty(h * w, dtype=np.int32)
    perm[rank] = np.arange(h * w, dtype=np.int32)
    return perm


def is_pow2(v: int) -> bool:
    return v > 0 and (v & (v - 1)) == 0
