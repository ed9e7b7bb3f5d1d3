"""Analytic nearest-neighbor lookups when the token set covers a full grid.

For AFF, the finest (res2 / mask-features) level is always the complete
stride-4 grid — only *permuted* by the space-filling reorder.  The reference
still runs brute-force KNN against it (pykeops) for Shepard upsampling and
PointConv (msdeformattn_pc.py:295, mask2former_transformer_decoder.py:484);
on TPU that is a pointless O(n_q x n_db) distance sweep (measured ~900 ms for
the PointConv KNN alone at 512x512).  Here neighbors come from a small
candidate window around each query — top-k over 16 (k=4) / 25 (k=9) local
candidates — which is EXACT: the true k nearest lattice nodes always lie in
that window (out-of-grid candidates get +inf distance).  Token indices resolve
through a scatter-built position->index LUT.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.clusten import weighted_gather
from .shepard import shepard_decay_weights

_FAR = 1e10


def pos_index_lut(pos: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """pos: (b, n, 2) — a permutation of the full h x w grid -> (b, h*w) LUT
    mapping row-major cell id to token index."""
    b, n, _ = pos.shape
    assert n == h * w, f"token set does not cover the grid: {n} != {h}*{w}"
    cell = (pos[..., 1].astype(jnp.int32) * w + pos[..., 0].astype(jnp.int32))
    batch_idx = jnp.broadcast_to(jnp.arange(b)[:, None], (b, n))
    lut = jnp.zeros((b, h * w), jnp.int32).at[batch_idx, cell].set(
        jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (b, n))
    )
    return lut


def _window_knn(query: jnp.ndarray, h: int, w: int, half: int, k: int,
                lut: Optional[jnp.ndarray] = None,
                identity_lut: bool = False):
    """Exact k-NN among grid nodes via a (2*half+2)x(2*half+2) candidate
    window anchored at floor(query).

    Without ``lut``: returns (cells (b,nq,k), d2 (b,nq,k)), distance ties
    broken by candidate-window position.  With ``lut`` (cell -> token index):
    returns (token_idx (b,nq,k), d2), ties broken by LOWEST TOKEN INDEX —
    the same semantics as brute-force knn() over the token set, which matters
    because half-integer query coords (scale_pos) tie exactly between nodes.
    ``identity_lut=True`` declares token index == cell id (raster-ordered
    token set): the LUT gather disappears but tie semantics stay
    lowest-token-index."""
    x = query[..., 0]
    y = query[..., 1]
    fx = jnp.floor(jnp.clip(x, 0, w - 1))
    fy = jnp.floor(jnp.clip(y, 0, h - 1))
    offs = jnp.arange(-half, half + 2, dtype=jnp.float32)  # window side
    cx = fx[..., None] + offs                                # (b, nq, win)
    cy = fy[..., None] + offs
    # all (win x win) combinations
    gx = cx[..., :, None]                                    # (b, nq, win, 1)
    gy = cy[..., None, :]                                    # (b, nq, 1, win)
    d2 = (gx - x[..., None, None]) ** 2 + (gy - y[..., None, None]) ** 2
    oob = (gx < 0) | (gx > w - 1) | (gy < 0) | (gy > h - 1)
    d2 = jnp.where(oob, _FAR, d2)
    win = offs.shape[0]
    d2 = d2.reshape(*x.shape, win * win)
    cells = (
        jnp.clip(gy, 0, h - 1) * w + jnp.clip(gx, 0, w - 1)
    ).astype(jnp.int32).reshape(*x.shape, win * win)
    if lut is None and not identity_lut:
        neg, idx = jax.lax.top_k(-d2, k)
        return jnp.take_along_axis(cells, idx, axis=-1), -neg
    if identity_lut:
        tok = cells                                    # token index == cell id
    else:
        from ..ops.gather import take_scalars

        tok = take_scalars(lut, cells)                 # (b, nq, win*win)
    # lexicographic (d2, token) via XLA's single-pass multi-key sort
    d2s, toks = jax.lax.sort((d2, tok), dimension=-1, num_keys=2)
    return toks[..., :k], d2s[..., :k]


def grid_nn(query: jnp.ndarray, h: int, w: int, k: int = 4):
    """Exact k nearest grid nodes for arbitrary query points.
    k=4 uses a 4x4 window, k<=9 a 6x6 window."""
    half = 1 if k <= 4 else 2
    return _window_knn(query, h, w, half, k)


def grid_shepard_upsample(
    query: jnp.ndarray,
    db_pos: jnp.ndarray,
    feature: Optional[jnp.ndarray],
    h: int,
    w: int,
    power=3.0,
    lut: Optional[jnp.ndarray] = None,
    return_weight_and_idx: bool = False,
    identity_lut: bool = False,
):
    """Shepard interpolation against a full-grid database: exact window
    neighbors + LUT, no distance matrix.  Matches
    upsample_feature_shepard(query, db_pos, feature, k=4) semantics.
    ``identity_lut=True``: the database is raster-ordered (token == cell), so
    no LUT is built or gathered."""
    if lut is None and not identity_lut:
        lut = pos_index_lut(db_pos, h, w)
    nn_idx, d2 = _window_knn(query, h, w, 1, 4, lut=lut,
                             identity_lut=identity_lut)
    weights = shepard_decay_weights(d2, power=power)
    if return_weight_and_idx:
        return weights, nn_idx
    return weighted_gather(nn_idx, weights, feature)


def grid_neighbors9(pos: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """For a full-grid token set: each token's exact 9 nearest tokens as token
    indices (b, n, 9).  Replaces knn(pos, pos, 9) in PointConv."""
    lut = pos_index_lut(pos, h, w)
    nn_idx, _ = _window_knn(pos.astype(jnp.float32), h, w, 2, 9, lut=lut)
    return nn_idx


def point2img_lut(x: jnp.ndarray, pos: jnp.ndarray, mask_size,
                  lut: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Gather-based rasterization for full-grid token sets: instead of
    scattering (b, q, n) logits (rasterize.point2img), gather by the inverse
    permutation — gathers pipeline far better than scatters on TPU.
    x: (b, q, n); pos: (b, n, 2) covering the grid -> (b, q, h, w)."""
    b, q, n = x.shape
    h, w = mask_size
    assert h * w == n
    if lut is None:
        lut = pos_index_lut(pos, h, w)
    out = jnp.take_along_axis(x, lut[:, None, :], axis=2)
    return out.reshape(b, q, h, w)
