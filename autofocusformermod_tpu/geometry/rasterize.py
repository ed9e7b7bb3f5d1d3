"""Point-cloud <-> grid rasterization.

Ports of ``points2img`` (point_utils.py:11-25) and the decoder-side
``point2img`` (mask2former_transformer_decoder.py:20-39): scatter tokens onto
an h x w canvas by their integer positions.  Scatters are deterministic
(`.at[].set`); blank cells are zero.
"""

from __future__ import annotations

import jax.numpy as jnp


def points2img(pos: jnp.ndarray, pixel: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """pos: (b, n, 2) integer canvas coords; pixel: (b, n, c) -> (b, c, h, w)."""
    b, n, c = pixel.shape
    idx = (pos[:, :, 1].astype(jnp.int32) * w + pos[:, :, 0].astype(jnp.int32))  # (b, n)
    batch_idx = jnp.broadcast_to(jnp.arange(b)[:, None], (b, n))
    img = jnp.zeros((b, h * w, c), dtype=pixel.dtype).at[batch_idx, idx].set(pixel)
    return img.transpose(0, 2, 1).reshape(b, c, h, w)


def point2img(x: jnp.ndarray, pos: jnp.ndarray, mask_size) -> jnp.ndarray:
    """Rasterize per-query mask logits onto the canvas.
    x: (b, q, n); pos: (b, n, 2); mask_size: (h, w) with h*w == n
    -> (b, q, h, w).  Port of mask2former_transformer_decoder.py:20-39
    (mask_size must be given: data-dependent canvas inference is not
    jit-compatible, and the only call site always covers the full canvas)."""
    b, q, n = x.shape
    h, w = mask_size
    assert h * w == n, f"h*w != n in point2img ({h}x{w} vs {n})"
    pos_idx = (pos[:, :, 1].astype(jnp.int32) * w + pos[:, :, 0].astype(jnp.int32))  # (b, n)
    batch_idx = jnp.broadcast_to(jnp.arange(b)[:, None, None], (b, q, n))
    query_idx = jnp.broadcast_to(jnp.arange(q)[None, :, None], (b, q, n))
    flat_idx = jnp.broadcast_to(pos_idx[:, None, :], (b, q, n))
    ret = jnp.zeros((b, q, h * w), dtype=x.dtype)
    ret = ret.at[batch_idx, query_idx, flat_idx].set(x)
    return ret.reshape(b, q, h, w)
