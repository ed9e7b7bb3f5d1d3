"""Flat global gathers — the fast row-lookup primitive on TPU.

XLA lowers ``jnp.take_along_axis`` with leading batch dimensions to a batched
gather kernel that runs ~5x slower than a single flat ``jnp.take`` at
identical row counts (measured on v5e: 127 ms vs 26 ms for 8.25M 32-float
rows).  Every neighborhood lookup in this framework therefore flattens the
batch into the row index and gathers from a (b*n, c) view.  The VJP
(transpose) of ``jnp.take`` is a deterministic flat scatter-add, preserving
the bitwise-reproducibility guarantee of ops/clusten.py.
"""

from __future__ import annotations

import jax.numpy as jnp


def take_rows(feat: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """feat: (b, n, c); idx: (b, ...) int -> (b, ..., c)."""
    b, n, c = feat.shape
    boff = (jnp.arange(b, dtype=jnp.int32) * n).reshape(
        (b,) + (1,) * (idx.ndim - 1)
    )
    gidx = (idx.astype(jnp.int32) + boff).reshape(-1)
    # mode="clip": every caller constructs in-bounds indices (knn / clamped
    # grid snaps / packed tables), and jnp.take's default "fill" mode lowers
    # to gather + a full select_n pass over the output (measured ~0.8 ms per
    # encoder-layer lookup at 512x512 batch 4) to patch out-of-bounds rows.
    out = jnp.take(feat.reshape(b * n, c), gidx, axis=0, mode="clip")
    return out.reshape(*idx.shape, c)


def take_scalars(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """x: (b, n); idx: (b, ...) int -> (b, ...)."""
    b, n = x.shape
    boff = (jnp.arange(b, dtype=jnp.int32) * n).reshape(
        (b,) + (1,) * (idx.ndim - 1)
    )
    gidx = (idx.astype(jnp.int32) + boff).reshape(-1)
    return jnp.take(x.reshape(b * n), gidx, axis=0, mode="clip").reshape(
        idx.shape
    )
