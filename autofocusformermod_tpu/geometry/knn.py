"""Exact k-nearest-neighbor search for 2-D/3-D token positions.

TPU-native replacement for the reference's pykeops brute-force KNN
(reference: mask2former/modeling/backbone/point_utils.py:28-60 `knn_keops`).

Design: the pairwise squared-distance matrix is computed as
``|q|^2 - 2 q.db^T + |db|^2`` — the cross term is a matmul, which lands on
the MXU — followed by ``jax.lax.top_k`` on the negated distances.  Queries
are processed in static-size chunks via ``lax.map`` so peak HBM for the
distance tile stays bounded regardless of n_query * n_database.

Everything is float32: positions are small integers (canvas coords), so fp32
pairwise distances are exact; ties broken by lowest database index, matching
brute-force argsort semantics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# max elements in one (chunk x n_db) distance tile, per batch element
_TILE_BUDGET = 1 << 25  # 32M elems (128 MB f32 tile) - few chunks, deep pipelines


def _chunk_size(n_query: int, n_db: int) -> int:
    c = max(1, _TILE_BUDGET // max(n_db, 1))
    c = min(c, n_query)
    # round to a multiple of 8 (sublane) when possible
    if c >= 8:
        c = (c // 8) * 8
    return c


def _pairwise_sqdist(q: jnp.ndarray, db: jnp.ndarray) -> jnp.ndarray:
    """q: (m, d), db: (n, d) -> (m, n) squared Euclidean distances.

    Direct (q-db)^2 form rather than |q|^2 - 2q.db + |db|^2: the matmul form
    suffers fp32 cancellation that reorders near-tied neighbors, and with
    d in {2, 3} the broadcast-subtract costs only d VPU multiplies per pair —
    exactness for free."""
    diff = q[:, None, :] - db[None, :, :]
    return jnp.sum(diff * diff, axis=-1)


@functools.partial(jax.jit, static_argnames=("k", "return_dist"))
def knn(query: jnp.ndarray, database: jnp.ndarray, k: int, return_dist: bool = False):
    """Exact KNN: for each query point, indices of the k nearest database points.

    Args:
        query    - (b, nq, d) float positions
        database - (b, ndb, d) float positions
        k        - number of neighbors (static)
        return_dist - also return Euclidean (sqrt) distances,
                      mirroring knn_keops(return_dist=True)
    Returns:
        nn_idx  - (b, nq, k) int32
        nn_dist - (b, nq, k) float32 (only if return_dist)
    """
    query = jax.lax.stop_gradient(query).astype(jnp.float32)
    database = jax.lax.stop_gradient(database).astype(jnp.float32)
    b, nq, d = query.shape
    ndb = database.shape[1]
    assert k <= ndb, f"k={k} > n_database={ndb}"

    from ..ops.dispatch import fused_attention_available
    from ..ops.pallas.knn_kernel import knn_pallas, knn_pallas_supported

    if fused_attention_available() and knn_pallas_supported(query, database, k):
        # fused Pallas path: distance tiles never leave registers and
        # far chunks of the spatially-sorted database are pruned — tie
        # semantics identical (tests/test_geometry.py)
        idx, dist2 = knn_pallas(query, database, k)
        if return_dist:
            return idx, jnp.sqrt(dist2)
        return idx

    chunk = _chunk_size(nq, ndb)
    num_chunks = -(-nq // chunk)
    pad = num_chunks * chunk - nq
    q_pad = jnp.pad(query, ((0, 0), (0, pad), (0, 0)))
    q_chunks = q_pad.reshape(b, num_chunks, chunk, d).swapaxes(0, 1)

    def extract_k(d2, kk):
        """Iterative argmin extraction: ~7x faster than lax.top_k on TPU for
        small k (top_k lowers to a full sort) and tie-identical (argmin takes
        the lowest index, like top_k)."""
        col = jax.lax.broadcasted_iota(jnp.int32, d2.shape, d2.ndim - 1)
        idxs, dists = [], []
        for _ in range(kk):
            i = jnp.argmin(d2, axis=-1)
            idxs.append(i.astype(jnp.int32))
            dists.append(jnp.take_along_axis(d2, i[..., None], axis=-1)[..., 0])
            d2 = jnp.where(col == i[..., None], jnp.inf, d2)
        return jnp.stack(idxs, -1), jnp.stack(dists, -1)

    def process(q_c):  # (b, chunk, d)
        d2 = jax.vmap(_pairwise_sqdist)(q_c, database)         # (b, chunk, ndb)
        # NOTE (measured, v5e): a two-level block-min extraction (one min
        # pass + per-query gather of the k best 128-wide blocks) is 1.6-2.6x
        # SLOWER than the plain k-sweep below — the b*nq*k candidate row
        # gather costs more than the saved argmin passes.  Don't retry.
        if k <= 16:
            return extract_k(d2, k)
        neg, idx = jax.lax.top_k(-d2, k)
        return idx.astype(jnp.int32), -neg

    if num_chunks == 1:
        idx, dist2 = process(q_chunks[0])
        idx = idx[:, :nq]
        dist2 = dist2[:, :nq]
    else:
        idx, dist2 = jax.lax.map(process, q_chunks)            # (nc, b, chunk, k)
        idx = idx.swapaxes(0, 1).reshape(b, num_chunks * chunk, k)[:, :nq]
        dist2 = dist2.swapaxes(0, 1).reshape(b, num_chunks * chunk, k)[:, :nq]

    if return_dist:
        return idx, jnp.sqrt(dist2)
    return idx
