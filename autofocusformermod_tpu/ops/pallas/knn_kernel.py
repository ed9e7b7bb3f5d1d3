"""Fused exact-KNN Pallas kernel (2-D positions, small k).

The XLA path (geometry/knn.py) materializes the (nq, ndb) squared-distance
matrix in HBM and sweeps it k times for argmin extraction — ~30 ms of pure
HBM traffic per forward for the pixel decoder's three grid->level 4-NN
tables at 512x512 batch 4.  This kernel keeps every distance tile in
registers and prunes chunks:

  - the wrapper SORTS the database spatially (key y*4096+x, exact in fp32
    below 2^24) so database chunks are spatially compact, and passes the
    inverse permutation; the kernel carries each candidate's ORIGINAL index
    and uses it as the tie key, so results are identical to brute-force
    argsort over the unsorted database (lowest-original-index ties) — the
    model's token order is importance-sorted, so without this sort no chunk
    could ever be pruned;
  - grid (b, nq/BQ); queries/database carried TOKEN-LAST (2, n);
  - per program, database chunks are visited in PROXIMITY ORDER (a
    bbox-to-bbox lower-bound distance per (query-block, chunk), computed in
    XLA outside and argsorted — a (nb, nchunks)-sized problem), so the
    nearest chunk is merged first and the running k-th-best bound is tight
    immediately;
  - the visit loop EXITS as soon as the next chunk's lower bound strictly
    exceeds every query's current k-th best (ties kept: a later chunk at
    exactly the k-th distance can still win on the lower-original-index tie
    rule), and a chunk that survives the bound but whose actual minimum
    distance exceeds the bound is still skipped after one reduction
    (`pl.when` on a scalar).  The old order-0..n sweep merged ~all chunks
    because the bound stayed +inf until a near chunk happened to arrive
    (measured 3.45 ms for the 16384x4096 pixel-decoder tables).

No gradient (positions are geometry; knn() already stop_gradients).
Used by geometry.knn.knn on TPU for large 2-D problems; the XLA sweep
remains the fallback and the semantic reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_Q = 256
BLOCK_DB = 512
_FAR = 1e30
_BIG_I = 2**30


def _extract_k(d2, key, k):
    """Top-k of each row of d2 (BQ, W), ascending, ties by LOWEST key.
    key: (BQ, W) int32, unique per row.  Returns (dists, keys) (BQ, k)."""
    outs_d, outs_i = [], []
    cur = d2
    for _ in range(k):
        m = jnp.min(cur, axis=1, keepdims=True)                 # (BQ, 1)
        kk_ = jnp.min(jnp.where(cur == m, key, jnp.int32(_BIG_I)), axis=1,
                      keepdims=True)
        outs_d.append(m)
        outs_i.append(kk_)
        cur = jnp.where(key == kk_, _FAR, cur)
    return jnp.concatenate(outs_d, 1), jnp.concatenate(outs_i, 1)


def _kernel(order_ref, lb_ref, q_ref, db_ref, orig_ref, idx_ref, dist_ref,
            rd_ref, ri_ref, *, k, ndb_pad):
    bq = q_ref.shape[2]
    qx = q_ref[0, 0, :].reshape(bq, 1)
    qy = q_ref[0, 1, :].reshape(bq, 1)

    n_chunks = ndb_pad // BLOCK_DB
    bi = pl.program_id(0)
    nbi = pl.program_id(1)

    rd_ref[...] = jnp.full((bq, k), _FAR, jnp.float32)
    ri_ref[...] = jnp.full((bq, k), _BIG_I, jnp.int32)

    # NOTE (measured, v5e): per-chunk bbox pruning of the distance tile
    # INSIDE the old 0..n sweep was ~10% slower (scalar-reduction stalls).
    # The win comes from hoisting the bounds OUT (XLA computes + argsorts
    # them) and turning them into loop control: proximity-first visitation
    # plus early exit.

    def body(carry):
        it, lb_it, worst_kth = carry
        cb = order_ref[bi, nbi, it]
        dx = db_ref[0, 0, pl.ds(cb * BLOCK_DB, BLOCK_DB)].reshape(1, BLOCK_DB)
        dy = db_ref[0, 1, pl.ds(cb * BLOCK_DB, BLOCK_DB)].reshape(1, BLOCK_DB)
        ddx = qx - dx
        ddy = qy - dy
        d2 = ddx * ddx + ddy * ddy                              # (BQ, BD)
        # padded db slots carry _FAR-away positions: never in any top-k
        chunk_min = jnp.min(d2)

        # strictly-worse chunks can neither displace nor tie into the top-k
        @pl.when(chunk_min <= worst_kth)
        def _merge(d2=d2, cb=cb):
            orig = jnp.broadcast_to(
                orig_ref[0, 0:1, pl.ds(cb * BLOCK_DB, BLOCK_DB)],
                (bq, BLOCK_DB),
            )
            cd, ci = _extract_k(d2, orig, k)
            md = jnp.concatenate([rd_ref[...], cd], axis=1)     # (BQ, 2k)
            mi = jnp.concatenate([ri_ref[...], ci], axis=1)
            nd, ni = _extract_k(md, mi, k)
            rd_ref[...] = nd
            ri_ref[...] = ni

        it = it + 1
        nxt = jnp.minimum(it, n_chunks - 1)
        return (it, lb_ref[bi, nbi, nxt], jnp.max(rd_ref[:, k - 1]))

    def cond(carry):
        it, lb_it, worst_kth = carry
        # keep lb == worst chunks: an equal-distance candidate with a lower
        # original index still displaces the current k-th on the tie rule
        return jnp.logical_and(it < n_chunks, lb_it <= worst_kth)

    jax.lax.while_loop(
        cond, body, (jnp.int32(0), lb_ref[bi, nbi, 0], jnp.float32(_FAR))
    )

    idx_ref[0] = ri_ref[...]
    dist_ref[0] = rd_ref[...]


def knn_pallas_supported(query, database, k: int) -> bool:
    b, nq, d = query.shape
    ndb = database.shape[1]
    return (
        d == 2 and 1 <= k <= 16 and ndb >= 2 * BLOCK_DB and nq >= BLOCK_Q
    )


def knn_pallas(query, database, k: int, interpret: bool = False):
    """query: (b, nq, 2); database: (b, ndb, 2) -> (idx (b, nq, k) int32,
    d2 (b, nq, k) f32) — identical to brute-force stable argsort (ascending
    distance, ties by lowest database index)."""
    b, nq, _ = query.shape
    ndb = database.shape[1]

    qf = query.astype(jnp.float32)
    dbf = database.astype(jnp.float32)
    # spatial sort for chunk compactness; original index rides along as the
    # tie key.  y*4096+x is exact in fp32 for canvases below 4096.
    skey = dbf[..., 1] * 4096.0 + dbf[..., 0]
    perm = jnp.argsort(skey, axis=1)                            # (b, ndb)
    dbs = jnp.take_along_axis(dbf, perm[..., None], axis=1)
    orig = perm.astype(jnp.int32)

    q_t = qf.transpose(0, 2, 1)                                 # (b, 2, nq)
    db_t = dbs.transpose(0, 2, 1)                               # (b, 2, ndb)
    orig_t = orig[:, None, :]                                   # (b, 1, ndb)
    pad_q = (-nq) % BLOCK_Q
    if pad_q:
        q_t = jnp.pad(q_t, ((0, 0), (0, 0), (0, pad_q)))
    pad_db = (-ndb) % BLOCK_DB
    if pad_db:
        # far-away padding keeps padded slots out of every top-k
        db_t = jnp.pad(db_t, ((0, 0), (0, 0), (0, pad_db)),
                       constant_values=-(2.0 ** 30))
        orig_t = jnp.pad(orig_t, ((0, 0), (0, 0), (0, pad_db)),
                         constant_values=2**30)
    nq_pad = q_t.shape[2]
    ndb_pad = db_t.shape[2]
    nb = nq_pad // BLOCK_Q
    n_chunks = ndb_pad // BLOCK_DB

    # proximity-ordered chunk visitation: bbox-to-bbox lower-bound distances
    # per (query-block, chunk), argsorted ascending.  Conservative under
    # padding: padded queries are zeros (only widen the query bbox) and the
    # partial last db chunk's pad positions are -(2^30) (its bbox widens so
    # its bound only shrinks — never prunes what it shouldn't).
    qb = q_t.reshape(b, 2, nb, BLOCK_Q)
    qmin = jnp.min(qb, axis=3)                                  # (b, 2, nb)
    qmax = jnp.max(qb, axis=3)
    cb_ = db_t.reshape(b, 2, n_chunks, BLOCK_DB)
    cmin = jnp.min(cb_, axis=3)                                 # (b, 2, nch)
    cmax = jnp.max(cb_, axis=3)
    gap = jnp.maximum(
        0.0,
        jnp.maximum(
            cmin[:, :, None, :] - qmax[:, :, :, None],
            qmin[:, :, :, None] - cmax[:, :, None, :],
        ),
    )                                                           # (b,2,nb,nch)
    lb = jnp.sum(gap * gap, axis=1)                             # (b, nb, nch)
    order = jnp.argsort(lb, axis=-1).astype(jnp.int32)
    lb_sorted = jnp.take_along_axis(lb, order, axis=-1)

    idx, d2 = pl.pallas_call(
        functools.partial(_kernel, k=k, ndb_pad=ndb_pad),
        grid=(b, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 2, BLOCK_Q), lambda bi, qi: (bi, 0, qi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, ndb_pad), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ndb_pad), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, BLOCK_Q, k), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_Q, k), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, nq_pad, k), jnp.int32),
            jax.ShapeDtypeStruct((b, nq_pad, k), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((BLOCK_Q, k), jnp.float32),
            pltpu.VMEM((BLOCK_Q, k), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(order, lb_sorted, q_t, db_t, orig_t)
    return idx[:, :nq], d2[:, :nq]
