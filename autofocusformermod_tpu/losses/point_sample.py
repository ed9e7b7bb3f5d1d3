"""Point sampling of mask logits — PointRend-style utilities.

JAX equivalents of detectron2's ``point_sample`` and
``get_uncertain_point_coords_with_randomness`` as used by the reference
criterion (criterion.py:159-180) and matcher (matcher.py:121-133).

``point_sample`` matches torch ``grid_sample(align_corners=False,
padding_mode='zeros')`` on coords in [0, 1].
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def point_sample(masks: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Bilinear-sample masks at normalized coordinates.

    masks  - (n, h, w)
    coords - (n, p, 2) in [0, 1], (x, y) order
    returns (n, p)

    Four scalar taps per point.  NOTE: fetching the 2x2 corner window with a
    single lax.gather (slice_sizes=(2,2)) would cut gathered rows 4x, but
    XLA on this TPU runtime materializes it catastrophically (19.6 GB HBM at
    compile for an (80, 37632)-point sample) — measured and rejected.  When
    all masks share the same points use ``point_sample_shared`` instead."""
    n, h, w = masks.shape
    x = coords[..., 0] * w - 0.5
    y = coords[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    flat = masks.reshape(n * h * w)
    row0 = (jnp.arange(n, dtype=jnp.int32) * (h * w))[:, None]

    def tap(xi, yi):
        # flat global element gather — XLA's batched gather path is ~5x
        # slower at identical element counts (see ops/gather.py)
        inb = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        v = jnp.take(flat, (row0 + yi_c * w + xi_c).reshape(-1), axis=0)
        return jnp.where(inb, v.reshape(xi.shape), 0.0)

    v00 = tap(x0, y0)
    v01 = tap(x0 + 1, y0)
    v10 = tap(x0, y0 + 1)
    v11 = tap(x0 + 1, y0 + 1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def point_sample_shared(masks: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """``point_sample`` when every mask is sampled at the SAME points.

    masks - (m, h, w); coords - (p, 2) in [0, 1] -> (m, p).

    Identical math to ``point_sample`` with broadcast coords, but gathers p
    rows of the transposed (h*w, m) matrix instead of m*p scalar rows of
    (m, h*w): XLA/TPU gathers are row-rate-bound, so moving m values per
    gathered row is ~m times faster.  This is the matcher's hot path
    (q+t masks x 12544 shared points per image per aux layer)."""
    m, h, w = masks.shape
    flat_t = masks.reshape(m, h * w).T                     # (h*w, m)
    return point_sample_shared_t(flat_t, h, w, coords)


def point_sample_shared_t(flat_t: jnp.ndarray, h: int, w: int,
                          coords: jnp.ndarray) -> jnp.ndarray:
    """``point_sample_shared`` on a PRE-transposed (h*w, m) mask matrix.

    The transpose is a real minor-dim relayout on TPU; callers that sample
    the same masks repeatedly (the criterion's 10 deep-supervision matcher
    layers all sample the unchanged GT masks at fresh points) hoist it once
    instead of paying it per layer."""
    m = flat_t.shape[1]
    x = coords[:, 0] * w - 0.5
    y = coords[:, 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)[:, None]
    wy = (y - y0)[:, None]

    def tap(xi, yi):
        inb = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        v = jnp.take(flat_t, yi_c * w + xi_c, axis=0)      # (p, m)
        return jnp.where(inb[:, None], v, 0.0)

    v00 = tap(x0, y0)
    v01 = tap(x0 + 1, y0)
    v10 = tap(x0, y0 + 1)
    v11 = tap(x0 + 1, y0 + 1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return (top * (1 - wy) + bot * wy).T                   # (m, p)


def point_sample_shared_batch(flat_t: jnp.ndarray, h: int, w: int,
                              coords: jnp.ndarray) -> jnp.ndarray:
    """Batched ``point_sample_shared_t``: flat_t (b, h*w, m), coords
    (b, p, 2) -> (b, m, p).

    Bit-identical to ``vmap(point_sample_shared_t)`` but gathers through ONE
    flat (b*h*w, m) take with batch folded into the row index: the vmapped
    form lowers to XLA's batched gather, measured ~4.4x slower per row (the
    criterion's four matcher-target taps were 4.0 ms each at flagship
    shapes; flat they are row-rate-bound like every other gather)."""
    b, hw, m = flat_t.shape
    flat = flat_t.reshape(b * hw, m)
    row0 = (jnp.arange(b, dtype=jnp.int32) * hw)[:, None]
    x = coords[..., 0] * w - 0.5
    y = coords[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)[..., None]                                # (b, p, 1)
    wy = (y - y0)[..., None]

    def tap(xi, yi):
        inb = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        v = jnp.take(flat, (row0 + yi_c * w + xi_c).reshape(-1), axis=0)
        return jnp.where(inb[..., None], v.reshape(*xi.shape, m), 0.0)

    v00 = tap(x0, y0)
    v01 = tap(x0 + 1, y0)
    v10 = tap(x0, y0 + 1)
    v11 = tap(x0 + 1, y0 + 1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return (top * (1 - wy) + bot * wy).transpose(0, 2, 1)  # (b, m, p)


def point_sample_auto(masks: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """``point_sample`` routed through the fused one-hot MXU kernel on TPU
    (ops/pallas/point_sample_kernel.py — dense matmuls instead of ~110M/s
    element gathers; the criterion's dominant cost) with the XLA flat-gather
    path as the semantic reference and CPU/odd-shape fallback."""
    from ..ops.dispatch import fused_attention_available
    from ..ops.pallas.point_sample_kernel import (
        point_sample_pallas,
        point_sample_pallas_supported,
    )

    if fused_attention_available() and point_sample_pallas_supported(
        masks, coords
    ):
        return point_sample_pallas(masks, coords)
    return point_sample(masks, coords)


def calculate_uncertainty(logits: jnp.ndarray) -> jnp.ndarray:
    """Uncertainty = -|logit| (criterion.py:67-81). logits: (n, p) -> (n, p)."""
    return -jnp.abs(logits)


# y-stratified ranking candidates on TPU (see get_uncertain_point_coords_
# nn_ranked); module switch so tests can pin the i.i.d. reference draw.
STRATIFY_RANKING = True

# Stratified top-k for the uncertainty ranking on TPU: lax.top_k lowers to a
# full (n, 3*num_points) sort — 25 ms of the criterion forward at flagship
# shapes — and approx_max_k degenerates to the same sort at k/n = 25%
# (measured: ApproxTopK with aggregate_to_topk still sorts the aggregate).
# When the candidates are y-stratified (STRATIFY_RANKING) the selection
# becomes top-(k/chunks) WITHIN each 128-candidate chunk: tiny lane-wide
# sorts instead of one 37632-wide sort.  Selection drift vs the reference's
# global top-k: a stratum's winners are capped at k/chunks, so rows whose
# uncertainty mass concentrates in one image band trade a few borderline
# picks for random ones elsewhere — the same character as the stratification
# itself (selection-only randomness; supervision stays continuous), and the
# cap adds spatial coverage.  Module switch so tests can pin the exact
# global ranking.
STRATIFIED_TOPK = True


def _counter_uniform(seed: jnp.ndarray, ctr: jnp.ndarray) -> jnp.ndarray:
    """Stateless uniform in [0, 1) from a uint32 counter (murmur3 finalizer).

    The point of a *counter-based* generator: a value can be recomputed from
    its index alone.  After ``top_k`` picks candidate indices, the winning
    coordinates are re-derived from the indices with a few VPU ops instead of
    a row gather of (n, k, 2) from (n, ns, 2) — the gather is row-rate-bound
    at ~90M rows/s and cost more than the top_k itself (118 ms vs 36 ms
    measured for the criterion's ranking pass at n=800, ns=37632, k=9408).
    24-bit mantissa scaling keeps the result strictly below 1.0."""
    x = (ctr * jnp.uint32(0x9E3779B9)) + seed
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return (x >> 8).astype(jnp.float32) * jnp.float32(2**-24)


def get_uncertain_point_coords_nn_ranked(
    key: jax.Array,
    mask_logits: jnp.ndarray,
    num_points: int,
    oversample_ratio: float,
    importance_sample_ratio: float,
) -> jnp.ndarray:
    """``get_uncertain_point_coords_with_randomness`` with a cheap ranking tap.

    Candidate coords are continuous uniforms exactly like the reference
    (criterion.py:161-167); only the *ranking* logit per candidate is read
    with a single nearest-cell gather instead of a 4-tap bilinear
    interpolation.  Ranking is a stop-gradient selection heuristic — the
    returned coords are the original continuous candidates, so the
    supervision math downstream (bilinear sample of src and target at
    continuous points) is unchanged.  Element gathers are the criterion's
    dominant cost on TPU (~110M elem/s), and the 3x-oversampled ranking pass
    is the largest gather, so this cuts it 4x.

    NOTE an earlier variant snapped the *returned* coords to cell centers to
    make supervision 1-tap too; that demonstrably degrades training (loss
    climbs when overfitting a tiny batch) because supervision at exact cell
    centers removes the bilinear gradient spreading to neighboring cells.
    Keep supervision continuous.
    """
    n, h, w = mask_logits.shape
    num_sampled = int(num_points * oversample_ratio)
    chunks = num_sampled // 128
    k1, k2 = jax.random.split(key)
    # Counter-hashed candidates (one threefry call for the seeds, then pure
    # VPU mixing).  Candidates are selection-only randomness — the reference
    # draws torch.rand here, so there is no bitwise-RNG parity to preserve —
    # and the counter form lets the top-k winners be recomputed below
    # instead of gathered (see _counter_uniform).
    seeds = jax.random.bits(k1, (2,), jnp.uint32)
    ctr = jnp.arange(n * num_sampled, dtype=jnp.uint32).reshape(n, num_sampled)
    ux = _counter_uniform(seeds[0], ctr)
    uy = _counter_uniform(seeds[1], ctr)

    from ..ops.dispatch import fused_attention_available
    from ..ops.pallas.point_sample_kernel import (
        point_sample_nearest_pallas,
        point_sample_nearest_rows_pallas,
        point_sample_nearest_rows_supported,
        point_sample_nearest_supported,
    )

    on_tpu = fused_attention_available()
    stratified = (
        STRATIFY_RANKING
        and on_tpu
        and point_sample_nearest_rows_supported(n, h, w, num_sampled)
    )

    def _y_of(u, j):
        """Candidate y from its uniform and its within-mask index."""
        if not stratified:
            return u
        # y-stratified: candidate j lies in the sliver [c/chunks, (c+1)/
        # chunks), c = j // 128.  Marginally still exactly uniform (equal
        # count per equal-area stratum; the reference's i.i.d. draw has the
        # same marginal, stratification only lowers coverage variance), and
        # it pins each 128-candidate chunk to two adjacent image rows so the
        # ranking read is two single-vreg lane gathers instead of a
        # full-width one-hot matmul (71 -> ~14 ms at N=800).
        return ((j // 128).astype(jnp.float32) + u) * (1.0 / chunks)

    j_all = jnp.broadcast_to(
        jnp.arange(num_sampled, dtype=jnp.int32)[None, :], (n, num_sampled)
    )
    ys = _y_of(uy, j_all)
    coords = jnp.stack([ux, ys], axis=-1)

    if stratified:
        cx = jnp.clip((ux * w).astype(jnp.int32), 0, w - 1)
        cy = jnp.clip((ys * h).astype(jnp.int32), 0, h - 1)
        logits = point_sample_nearest_rows_pallas(
            mask_logits,
            cx.reshape(n, chunks, 128),
            cy.reshape(n, chunks, 128),
        ).reshape(n, num_sampled)
    elif on_tpu and point_sample_nearest_supported(mask_logits, coords):
        # dedicated 1-tap nearest-read kernel (single-compare one-hots, bf16
        # MXU pass — ~1.7x the snapped-bilinear kernel on the ranking pass)
        logits = point_sample_nearest_pallas(mask_logits, coords)
    else:
        cx = jnp.clip((coords[..., 0] * w).astype(jnp.int32), 0, w - 1)
        cy = jnp.clip((coords[..., 1] * h).astype(jnp.int32), 0, h - 1)
        flat = mask_logits.reshape(n * h * w)
        row0 = (jnp.arange(n, dtype=jnp.int32) * (h * w))[:, None]
        logits = jnp.take(
            flat, (row0 + cy * w + cx).reshape(-1), axis=0
        ).reshape(n, num_sampled)
    unc = calculate_uncertainty(logits)

    num_uncertain = int(importance_sample_ratio * num_points)
    num_random = num_points - num_uncertain
    if (STRATIFIED_TOPK and stratified and num_uncertain % chunks == 0):
        k_per = num_uncertain // chunks
        _, loc = jax.lax.top_k(unc.reshape(n * chunks, 128), k_per)
        idx = (
            loc.reshape(n, chunks, k_per)
            + (jnp.arange(chunks, dtype=jnp.int32) * 128)[None, :, None]
        ).reshape(n, num_uncertain)
    else:
        _, idx = jax.lax.top_k(unc, num_uncertain)
    # Recompute the winners from their counters — no (n, k, 2) row gather.
    ctr_pick = ctr[:, :1] + idx.astype(jnp.uint32)
    picked = jnp.stack(
        [
            _counter_uniform(seeds[0], ctr_pick),
            _y_of(_counter_uniform(seeds[1], ctr_pick), idx),
        ],
        axis=-1,
    )
    if num_random > 0:
        rand = jax.random.uniform(k2, (n, num_random, 2))
        picked = jnp.concatenate([picked, rand], axis=1)
    return picked


def get_uncertain_point_coords_with_randomness(
    key: jax.Array,
    mask_logits: jnp.ndarray,
    num_points: int,
    oversample_ratio: float,
    importance_sample_ratio: float,
) -> jnp.ndarray:
    """Sample ``num_points`` coords per mask: the most-uncertain fraction from
    an oversampled random pool plus a random remainder (detectron2 point_rend
    semantics used at criterion.py:161-167).

    mask_logits: (n, h, w) -> coords (n, num_points, 2) in [0, 1].
    """
    n = mask_logits.shape[0]
    num_sampled = int(num_points * oversample_ratio)
    k1, k2 = jax.random.split(key)
    coords = jax.random.uniform(k1, (n, num_sampled, 2))
    logits = point_sample(mask_logits, coords)
    unc = calculate_uncertainty(logits)

    num_uncertain = int(importance_sample_ratio * num_points)
    num_random = num_points - num_uncertain
    _, idx = jax.lax.top_k(unc, num_uncertain)            # (n, num_uncertain)
    picked = jnp.take_along_axis(coords, idx[..., None], axis=1)
    if num_random > 0:
        rand = jax.random.uniform(k2, (n, num_random, 2))
        picked = jnp.concatenate([picked, rand], axis=1)
    return picked
