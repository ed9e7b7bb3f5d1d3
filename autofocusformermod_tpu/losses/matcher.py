"""Hungarian matching between queries and padded ground-truth instances.

Rebuild of reference mask2former/modeling/matcher.py with static shapes:
targets are padded to a fixed ``max_gt`` per image with a validity mask.
The class+mask(BCE)+dice cost matrix is computed on device over
``num_points`` shared random sample points (matcher.py:96-153); the LSAP
itself runs either on the host via ``jax.pure_callback`` into scipy — where
the reference runs it (matcher.py:154-156) — or fully on device via the
exact Hungarian/JV solver (``lapjv.py``; eps-scaling auction in
``auction.py`` as an alternative), the default on TPU where host callbacks
may be unsupported and a per-step host round-trip costs latency.

Invalid target columns get a large constant cost, which leaves the assignment
over valid columns optimal; losses mask out the invalid matches.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .auction import auction_lsap
from .lapjv import hungarian_lsap

_INVALID_COST = 1e8

# LSAP backend: "scipy" (host callback), "jv" (exact on-device Hungarian,
# lapjv.py), or "auction" (on-device eps-scaling auction, auction.py).
# None = auto: "jv" on TPU — host callbacks are unsupported on some TPU
# PJRT runtimes, the on-device solve avoids a host round-trip per step,
# and JV is both exact and ~100x fewer sequential steps than the auction
# at matcher sizes — scipy elsewhere.
_MATCHER_BACKEND = None


def set_matcher_backend(backend):
    """Force the LSAP backend: 'scipy', 'jv', 'auction', or None for auto."""
    global _MATCHER_BACKEND
    assert backend in (None, "scipy", "jv", "auction"), backend
    _MATCHER_BACKEND = backend


# Optional mesh hint for the host-callback path under GSPMD: a pure_callback
# is pinned to ONE device ({maximal device=0}), and the partitioner cannot
# lower sharded<->maximal transitions directly — it logs "involuntary full
# rematerialization" and replicates anyway.  With the mesh known we make that
# explicit: replicate the cost before the callback and mark its result
# replicated, so the transitions become a plain all-gather + broadcast.
_CALLBACK_MESH = None


def set_callback_replication(mesh):
    """Register the active device mesh (or None) for sharded host callbacks."""
    global _CALLBACK_MESH
    _CALLBACK_MESH = mesh


def _replicated(x: jnp.ndarray) -> jnp.ndarray:
    if _CALLBACK_MESH is None:
        return x
    from jax.sharding import NamedSharding, PartitionSpec

    return jax.lax.with_sharding_constraint(
        x, NamedSharding(_CALLBACK_MESH, PartitionSpec())
    )


def _resolve_backend() -> str:
    if _MATCHER_BACKEND is not None:
        return _MATCHER_BACKEND
    return "jv" if jax.default_backend() == "tpu" else "scipy"


def batch_sigmoid_ce_cost(inputs: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Pairwise mean binary-CE cost (matcher.py:39-63).
    inputs: (q, p) logits; targets: (t, p) in {0,1} -> (q, t).

    Uses pos - neg = softplus(-x) - softplus(x) = -x to fold the reference's
    two softplus maps + two (q,p)x(t,p) einsums into one softplus row-sum +
    ONE einsum: pos@tgt + neg@(1-tgt) = sum_p(neg) - x@tgt.  Same math, half
    the transcendentals, a quarter of the MXU flops."""
    p = inputs.shape[1]
    neg_sum = jnp.sum(jax.nn.softplus(inputs), axis=1)      # (q,)
    loss = neg_sum[:, None] - jnp.einsum("qp,tp->qt", inputs, targets)
    return loss / p


def batch_dice_cost(inputs: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Pairwise dice cost (matcher.py:16-31)."""
    inputs = jax.nn.sigmoid(inputs)
    numerator = 2 * jnp.einsum("qp,tp->qt", inputs, targets)
    denominator = inputs.sum(-1)[:, None] + targets.sum(-1)[None, :]
    return 1 - (numerator + 1) / (denominator + 1)


def _lsap_host(cost: np.ndarray) -> np.ndarray:
    """Batched LSAP on host. cost: (b, q, t) -> matched query per target (b, t)."""
    from scipy.optimize import linear_sum_assignment

    b, q, t = cost.shape
    out = np.zeros((b, t), dtype=np.int32)
    for i in range(b):
        c = np.nan_to_num(cost[i], nan=_INVALID_COST, posinf=_INVALID_COST,
                          neginf=-_INVALID_COST)
        rows, cols = linear_sum_assignment(c)
        out[i, cols] = rows.astype(np.int32)
    return out


def matching_cost(
    pred_logits: jnp.ndarray,
    pred_masks: jnp.ndarray,
    tgt_labels: jnp.ndarray,
    tgt_masks: jnp.ndarray,
    tgt_valid: jnp.ndarray,
    point_coords: jnp.ndarray,
    cost_class: float,
    cost_mask: float,
    cost_dice: float,
    tgt_flat_t: jnp.ndarray = None,
    tgt_pts: jnp.ndarray = None,
) -> jnp.ndarray:
    """The class+mask+dice assignment cost matrix (matcher.py:96-153).

    pred_logits - (b, q, nc+1); pred_masks - (b, q, h, w)
    tgt_labels  - (b, t) int32; tgt_masks - (b, t, H, W); tgt_valid - (b, t)
    point_coords- (b, p, 2) shared random points (same for preds and targets,
                  matcher.py:121)
    tgt_flat_t  - optional pre-transposed (b, H*W, t) view of tgt_masks so
                  repeated callers (one per deep-supervision layer) hoist the
                  relayout; bit-identical to passing tgt_masks alone
    tgt_pts     - optional pre-sampled GT point values (b, t, p) at exactly
                  ``point_coords`` (callers batching the target sampling
                  across layers); bit-identical to sampling here
    Returns (b, q, t) with invalid target columns at _INVALID_COST.
    """
    from .point_sample import point_sample_shared_batch

    b, q = pred_logits.shape[:2]
    t = tgt_labels.shape[1]
    H, W = tgt_masks.shape[-2:]
    if tgt_pts is None:
        if tgt_flat_t is None:
            tgt_flat_t = tgt_masks.reshape(b, t, H * W).transpose(0, 2, 1)
        tgt_pts = point_sample_shared_batch(tgt_flat_t, H, W, point_coords)

    # sample ALL images' pred masks through one flat batched gather — the
    # vmapped per-image form lowered to XLA's ~4.4x-slower batched gather
    h, w = pred_masks.shape[-2:]
    out_pts_all = point_sample_shared_batch(
        pred_masks.reshape(b, q, h * w).transpose(0, 2, 1), h, w, point_coords
    )                                                         # (b, q, p)

    def per_image(logits, out_pts, labels, gt_pts, valid):
        out_prob = jax.nn.softmax(logits, axis=-1)            # (q, nc+1)
        cc = -out_prob[:, labels]                             # (q, t)

        tgt_pts = gt_pts                                      # (t, p)

        cm = batch_sigmoid_ce_cost(out_pts, tgt_pts)
        cd = batch_dice_cost(out_pts, tgt_pts)
        # NaN guard (matcher_mixed.py:113-147 generalizes this; harmless here)
        cm = jnp.nan_to_num(cm, nan=1e6)
        cd = jnp.nan_to_num(cd, nan=1e6)

        cost = cost_mask * cm + cost_class * cc + cost_dice * cd
        return jnp.where(valid[None, :], cost, _INVALID_COST)

    return jax.vmap(per_image)(
        pred_logits, out_pts_all, tgt_labels, tgt_pts, tgt_valid
    )  # (b, q, t)


def max_pool_to(masks: jnp.ndarray, out_hw) -> jnp.ndarray:
    """(b, t, H, W) -> (b, t, h, w) via kernel (H//h, W//w) max pooling
    (reference matcher_downsampled.py:128-130 / criterion_downsampled.py:163).
    Requires H % h == 0 and W % w == 0 (the reference's int division does the
    same implicitly)."""
    H, W = masks.shape[-2:]
    h, w = out_hw
    kh, kw = H // h, W // w
    if kh == 1 and kw == 1:
        return masks
    return jax.lax.reduce_window(
        masks, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 1, kh, kw), window_strides=(1, 1, kh, kw),
        padding="VALID",
    )


def matching_cost_downsample(
    pred_logits: jnp.ndarray,
    pred_masks: jnp.ndarray,
    tgt_labels: jnp.ndarray,
    tgt_masks: jnp.ndarray,
    tgt_valid: jnp.ndarray,
    cost_class: float,
    cost_mask: float,
    cost_dice: float,
) -> jnp.ndarray:
    """HungarianMatcherDownSample cost (matcher_downsampled.py:97-162): no
    point sampling — targets are max-pooled to the prediction resolution and
    the mask/dice costs run DENSE over all h*w prediction pixels."""
    h, w = pred_masks.shape[-2:]
    tgt_small = max_pool_to(tgt_masks, (h, w))

    def per_image(logits, masks, labels, gt_small, valid):
        out_prob = jax.nn.softmax(logits, axis=-1)
        cc = -out_prob[:, labels]
        out_flat = masks.reshape(masks.shape[0], -1)
        tgt_flat = gt_small.reshape(gt_small.shape[0], -1)
        cm = batch_sigmoid_ce_cost(out_flat, tgt_flat)
        cd = batch_dice_cost(out_flat, tgt_flat)
        cost = cost_mask * cm + cost_class * cc + cost_dice * cd
        return jnp.where(valid[None, :], cost, _INVALID_COST)

    return jax.vmap(per_image)(
        pred_logits, pred_masks, tgt_labels, tgt_small, tgt_valid
    )


def solve_lsap(cost: jnp.ndarray) -> jnp.ndarray:
    """Solve the batched assignment. cost: (b, q, t) -> (b, t) int32 matched
    query per target slot.  Batch the deep-supervision layers into ``b``
    when possible: the on-device solvers' sequential while-loops then run
    once in vmap lockstep instead of once per layer."""
    b, _, t = cost.shape
    cost = jax.lax.stop_gradient(cost).astype(jnp.float32)
    backend = _resolve_backend()
    if backend == "jv":
        # single-program Pallas JV when the shapes fit: the XLA while-loop
        # solver pays a per-iteration dispatch overhead that dominates at
        # matcher sizes (measured 94 ms of the 135 ms criterion forward for
        # 40 stacked 100x20 problems); the kernel runs the same lockstep
        # iterations VMEM-resident (ops/pallas/lapjv_kernel.py)
        from ..ops.dispatch import fused_attention_available
        from ..ops.pallas.lapjv_kernel import (
            lsap_pallas,
            lsap_pallas_supported,
        )

        if fused_attention_available() and lsap_pallas_supported(cost):
            return lsap_pallas(cost)
        return hungarian_lsap(cost)
    if backend == "auction":
        return auction_lsap(cost)
    return _replicated(jax.pure_callback(
        _lsap_host,
        jax.ShapeDtypeStruct((b, t), jnp.int32),
        _replicated(cost),
        vmap_method="sequential",
    ))


def hungarian_match(
    pred_logits: jnp.ndarray,
    pred_masks: jnp.ndarray,
    tgt_labels: jnp.ndarray,
    tgt_masks: jnp.ndarray,
    tgt_valid: jnp.ndarray,
    point_coords: jnp.ndarray,
    cost_class: float,
    cost_mask: float,
    cost_dice: float,
) -> jnp.ndarray:
    """Match queries to padded targets: (b, t) int32 query per target."""
    return solve_lsap(
        matching_cost(
            pred_logits, pred_masks, tgt_labels, tgt_masks, tgt_valid,
            point_coords, cost_class, cost_mask, cost_dice,
        )
    )
