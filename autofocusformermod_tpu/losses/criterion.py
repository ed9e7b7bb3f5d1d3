"""SetCriterion — Hungarian-matched class + point-sampled mask losses.

Rebuild of reference mask2former/modeling/criterion.py with static padded
targets.  Per (main + aux) output: match queries to targets, then

  - loss_ce   : CE over classes with ``eos_coef`` weight on no-object
  - loss_mask : sigmoid-CE on PointRend-style uncertainty-sampled points
  - loss_dice : dice on the same points

normalized by the *global* number of valid masks.  Under GSPMD data
parallelism the global sum over the sharded batch is exactly the reference's
``all_reduce(num_masks)/world`` normalization (criterion.py:232-238): DDP
averages rank losses, so effective loss = global_sum / global_num_masks,
which is what we compute directly (degenerate num_masks < world case differs
by the reference's per-rank clamp; we clamp globally at 1).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from .matcher import (
    matching_cost,
    matching_cost_downsample,
    max_pool_to,
    solve_lsap,
)
from .point_sample import (
    get_uncertain_point_coords_nn_ranked,
    get_uncertain_point_coords_with_randomness,
    point_sample,
    point_sample_auto,
)

# Rank oversampled candidates with a 1-tap nearest-cell read instead of the
# 4-tap bilinear (selection heuristic only — supervision stays continuous;
# see point_sample.get_uncertain_point_coords_nn_ranked).  Module-level
# switch so tests can pin the reference's exact sampler.
NN_RANK_UNCERTAINTY = True


def _uncertain_coords(key, src_flat, num_points, oversample_ratio,
                      importance_sample_ratio):
    fn = (
        get_uncertain_point_coords_nn_ranked
        if NN_RANK_UNCERTAINTY
        else get_uncertain_point_coords_with_randomness
    )
    return fn(key, src_flat, num_points, oversample_ratio,
              importance_sample_ratio)


def select_matched(pred_masks: jnp.ndarray, matched: jnp.ndarray) -> jnp.ndarray:
    """Pick the matched query mask per target: (b, q, h, w), (b, t) -> (b, t, h, w).

    A one-hot matmul on the MXU instead of ``take_along_axis``: forward cost
    is trivial (2*b*t*q*h*w flops) and — the point — the VJP is the
    *transposed* matmul, where the gather's VJP is a serialized scatter-add
    into (b, q, h, w) per deep-supervision layer.  HIGHEST precision keeps
    the {0,1} x value products exact, so this is bit-identical to the gather.
    """
    q = pred_masks.shape[1]
    oh = jax.nn.one_hot(matched, q, dtype=pred_masks.dtype)   # (b, t, q)
    return jnp.einsum(
        "btq,bqhw->bthw", oh, pred_masks,
        precision=jax.lax.Precision.HIGHEST,
    )


def dice_loss(inputs: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """inputs/targets: (n, p) -> (n,) per-mask dice (criterion.py:17-35)."""
    inputs = jax.nn.sigmoid(inputs)
    numerator = 2 * jnp.sum(inputs * targets, axis=-1)
    denominator = jnp.sum(inputs, axis=-1) + jnp.sum(targets, axis=-1)
    return 1 - (numerator + 1) / (denominator + 1)


def sigmoid_ce_loss(inputs: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """(n, p) -> (n,) mean BCE per mask (criterion.py:43-59)."""
    loss = jax.nn.softplus(inputs) - inputs * targets  # BCE-with-logits
    return jnp.mean(loss, axis=-1)


def _loss_labels(pred_logits, tgt_labels, tgt_valid, matched, num_classes, eos_coef):
    """CE with no-object class weighting (criterion.py:116-136)."""
    b, q, _ = pred_logits.shape
    batch_idx = jnp.broadcast_to(jnp.arange(b)[:, None], matched.shape)
    target_classes = jnp.full((b, q), num_classes, dtype=jnp.int32)
    scatter_cls = jnp.where(tgt_valid, tgt_labels, num_classes)
    target_classes = target_classes.at[batch_idx, matched].set(scatter_cls)

    logp = jax.nn.log_softmax(pred_logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, target_classes[..., None], axis=-1)[..., 0]
    weight = jnp.where(target_classes == num_classes, eos_coef, 1.0)
    return jnp.sum(weight * nll) / jnp.sum(weight)


def _loss_masks_stacked(key, src_flat, tgt_flat, num_points,
                        oversample_ratio, importance_sample_ratio):
    """Point-sampled sigmoid-CE + dice per mask (criterion.py:138-193).

    src_flat: (N, h, w) matched prediction logits; tgt_flat: (N, H, W).
    Returns ((N,) mask loss, (N,) dice loss) — callers sum/normalize.
    N stacks ALL deep-supervision layers: one big uncertainty sampling +
    two point_sample calls instead of 10 small ones (the small-batch
    launches dominated the criterion at ~290 ms of 390 per step)."""
    coords = jax.lax.stop_gradient(
        _uncertain_coords(
            key, jax.lax.stop_gradient(src_flat), num_points,
            oversample_ratio, importance_sample_ratio,
        )
    )
    point_labels = jax.lax.stop_gradient(point_sample_auto(tgt_flat, coords))
    point_logits = point_sample_auto(src_flat, coords)
    return sigmoid_ce_loss(point_logits, point_labels), dice_loss(
        point_logits, point_labels
    )


def _loss_masks(key, pred_masks, tgt_masks, tgt_valid, matched, num_masks,
                num_points, oversample_ratio, importance_sample_ratio):
    """Single-layer wrapper around _loss_masks_stacked."""
    b, q, h, w = pred_masks.shape
    t = matched.shape[1]
    src = select_matched(pred_masks, matched)  # (b, t, h, w)
    src_flat = src.reshape(b * t, h, w)
    H, W = tgt_masks.shape[-2:]
    tgt_flat = tgt_masks.reshape(b * t, H, W).astype(src_flat.dtype)
    lm, ld = _loss_masks_stacked(
        key, src_flat, tgt_flat, num_points, oversample_ratio,
        importance_sample_ratio,
    )
    vf = tgt_valid.reshape(b * t).astype(lm.dtype)
    return (
        jnp.sum(lm * vf) / num_masks,
        jnp.sum(ld * vf) / num_masks,
    )


def set_criterion(
    key: jax.Array,
    outputs: Dict,
    targets: Dict,
    num_classes: int,
    *,
    eos_coef: float = 0.1,
    class_weight: float = 2.0,
    mask_weight: float = 5.0,
    dice_weight: float = 5.0,
    num_points: int = 12544,
    oversample_ratio: float = 3.0,
    importance_sample_ratio: float = 0.75,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Compute the full deep-supervision loss (criterion.py:215-260).

    outputs - {'pred_logits', 'pred_masks', 'aux_outputs': tuple of dicts}
    targets - {'labels': (b,t) int32, 'masks': (b,t,H,W), 'valid': (b,t) bool}
    Returns (total weighted loss, dict of unweighted per-term losses).
    """
    tgt_labels = targets["labels"]
    tgt_masks = targets["masks"]
    tgt_valid = targets["valid"]
    b, t = tgt_labels.shape

    num_masks = jnp.maximum(jnp.sum(tgt_valid.astype(jnp.float32)), 1.0)

    all_outputs = [outputs] + list(outputs.get("aux_outputs", ()))
    losses: Dict[str, jnp.ndarray] = {}
    total = 0.0

    # Match all deep-supervision layers in ONE batched LSAP solve: the
    # on-device solvers are sequential while-loops, so stacking the layers
    # into the batch runs them in vmap lockstep (~L x fewer sequential
    # steps); the scipy path collapses to one host callback per step.
    layer_keys = []
    costs = []
    H0, W0 = tgt_masks.shape[-2:]
    # hoist the (H*W, t) target relayout out of the per-layer loop — the GT
    # masks are identical across the deep-supervision layers — and sample the
    # GT at ALL layers' matching points in one gather (layers folded into the
    # point axis; bit-identical to per-layer sampling)
    from .point_sample import point_sample_shared_batch

    tgt_flat_t = tgt_masks.reshape(b, t, H0 * W0).transpose(0, 2, 1)
    nl = len(all_outputs)
    layer_coords = []
    for _ in all_outputs:
        key, k_match, k_pts = jax.random.split(key, 3)
        layer_keys.append(k_pts)
        layer_coords.append(jax.random.uniform(k_match, (b, num_points, 2)))
    coords_cat = jnp.concatenate(layer_coords, axis=1)    # (b, nl*p, 2)
    tgt_pts_cat = point_sample_shared_batch(
        tgt_flat_t, H0, W0, coords_cat
    )                                                     # (b, t, nl*p)
    for li, out in enumerate(all_outputs):
        costs.append(
            matching_cost(
                out["pred_logits"], out["pred_masks"],
                tgt_labels, tgt_masks, tgt_valid, layer_coords[li],
                cost_class=class_weight, cost_mask=mask_weight,
                cost_dice=dice_weight,
                tgt_pts=tgt_pts_cat[
                    :, :, li * num_points : (li + 1) * num_points
                ],
            )
        )
    matched_all = [None] * len(all_outputs)
    by_shape: Dict[Tuple, list] = {}
    for i, c in enumerate(costs):
        by_shape.setdefault(c.shape, []).append(i)
    for idxs in by_shape.values():
        sol = solve_lsap(jnp.concatenate([costs[i] for i in idxs], axis=0))
        for k, i in enumerate(idxs):
            matched_all[i] = sol[k * b : (k + 1) * b]

    # Mask losses: stack every layer with the same mask resolution into ONE
    # uncertainty-sampling + point_sample pass (the per-layer small-batch
    # launches dominated the criterion cost).  Keys: one per group — each
    # stacked mask still gets its own sampled points, and the reference
    # samples layers independently anyway.
    H, W = tgt_masks.shape[-2:]
    mask_losses = [None] * len(all_outputs)
    groups: Dict[Tuple, list] = {}
    for i, out in enumerate(all_outputs):
        groups.setdefault(out["pred_masks"].shape[-2:], []).append(i)
    for gi, (shape_hw, idxs) in enumerate(sorted(groups.items())):
        L = len(idxs)
        srcs = []
        for i in idxs:
            pm = all_outputs[i]["pred_masks"]
            srcs.append(
                select_matched(pm, matched_all[i]).reshape(b * t, *shape_hw)
            )
        src_flat = jnp.concatenate(srcs, axis=0)          # (L*b*t, h, w)
        coords = jax.lax.stop_gradient(
            _uncertain_coords(
                layer_keys[idxs[0]], jax.lax.stop_gradient(src_flat),
                num_points, oversample_ratio, importance_sample_ratio,
            )
        )
        # Targets repeat across the L stacked layers (the GT never changes),
        # so fold the layer axis into the POINT axis and sample the
        # unrepeated (b*t, H, W) stack once — same values as sampling an
        # L-fold broadcast, from a source L x smaller.
        ct = (coords.reshape(L, b * t, num_points, 2)
              .transpose(1, 0, 2, 3).reshape(b * t, L * num_points, 2))
        pl_t = point_sample_auto(
            tgt_masks.reshape(b * t, H, W).astype(src_flat.dtype), ct
        )
        point_labels = jax.lax.stop_gradient(
            pl_t.reshape(b * t, L, num_points)
            .transpose(1, 0, 2).reshape(L * b * t, num_points)
        )
        point_logits = point_sample_auto(src_flat, coords)
        lm = sigmoid_ce_loss(point_logits, point_labels)
        ld = dice_loss(point_logits, point_labels)
        vf = tgt_valid.reshape(1, b * t).astype(lm.dtype)
        lm_per = jnp.sum(lm.reshape(len(idxs), b * t) * vf, axis=1) / num_masks
        ld_per = jnp.sum(ld.reshape(len(idxs), b * t) * vf, axis=1) / num_masks
        for k, i in enumerate(idxs):
            mask_losses[i] = (lm_per[k], ld_per[k])

    for i, out in enumerate(all_outputs):
        matched = matched_all[i]
        l_ce = _loss_labels(
            out["pred_logits"], tgt_labels, tgt_valid, matched, num_classes, eos_coef
        )
        l_mask, l_dice = mask_losses[i]
        suffix = "" if i == 0 else f"_{i - 1}"
        losses[f"loss_ce{suffix}"] = l_ce
        losses[f"loss_mask{suffix}"] = l_mask
        losses[f"loss_dice{suffix}"] = l_dice
        total = total + class_weight * l_ce + mask_weight * l_mask + dice_weight * l_dice
    return total, losses


def _loss_masks_downsample(pred_masks, tgt_masks, tgt_valid, matched, num_masks):
    """Dense sigmoid-CE + dice on max-pooled targets — the
    SetCriterionDownSample mask loss (criterion_downsampled.py:134-181)."""
    b, q, h, w = pred_masks.shape
    t = matched.shape[1]
    src = select_matched(pred_masks, matched)
    tgt_small = max_pool_to(tgt_masks.astype(src.dtype), (h, w))
    src_flat = src.reshape(b * t, h * w)
    tgt_flat = tgt_small.reshape(b * t, h * w)
    vf = tgt_valid.reshape(b * t).astype(src_flat.dtype)
    lm = sigmoid_ce_loss(src_flat, tgt_flat)
    ld = dice_loss(src_flat, tgt_flat)
    return jnp.sum(lm * vf) / num_masks, jnp.sum(ld * vf) / num_masks


def set_criterion_downsample(
    key: jax.Array,
    outputs: Dict,
    targets: Dict,
    num_classes: int,
    *,
    eos_coef: float = 0.1,
    class_weight: float = 2.0,
    mask_weight: float = 5.0,
    dice_weight: float = 5.0,
    **_unused,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """SetCriterionDownSample + HungarianMatcherDownSample
    (criterion_downsampled.py:84-246, matcher_downsampled.py:71-185): no
    PointRend sampling anywhere — GT masks are max-pooled to the prediction
    resolution and both the assignment costs and mask losses run dense over
    all prediction pixels.  ``key`` is accepted for API symmetry with
    set_criterion and unused (the variant is fully deterministic)."""
    del key
    tgt_labels = targets["labels"]
    tgt_masks = targets["masks"]
    tgt_valid = targets["valid"]
    b, t = tgt_labels.shape

    num_masks = jnp.maximum(jnp.sum(tgt_valid.astype(jnp.float32)), 1.0)
    all_outputs = [outputs] + list(outputs.get("aux_outputs", ()))

    losses: Dict[str, jnp.ndarray] = {}
    total = 0.0
    costs = [
        matching_cost_downsample(
            out["pred_logits"], out["pred_masks"], tgt_labels, tgt_masks,
            tgt_valid, cost_class=class_weight, cost_mask=mask_weight,
            cost_dice=dice_weight,
        )
        for out in all_outputs
    ]
    matched_all = [None] * len(all_outputs)
    by_shape: Dict[Tuple, list] = {}
    for i, c in enumerate(costs):
        by_shape.setdefault(c.shape, []).append(i)
    for idxs in by_shape.values():
        sol = solve_lsap(jnp.concatenate([costs[i] for i in idxs], axis=0))
        for k, i in enumerate(idxs):
            matched_all[i] = sol[k * b : (k + 1) * b]

    for i, out in enumerate(all_outputs):
        matched = matched_all[i]
        l_ce = _loss_labels(
            out["pred_logits"], tgt_labels, tgt_valid, matched, num_classes, eos_coef
        )
        l_mask, l_dice = _loss_masks_downsample(
            out["pred_masks"], tgt_masks, tgt_valid, matched, num_masks
        )
        suffix = "" if i == 0 else f"_{i - 1}"
        losses[f"loss_ce{suffix}"] = l_ce
        losses[f"loss_mask{suffix}"] = l_mask
        losses[f"loss_dice{suffix}"] = l_dice
        total = total + class_weight * l_ce + mask_weight * l_mask + dice_weight * l_dice
    return total, losses
