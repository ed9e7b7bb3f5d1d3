"""Oracle / teacher supervision for MaskFiner token upsampling.

Rebuild of the reference oracle machinery:
  - GT-edge-derived oracle upsampling masks: per-token patch edge counts on
    the semantic ground truth, normalized (reference
    maskfiner_oracle_teacher_model.py:597-674)
  - teacher mixing: with probability ORACLE_TEACHER_RATIO the oracle mask
    replaces the predicted disagreement mask between stages (:252-258)
  - upsampling-mask MSE loss against the oracle per stage
    (criterion_mixed_oracle.py:300-344)
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp


def gt_edge_map(sem_seg: jnp.ndarray, ignore_label: int = 255) -> jnp.ndarray:
    """Boundary pixels of a semantic map (b, H, W) -> (b, H, W) float 0/1,
    4-neighborhood, void-aware."""
    v = sem_seg != ignore_label
    e = jnp.zeros(sem_seg.shape, bool)
    e = e.at[:, :-1].set((sem_seg[:, :-1] != sem_seg[:, 1:]) & v[:, :-1] & v[:, 1:])
    e = e | jnp.pad(
        (sem_seg[:, :, :-1] != sem_seg[:, :, 1:]) & v[:, :, :-1] & v[:, :, 1:],
        ((0, 0), (0, 0), (0, 1)),
    )
    return e.astype(jnp.float32)


def oracle_upsampling_mask(
    edges: jnp.ndarray,
    pos_xy: jnp.ndarray,
    scale: jnp.ndarray,
    patch_sizes: Sequence[int],
    min_patch_size: int,
) -> jnp.ndarray:
    """Per-token oracle scores: the fraction of edge pixels inside each
    token's image patch, normalized to [0, 1] per image
    (maskfiner_oracle_teacher_model.py:597-674).

    edges - (b, H, W); pos_xy - (b, n, 2) min-patch coords; scale - (b, n)
    Returns (b, n) float scores.
    """
    b, H, W = edges.shape
    # integral image for O(1) box sums
    ii = jnp.cumsum(jnp.cumsum(edges, axis=1), axis=2)
    ii = jnp.pad(ii, ((0, 0), (1, 0), (1, 0)))

    x0 = (pos_xy[..., 0] * min_patch_size).astype(jnp.int32)
    y0 = (pos_xy[..., 1] * min_patch_size).astype(jnp.int32)
    ps_table = jnp.asarray(patch_sizes, jnp.int32)
    ps = ps_table[jnp.clip(scale.astype(jnp.int32), 0, len(patch_sizes) - 1)]
    x1 = jnp.clip(x0 + ps, 0, W)
    y1 = jnp.clip(y0 + ps, 0, H)
    x0 = jnp.clip(x0, 0, W)
    y0 = jnp.clip(y0, 0, H)

    def box_sum(ii_b, x0b, y0b, x1b, y1b):
        def at(y, x):
            return ii_b[y, x]

        return (
            at(y1b, x1b) - at(y0b, x1b) - at(y1b, x0b) + at(y0b, x0b)
        )

    bsum = jax.vmap(
        lambda ii_b, x0b, y0b, x1b, y1b: jax.vmap(box_sum, (None, 0, 0, 0, 0))(
            ii_b, x0b, y0b, x1b, y1b
        )
    )(ii, x0, y0, x1, y1)
    area = jnp.maximum((x1 - x0) * (y1 - y0), 1).astype(jnp.float32)
    frac = bsum / area
    # normalize per image so the oracle is a relative ranking (:660-668)
    mx = jnp.max(frac, axis=1, keepdims=True)
    return frac / jnp.maximum(mx, 1e-6)


def mix_teacher_mask(
    key: jax.Array,
    predicted: jnp.ndarray,
    oracle: jnp.ndarray,
    teacher_ratio: float,
) -> jnp.ndarray:
    """With probability ``teacher_ratio`` (per image) substitute the oracle
    mask for the predicted upsampling mask (reference :252-258)."""
    if teacher_ratio <= 0:
        return predicted
    b = predicted.shape[0]
    use_oracle = jax.random.bernoulli(key, teacher_ratio, (b, 1))
    return jnp.where(use_oracle, oracle, predicted)


def upsampling_mse_loss(
    predicted_masks: Sequence[jnp.ndarray],
    oracle_masks: Sequence[jnp.ndarray],
) -> jnp.ndarray:
    """Per-stage MSE between predicted upsampling scores and the oracle
    (criterion_mixed_oracle.py:300-344), averaged over stages."""
    losses = [
        jnp.mean((p - jax.lax.stop_gradient(o)) ** 2)
        for p, o in zip(predicted_masks, oracle_masks)
    ]
    return jnp.mean(jnp.stack(losses)) if losses else jnp.zeros(())
