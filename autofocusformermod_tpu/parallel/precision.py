"""bf16 mixed precision: fp32 master params, bf16 compute.

The reference trains with torch.cuda.amp autocast under SOLVER.AMP.ENABLED
(train_net.py); the TPU-native equivalent is a dtype policy, not an autocast
context: float32 parameter leaves (and the input image) are cast to bfloat16
at apply time, and flax's dtype promotion then keeps the whole network in
bf16.  Master params, optimizer state, and every loss/matcher computation
stay float32 — gradients flow through the cast and arrive fp32.

fp32 islands (by construction, no casts needed):
  * geometry — positions, SFC clustering, KNN distances, Shepard d2, grid
    snapping are derived from fp32/int constants and never touch params;
  * BatchNorm batch statistics — flax computes them in fp32 internally;
  * criterion/matcher/inference — model outputs are cast back to fp32 by
    ``f32_outputs`` before any loss or argmax.

The MXU already runs fp32 matmuls at bf16-input precision (DEFAULT
precision), so this policy buys HBM bandwidth on the elementwise/normalization
path, not matmul flops.
"""

from __future__ import annotations

import os
from typing import Any, Tuple

import jax
import jax.numpy as jnp


# param-tree subpaths kept fp32 under the policy: deformable sampling
# LOCATIONS are geometry — rounding the offsets net's bias to bf16 shifts
# every sampled point ~0.4% and flips nearest-grid-cell snaps
# (pixel_decoder.py MSDeformAttnPc), a discrete, disproportionate error.
KEEP_F32 = ("sampling_offsets",)

# ------------------------------------------------------------- fp32 islands
# The reference's AMP recipe is NOT uniform fp16: its entire pixel decoder
# runs fp32 (@autocast(enabled=False), reference msdeformattn_pc.py:464).
# Round 4 measured the price of uniform bf16 at trained weights: 3.14% of
# mask-threshold decisions flip vs fp32 (DRIFT_r04.json), blowing the 1%
# budget.  Islands restore reference-grade precision per component; which
# islands are active is decided by the on-chip ablation in
# tools/ablate_drift_islands.py and pinned by DRIFT_r05.json.
#
# name -> param-tree path substrings that stay fp32 under amp_variables.
# The matching ACTIVATION casts live at the module boundaries (maskformer.py
# MaskFormerHead / transformer_decoder.py _prediction_heads).
ISLAND_PARAM_PATHS = {
    "backbone": ("backbone/",),
    "pixel_decoder": ("pixel_decoder/",),
    "decoder": ("predictor/",),
    # just the prediction heads: decoder_norm -> class/mask embeds -> the
    # mask-logit dot and its Shepard attention-mask upsample
    "mask_head": (
        "predictor/decoder_norm",
        "predictor/class_embed",
        "predictor/mask_embed",
    ),
}

# Production default: NO islands (uniform bf16).  The round-5 ablation
# (DRIFT_ISLANDS_r05.json) measured every downstream island — including the
# reference's own fp32 pixel decoder — leaving the trained-weights
# mask-threshold flip rate unchanged (3.1 -> 3.7-3.8%), because the flips
# are not logit arithmetic: bf16 noise reorders near-tied keep scores in
# the backbone's ClusterMerging top-k and a different, equally-scored token
# subset survives (kept-token Jaccard at res5: 0.47, DRIFT_SOURCE_r05.json).
# With the selection pinned (the "backbone" island), arithmetic flips are
# 1.4e-3 — far inside the tie-explainable budget — so the islands buy no
# decision fidelity at eval.  The reference's fp32 pixel decoder guards
# fp16 OVERFLOW during training (fp16 has a 5-bit exponent; bf16 shares
# fp32's range), a failure mode the bf16 policy does not have; our training
# numerics keep criterion/matcher/optimizer fp32 by construction.
# The budget is enforced mechanism-by-mechanism in
# tests/test_decision_drift.py::test_flagship_drift_artifact_within_budget.
DEFAULT_F32_ISLANDS = ""


def active_f32_islands() -> Tuple[str, ...]:
    """fp32-island set under AMP: env AFF_F32_ISLANDS (comma list, '' = none)
    overrides the production default."""
    env = os.environ.get("AFF_F32_ISLANDS")
    if env is None:
        env = DEFAULT_F32_ISLANDS
    names = tuple(s.strip() for s in env.split(",") if s.strip())
    for n in names:
        if n not in ISLAND_PARAM_PATHS:
            raise ValueError(
                f"unknown fp32 island {n!r}; known: {sorted(ISLAND_PARAM_PATHS)}"
            )
    return names


def island_keep_paths(islands: Tuple[str, ...] = None) -> Tuple[str, ...]:
    if islands is None:
        islands = active_f32_islands()
    paths: Tuple[str, ...] = ()
    for n in islands:
        paths += ISLAND_PARAM_PATHS[n]
    return paths


def cast_floating(tree: Any, dtype=jnp.bfloat16, keep_f32=()) -> Any:
    """Cast float32 leaves of ``tree`` to ``dtype`` (other dtypes pass).
    Leaves whose tree path contains any ``keep_f32`` substring stay fp32."""

    def _cast(path, x):
        if not (hasattr(x, "dtype") and x.dtype == jnp.float32):
            return x
        if keep_f32:
            keys = "/".join(str(getattr(p, "key", p)) for p in path)
            if any(k in keys for k in keep_f32):
                return x
        return x.astype(dtype)

    return jax.tree_util.tree_map_with_path(_cast, tree)


def f32_outputs(tree: Any) -> Any:
    """Cast low-precision float leaves back to float32 (loss/inference side)."""

    def _cast(x):
        if hasattr(x, "dtype") and x.dtype in (jnp.bfloat16, jnp.float16):
            return x.astype(jnp.float32)
        return x

    return jax.tree_util.tree_map(_cast, tree)


def amp_variables(variables: dict, enabled: bool = True) -> dict:
    """bf16 view of a flax variables dict for one apply call.

    ``params`` and ``batch_stats`` are cast leaf-wise; master copies held by
    the caller stay fp32.  batch_stats are cast so that eval-mode BatchNorm
    does not promote the activation path back to fp32 (flax promotes the
    result dtype across inputs/scale/stats); train-mode stat COMPUTATION is
    fp32 inside flax regardless.
    """
    if not enabled:
        return variables
    keep = KEEP_F32 + island_keep_paths()
    return {k: cast_floating(v, keep_f32=keep) for k, v in variables.items()}
