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

from typing import Any

import jax
import jax.numpy as jnp


# param-tree subpaths kept fp32 under the policy: deformable sampling
# LOCATIONS are geometry — rounding the offsets net's bias to bf16 shifts
# every sampled point ~0.4% and flips nearest-grid-cell snaps
# (pixel_decoder.py MSDeformAttnPc), a discrete, disproportionate error.
KEEP_F32 = ("sampling_offsets",)


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
    return {k: cast_floating(v, keep_f32=KEEP_F32) for k, v in variables.items()}
