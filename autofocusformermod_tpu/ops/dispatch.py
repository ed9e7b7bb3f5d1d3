"""Kernel dispatch: fused Pallas implementations when available/enabled,
pure-XLA gather-einsum composition otherwise.

The XLA path is the semantic reference (parity-tested in tests/test_ops.py and
tests/test_pallas.py); the Pallas path (ops/pallas/local_attn.py) implements
the reference's clusten_qk -> +bias -> +mask -> blank-augmented softmax ->
clusten_av chain (aff.py:102-160) as block-sparse flash attention over
SFC-ordered tokens.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .clusten import cluster_av, cluster_qk

_PALLAS_ENV = os.environ.get("AFF_TPU_USE_PALLAS", "1") not in ("0", "false")


def fused_attention_available() -> bool:
    """Whether the fused Pallas local-attention kernel can run here."""
    if not _PALLAS_ENV:
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # noqa: BLE001
        return False


def local_cluster_attention_reference(
    q: jnp.ndarray,
    key: jnp.ndarray,
    v: jnp.ndarray,
    member_idx: jnp.ndarray,
    pos_bias: jnp.ndarray,
    cluster_mask: Optional[jnp.ndarray],
    blank_attn: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Unfused gather composition (the semantic definition).

    q/key/v: (b, h, n, c_); member_idx: (b, n, m); pos_bias: (b, n, m, h);
    cluster_mask: (b, n, m) or None; blank_attn: (b, h, n, 1) pre-softmax logit.
    Returns (feat (b, h, n, c_), blank_prob (b, h, n, 1)).
    """
    b, h, n, c_ = q.shape
    attn = cluster_qk(q, key, member_idx)  # (b, h, n, m)
    attn = attn + pos_bias.transpose(0, 3, 1, 2)
    if cluster_mask is not None:
        attn = attn + (1 - cluster_mask.reshape(b, 1, n, -1)) * (-100.0)
    attn = jnp.concatenate([attn, blank_attn], axis=-1)
    attn = jax.nn.softmax(attn, axis=-1)
    blank_prob = attn[..., -1:]
    attn = attn[..., :-1]
    feat = cluster_av(attn, v, member_idx)
    return feat, blank_prob
