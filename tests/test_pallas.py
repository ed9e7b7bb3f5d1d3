"""Parity tests for the fused Pallas local-attention kernel vs the XLA
mask-formulation reference AND the gather composition.  Skipped off-TPU;
run directly on hardware via `python tests/test_pallas.py`."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _setup(b=2, h=2, n=512, c_=16, nnc=6, m=8, seed=0):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    k_clusters = n // m
    q = jnp.asarray(rng.standard_normal((b, h, n, c_)) * 0.5, jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, n, c_)) * 0.5, jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, n, c_)), jnp.float32)
    # SFC-like positions: tokens of cluster c near each other
    base = rng.uniform(0, 64, (b, k_clusters, 1, 2))
    jitter = rng.uniform(0, 4, (b, k_clusters, m, 2))
    pos = jnp.asarray(np.floor(base + jitter).reshape(b, n, 2), jnp.float32)
    # neighbor clusters: self + random nearby
    nc = rng.integers(0, k_clusters, (b, n, nnc))
    nc[..., 0] = np.arange(n).reshape(1, n) // m
    nc = jnp.asarray(nc, jnp.int32)
    w5 = jnp.asarray(rng.standard_normal((h, 5)) * 0.1, jnp.float32)
    b5 = jnp.asarray(rng.standard_normal((h,)) * 0.1, jnp.float32)
    blank_k = jnp.asarray(rng.standard_normal((h, c_)) * 0.5, jnp.float32)
    return q, k, v, pos, nc, w5, b5, blank_k, m


def test_mask_formulation_matches_gather_composition():
    """The mask formulation (kernel semantics) must equal the reference
    gather composition on identical neighborhoods. Runs on any backend."""
    import jax.numpy as jnp

    from autofocusformermod_tpu.models.layers import rel_pos_features
    from autofocusformermod_tpu.ops.dispatch import local_cluster_attention_reference
    from autofocusformermod_tpu.ops.pallas.local_attn import sfc_attention_reference

    q, k, v, pos, nc, w5, b5, blank_k, m = _setup()
    b, h, n, c_ = q.shape
    nnc = nc.shape[-1]

    # build the member/bias tensors for the gather path
    member = (nc[..., None] * m + jnp.arange(m)).reshape(b, n, nnc * m)
    pos_nb = jnp.take_along_axis(pos, member.reshape(b, -1, 1), axis=1).reshape(
        b, n, nnc * m, 2
    )
    rel5 = rel_pos_features(pos_nb - pos[:, :, None, :])
    prec = __import__("jax").lax.Precision.HIGHEST
    pos_bias = jnp.einsum("bnmf,hf->bnmh", rel5, w5, precision=prec) + b5[None, None, None, :]
    blank_attn = jnp.einsum("bhnc,hc->bhn", q, blank_k, precision=prec)[..., None]

    ref_feat, ref_blank = local_cluster_attention_reference(
        q, k, v, member, pos_bias, None, blank_attn
    )
    msk_feat, msk_blank = sfc_attention_reference(
        q, k, v, pos, nc, w5, b5, blank_k, m
    )
    # duplicate neighbor clusters in nc mean the gather path counts a key
    # twice while the mask path counts it once: make nc duplicate-free per row
    # in _setup? instead compare only rows without duplicates
    dup = np.asarray(
        jnp.any(
            jnp.sort(nc, axis=-1)[..., 1:] == jnp.sort(nc, axis=-1)[..., :-1],
            axis=-1,
        )
    )
    sel = ~dup
    np.testing.assert_allclose(
        np.asarray(msk_feat).transpose(0, 2, 1, 3)[sel],
        np.asarray(ref_feat).transpose(0, 2, 1, 3)[sel],
        rtol=2e-4, atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(msk_blank).transpose(0, 2, 1, 3)[sel],
        np.asarray(ref_blank).transpose(0, 2, 1, 3)[sel],
        rtol=2e-4, atol=2e-4,
    )


def _tpu_available():
    import jax

    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


@pytest.mark.skipif(not _tpu_available(), reason="needs TPU")
def test_pallas_kernel_matches_reference_on_tpu():
    import jax.numpy as jnp

    from autofocusformermod_tpu.ops.pallas.local_attn import (
        sfc_attention_reference,
        sfc_cluster_attention,
    )

    q, k, v, pos, nc, w5, b5, blank_k, m = _setup(n=1024)
    out, blank = sfc_cluster_attention(q, k, v, pos, nc, w5, b5, blank_k, m)
    ref, ref_blank = sfc_attention_reference(q, k, v, pos, nc, w5, b5, blank_k, m)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(blank), np.asarray(ref_blank), rtol=2e-3, atol=2e-3
    )


if __name__ == "__main__":
    test_mask_formulation_matches_gather_composition()
    print("mask formulation == gather composition: OK", flush=True)
    if _tpu_available():
        test_pallas_kernel_matches_reference_on_tpu()
        print("pallas kernel == reference on TPU: OK")


@pytest.mark.skipif(not _tpu_available(), reason="needs TPU")
def test_fused_backward_matches_gather_composition():
    """The custom VJP (gather composition, O(n*nbhd) memory) must match the
    forward kernel's semantics — gradients of a quadratic loss agree."""
    import jax
    import jax.numpy as jnp

    from autofocusformermod_tpu.ops.pallas.local_attn import (
        gather_composition,
        sfc_cluster_attention,
    )

    rng = np.random.default_rng(0)
    b, h, n, c_, nnc, m = 2, 2, 512, 16, 6, 8
    kc = n // m
    q = jnp.asarray(rng.standard_normal((b, h, n, c_)) * 0.5, jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, n, c_)) * 0.5, jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, n, c_)), jnp.float32)
    base = rng.uniform(0, 64, (b, kc, 1, 2))
    jit = rng.uniform(0, 4, (b, kc, m, 2))
    pos = jnp.asarray(np.floor(base + jit).reshape(b, n, 2), jnp.float32)
    nc = rng.integers(0, kc, (b, n, nnc))
    nc[..., 0] = np.arange(n).reshape(1, n) // m
    # duplicate-free rows (knn returns distinct clusters)
    for bi in range(b):
        for i in range(n):
            row = nc[bi, i]
            seen = set()
            for t in range(nnc):
                while row[t] in seen:
                    row[t] = (row[t] + 1) % kc
                seen.add(row[t])
    nc = jnp.asarray(nc, jnp.int32)
    w5 = jnp.asarray(rng.standard_normal((h, 5)) * 0.1, jnp.float32)
    b5 = jnp.asarray(rng.standard_normal((h,)) * 0.1, jnp.float32)
    bk = jnp.asarray(rng.standard_normal((h, c_)) * 0.5, jnp.float32)

    def loss(fn):
        def f(q, k, v, w5, b5, bk):
            o, bp = fn(q, k, v, pos, nc, w5, b5, bk, m)
            return jnp.sum(o**2) + jnp.sum(bp**2)

        return jax.grad(f, argnums=(0, 1, 2, 3, 4, 5))(q, k, v, w5, b5, bk)

    g1 = loss(sfc_cluster_attention)
    g2 = loss(gather_composition)
    for a, b_ in zip(g1, g2):
        # fp32 accumulation-order differences only; dw5/db5 reduce over every
        # (row, neighbor) pair so their magnitudes reach ~1e4
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-4, atol=5e-3
        )


def test_visit_list_path_matches_bounds_path_interpret():
    """The static visit-list sweep (concrete stage-1 clustering) computes the
    same attention as the contiguous-bounds sweep — fwd and grads, interpret
    mode.  Bounds path is forced by passing nc as a jit argument (tracer);
    list path by calling with the concrete nc."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from autofocusformermod_tpu.ops.pallas import local_attn as la

    q, k, v, pos, nc, w5, b5, blank_k, m = _setup(n=1024)
    # stage-1-like: the clustering is identical across the batch (constant
    # pixel grid) — that is the precondition for the static lists
    nc = jnp.broadcast_to(nc[:1], nc.shape)
    pos = jnp.broadcast_to(pos[:1], pos.shape)
    assert la._maybe_visit_lists(nc, m, q.shape[2]) is not None

    def loss(q, k, v, nc):
        out, blank = la.sfc_cluster_attention(
            q, k, v, pos, nc, w5, b5, blank_k, m
        )
        return jnp.sum(out * out) + jnp.sum(blank), (out, blank)

    with pltpu.force_tpu_interpret_mode():
        # list path: nc concrete at trace time (closed over)
        (l1, (o1, b1)), g1 = jax.value_and_grad(
            lambda q, k, v: loss(q, k, v, nc), argnums=(0, 1, 2),
            has_aux=True,
        )(q, k, v)
        # bounds path: nc is a jit argument -> tracer -> no static lists
        (l2, (o2, b2)), g2 = jax.jit(
            jax.value_and_grad(loss, argnums=(0, 1, 2), has_aux=True)
        )(q, k, v, nc)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b2),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)
