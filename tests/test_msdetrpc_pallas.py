"""Parity tests for the fused msdetrpc Pallas kernel.

The exact-math test runs the kernel in interpreter mode (fp32 everywhere) on
any backend; the compiled-TPU test budgets the default bf16-input MXU
precision (ops/pallas/msdetrpc_kernel.py docstring).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def _tpu():
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _make_case(rng, bh=4, n=300, L=3, kpts=4, kk=4, c_=32,
               sizes=(128, 256, 1024)):
    offs = np.cumsum([0] + list(sizes))
    ntot = int(offs[-1])
    m = kpts * L
    nn_idx = np.zeros((bh, n, m, kk), np.int32)
    for j in range(L):
        centers = rng.integers(0, sizes[j], (bh, n, 1, 1))
        jitter = rng.integers(-8, 9, (bh, n, kpts, kk))
        vals = np.clip(centers + jitter, 0, sizes[j] - 1) + offs[j]
        for ki in range(kpts):
            nn_idx[:, :, ki * L + j, :] = vals[:, :, ki, :]
    nn_w = rng.standard_normal((bh, n, m, kk)).astype(np.float32)
    attn = rng.standard_normal((bh, n, m)).astype(np.float32)
    val = rng.standard_normal((bh, ntot, c_)).astype(np.float32)
    return nn_idx, nn_w, attn, val, tuple(sizes)


def test_msdetrpc_pallas_v2_interpret_exact():
    """Kernel logic (hi/lo one-hot build) is exact in fp32 interpret mode."""
    from autofocusformermod_tpu.ops.clusten import msdetrpc
    from autofocusformermod_tpu.ops.pallas.msdetrpc_kernel import (
        msdetrpc_pallas_impl,
    )

    nn_idx, nn_w, attn, val, sizes = _make_case(
        np.random.default_rng(0), bh=2, n=140
    )
    ref = np.asarray(
        msdetrpc(jnp.asarray(nn_idx), jnp.asarray(nn_w), jnp.asarray(attn),
                 jnp.asarray(val))
    )
    out = np.asarray(
        msdetrpc_pallas_impl(
            jnp.asarray(nn_idx), jnp.asarray(nn_w), jnp.asarray(attn),
            jnp.asarray(val), sizes, version=2, interpret=True,
        )
    )
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_msdetrpc_pallas_bwd_interpret_exact():
    """VJP kernel (d_val accumulate, one-hot d_w extraction) exact in fp32
    interpret mode against the XLA composition's autodiff."""
    from autofocusformermod_tpu.ops.clusten import msdetrpc
    from autofocusformermod_tpu.ops.pallas.msdetrpc_kernel import (
        msdetrpc_pallas_bwd_impl,
    )

    nn_idx, nn_w, attn, val, sizes = _make_case(
        np.random.default_rng(1), bh=2, n=140
    )
    nn_idx, nn_w, attn, val = map(jnp.asarray, (nn_idx, nn_w, attn, val))
    out, vjp = jax.vjp(lambda w, a, v: msdetrpc(nn_idx, w, a, v),
                       nn_w, attn, val)
    g = jnp.asarray(
        np.random.default_rng(2).standard_normal(out.shape).astype(np.float32)
    )
    dw_ref, da_ref, dv_ref = vjp(g)
    dw, da, dv = msdetrpc_pallas_bwd_impl(
        nn_idx, nn_w, attn, val, g, sizes, interpret=True
    )
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(da), np.asarray(da_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.skipif(not _tpu(), reason="needs TPU")
def test_msdetrpc_pallas_bwd_parity():
    """Compiled VJP vs XLA-composition autodiff at the bf16-MXU budget."""
    from autofocusformermod_tpu.ops.clusten import msdetrpc
    from autofocusformermod_tpu.ops.pallas.msdetrpc_kernel import msdetrpc_pallas

    nn_idx, nn_w, attn, val, sizes = _make_case(np.random.default_rng(3))
    nn_idx, nn_w, attn, val = map(jnp.asarray, (nn_idx, nn_w, attn, val))
    out, vjp_ref = jax.vjp(lambda w, a, v: msdetrpc(nn_idx, w, a, v),
                           nn_w, attn, val)
    g = jnp.asarray(
        np.random.default_rng(4).standard_normal(out.shape).astype(np.float32)
    )
    dw_ref, da_ref, dv_ref = vjp_ref(g)
    _, vjp = jax.vjp(
        lambda w, a, v: msdetrpc_pallas(nn_idx, w, a, v, sizes),
        nn_w, attn, val,
    )
    dw, da, dv = vjp(g)
    for got, ref in ((dw, dw_ref), (da, da_ref), (dv, dv_ref)):
        got, ref = np.asarray(got), np.asarray(ref)
        scale = np.abs(ref).max()
        np.testing.assert_allclose(got, ref, atol=2e-2 * scale)


@pytest.mark.skipif(not _tpu(), reason="needs TPU")
def test_msdetrpc_pallas_parity():
    from autofocusformermod_tpu.ops.clusten import msdetrpc
    from autofocusformermod_tpu.ops.pallas.msdetrpc_kernel import msdetrpc_pallas

    nn_idx, nn_w, attn, val, sizes = _make_case(np.random.default_rng(0))
    ref = np.asarray(
        msdetrpc(jnp.asarray(nn_idx), jnp.asarray(nn_w), jnp.asarray(attn),
                 jnp.asarray(val))
    )
    out = np.asarray(
        msdetrpc_pallas(jnp.asarray(nn_idx), jnp.asarray(nn_w),
                        jnp.asarray(attn), jnp.asarray(val), sizes)
    )
    # the kernel's dots run at default (bf16-input) MXU precision: budget
    # ~0.5% relative of the accumulation scale (see module docstring)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(out, ref, atol=2e-2 * scale)
