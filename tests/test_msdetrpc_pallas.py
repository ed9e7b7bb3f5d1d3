"""Parity test for the experimental msdetrpc Pallas kernel (TPU only)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def _tpu():
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


@pytest.mark.skipif(not _tpu(), reason="needs TPU")
def test_msdetrpc_pallas_parity():
    from autofocusformermod_tpu.ops.clusten import msdetrpc
    from autofocusformermod_tpu.ops.pallas.msdetrpc_kernel import msdetrpc_pallas

    rng = np.random.default_rng(0)
    bh, n, L, kpts, kk, c_ = 4, 300, 3, 4, 4, 32
    sizes = [128, 256, 1024]   # level sizes must be multiples of 128
    offs = np.cumsum([0] + sizes)
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

    ref = np.asarray(
        msdetrpc(jnp.asarray(nn_idx), jnp.asarray(nn_w), jnp.asarray(attn),
                 jnp.asarray(val))
    )
    out = np.asarray(
        msdetrpc_pallas(jnp.asarray(nn_idx), jnp.asarray(nn_w),
                        jnp.asarray(attn), jnp.asarray(val), tuple(sizes))
    )
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)
