"""Parity tests for the neighborhood gather ops against explicit numpy loop
references implementing the CUDA kernel semantics (clusten/src/*.cu), forward
and VJP.  This extends the reference's own parity-test pattern
(test_wg_kernel.py / test_msdetrpc_kernel.py) to *all* five kernels."""

import numpy as np
import jax
import jax.numpy as jnp

from autofocusformermod_tpu.ops import (
    cluster_qk,
    cluster_av,
    cluster_wf,
    weighted_gather,
    msdetrpc,
)

RNG = np.random.default_rng(0)


def _rand(*shape):
    return RNG.standard_normal(shape).astype(np.float32)


def _idx(b, n_, m, n):
    return RNG.integers(0, n, size=(b, n_, m)).astype(np.int32)


# ------------------------------------------------------------ numpy loops
def np_cluster_qk(q, k, idx):
    b, h, n, c = q.shape
    m = idx.shape[-1]
    out = np.zeros((b, h, n, m), np.float32)
    for bi in range(b):
        for hi in range(h):
            for i in range(n):
                for ni in range(m):
                    out[bi, hi, i, ni] = q[bi, hi, i] @ k[bi, hi, idx[bi, i, ni]]
    return out


def np_cluster_av(attn, v, idx):
    b, h, n, m = attn.shape
    c = v.shape[-1]
    out = np.zeros((b, h, n, c), np.float32)
    for bi in range(b):
        for hi in range(h):
            for i in range(n):
                for ni in range(m):
                    out[bi, hi, i] += attn[bi, hi, i, ni] * v[bi, hi, idx[bi, i, ni]]
    return out


def np_cluster_wf(w, feat, idx):
    b, n_, m, ic = w.shape
    c = feat.shape[-1]
    out = np.zeros((b, n_, ic, c), np.float32)
    for bi in range(b):
        for i in range(n_):
            for ni in range(m):
                out[bi, i] += np.outer(w[bi, i, ni], feat[bi, idx[bi, i, ni]])
    return out


def np_weighted_gather(idx, w, feat):
    b, n_, m = idx.shape
    c = feat.shape[-1]
    out = np.zeros((b, n_, c), np.float32)
    for bi in range(b):
        for i in range(n_):
            for ni in range(m):
                out[bi, i] += w[bi, i, ni] * feat[bi, idx[bi, i, ni]]
    return out


def np_msdetrpc(nn_idx, nn_w, attn, val):
    b, n, m, kk = nn_idx.shape
    c = val.shape[-1]
    out = np.zeros((b, n, c), np.float32)
    for bi in range(b):
        for i in range(n):
            for mi in range(m):
                interp = np.zeros(c, np.float32)
                for ki in range(kk):
                    interp += nn_w[bi, i, mi, ki] * val[bi, nn_idx[bi, i, mi, ki]]
                out[bi, i] += attn[bi, i, mi] * interp
    return out


# ------------------------------------------------------------------ tests
def _check_vjp(fn, np_fn, args, diff_argnums):
    """Forward parity + VJP parity via finite central differences."""
    out = np.asarray(fn(*[jnp.asarray(a) for a in args]))
    ref = np_fn(*args)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)

    cot = RNG.standard_normal(out.shape).astype(np.float32)

    def scalar_fn(*diff_args):
        full = list(args)
        for slot, a in zip(diff_argnums, diff_args):
            full[slot] = a
        return jnp.sum(fn(*[jnp.asarray(x) for x in full]) * jnp.asarray(cot))

    grads = jax.grad(scalar_fn, argnums=tuple(range(len(diff_argnums))))(
        *[jnp.asarray(args[i]) for i in diff_argnums]
    )
    eps = 1e-3
    for slot, g in zip(diff_argnums, grads):
        g = np.asarray(g)
        # probe a handful of coordinates with central differences
        flat = args[slot].reshape(-1)
        probes = RNG.choice(flat.size, size=min(8, flat.size), replace=False)
        for p in probes:
            orig = flat[p]
            flat[p] = orig + eps
            f_plus = float(np.sum(np_fn(*args) * cot))
            flat[p] = orig - eps
            f_minus = float(np.sum(np_fn(*args) * cot))
            flat[p] = orig
            fd = (f_plus - f_minus) / (2 * eps)
            np.testing.assert_allclose(g.reshape(-1)[p], fd, rtol=5e-2, atol=5e-2)


def test_cluster_qk():
    b, h, n, c, m = 2, 3, 11, 4, 5
    q, k = _rand(b, h, n, c), _rand(b, h, n, c)
    idx = _idx(b, n, m, n)
    _check_vjp(cluster_qk, np_cluster_qk, [q, k, idx], diff_argnums=(0, 1))


def test_cluster_av():
    b, h, n, c, m = 2, 3, 11, 4, 5
    attn, v = _rand(b, h, n, m), _rand(b, h, n, c)
    idx = _idx(b, n, m, n)
    _check_vjp(cluster_av, np_cluster_av, [attn, v, idx], diff_argnums=(0, 1))


def test_cluster_wf():
    b, n, n_, c, m, ic = 2, 13, 7, 4, 5, 3
    w, feat = _rand(b, n_, m, ic), _rand(b, n, c)
    idx = _idx(b, n_, m, n)
    _check_vjp(cluster_wf, np_cluster_wf, [w, feat, idx], diff_argnums=(0, 1))


def test_weighted_gather():
    b, n, n_, c, m = 2, 9, 17, 4, 4
    idx = _idx(b, n_, m, n)
    w, feat = _rand(b, n_, m), _rand(b, n, c)
    _check_vjp(weighted_gather, np_weighted_gather, [idx, w, feat], diff_argnums=(1, 2))


def test_msdetrpc():
    b, n, nv, c, m, kk = 2, 7, 19, 4, 3, 4
    nn_idx = RNG.integers(0, nv, size=(b, n, m, kk)).astype(np.int32)
    nn_w, attn, val = _rand(b, n, m, kk), _rand(b, n, m), _rand(b, nv, c)
    _check_vjp(
        msdetrpc, np_msdetrpc, [nn_idx, nn_w, attn, val], diff_argnums=(1, 2, 3)
    )


def test_scatter_add_grad_is_deterministic():
    """Two runs of the same VJP must be bitwise identical (replaces the
    reference's fastAtomicAdd race-avoidance obligation)."""
    b, n, n_, c, m = 1, 64, 256, 8, 4
    idx = jnp.asarray(_idx(b, n_, m, n))
    w = jnp.asarray(_rand(b, n_, m))
    feat = jnp.asarray(_rand(b, n, c))

    grad_fn = jax.jit(
        jax.grad(lambda f: jnp.sum(weighted_gather(idx, w, f) ** 2))
    )
    g1 = np.asarray(grad_fn(feat))
    g2 = np.asarray(grad_fn(feat))
    np.testing.assert_array_equal(g1, g2)
