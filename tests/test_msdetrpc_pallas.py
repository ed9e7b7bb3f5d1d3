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


@pytest.mark.parametrize("version", [1, 2, 4, 6, 7, 8, 9, 13])
def test_msdetrpc_pallas_bwd_interpret_exact(version):
    """VJP kernel variants (v1 batched-dot extraction; v2 per-band masked
    reduce; v4/v6 windowed with full-width fallback; v7 windowed with
    dense-score d_w + transposed dval accumulation; v8/v9 dense-score d_w
    via lane-gather extraction, with/without transposed dval; v13 = v9 with
    two-tier band windowing, the default) exact in fp32 interpret mode
    against the XLA composition's autodiff."""
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
        nn_idx, nn_w, attn, val, g, sizes, interpret=True, version=version
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


def _to_levels(nn_idx, nn_w, attn, sizes):
    """Convert an interleaved case to the per-level API inputs."""
    bh, n, m, kk = nn_idx.shape
    L = len(sizes)
    kpts = m // L
    offs = np.cumsum([0] + list(sizes))
    idxs, ws = [], []
    for j in range(L):
        slots = [ki * L + j for ki in range(kpts)]
        ij = nn_idx[:, :, slots, :] - offs[j]
        wj = nn_w[:, :, slots, :] * attn[:, :, slots, None]
        idxs.append(jnp.asarray(ij.reshape(bh, n, kpts * kk), jnp.int32))
        ws.append(jnp.asarray(wj.reshape(bh, n, kpts * kk), jnp.float32))
    return tuple(idxs), tuple(ws)


@pytest.mark.parametrize("version", [8, 9, 13])
def test_msdetrpc_pallas_levels_interpret_exact(version):
    """Per-level-input kernels (v8 static sweep, v9 windowed masked-reduce,
    v13 windowed lane-gather) match the XLA reference in fp32."""
    from autofocusformermod_tpu.ops.clusten import msdetrpc
    from autofocusformermod_tpu.ops.pallas.msdetrpc_kernel import (
        msdetrpc_pallas_levels_impl,
    )

    nn_idx, nn_w, attn, val, sizes = _make_case(
        np.random.default_rng(1), bh=2, n=140
    )
    ref = np.asarray(
        msdetrpc(jnp.asarray(nn_idx), jnp.asarray(nn_w), jnp.asarray(attn),
                 jnp.asarray(val))
    )
    idxs, ws = _to_levels(nn_idx, nn_w, attn, sizes)
    out = np.asarray(
        msdetrpc_pallas_levels_impl(idxs, ws, jnp.asarray(val), sizes,
                                    interpret=True, version=version)
    )
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.skipif(not _tpu(), reason="needs TPU")
def test_msdetrpc_pallas_levels_vjp_tpu():
    """Per-level custom VJP (folded weights + val) vs the XLA reference."""
    from autofocusformermod_tpu.ops.clusten import msdetrpc
    from autofocusformermod_tpu.ops.pallas.msdetrpc_kernel import (
        msdetrpc_pallas_levels,
    )

    rng = np.random.default_rng(2)
    nn_idx, nn_w, attn, val, sizes = _make_case(rng)
    idxs, ws = _to_levels(nn_idx, nn_w, attn, sizes)
    bh, n = nn_idx.shape[:2]
    g = jnp.asarray(rng.standard_normal((bh, n, val.shape[-1])), jnp.float32)

    # XLA reference as a function of the SAME folded per-level weights
    L = len(sizes)
    kpts = nn_idx.shape[2] // L
    offs = np.cumsum([0] + list(sizes))

    def ref_fn(ws_, v):
        slot_parts = []
        for ki in range(kpts):
            for j in range(L):
                slot_parts.append(
                    (jnp.asarray(nn_idx[:, :, ki * L + j, :], jnp.int32)
                     + 0,
                     ws_[j].reshape(bh, n, kpts, 4)[:, :, ki, :])
                )
        idx_full = jnp.stack([p[0] for p in slot_parts], axis=2)
        w_full = jnp.stack([p[1] for p in slot_parts], axis=2)
        ones = jnp.ones((bh, n, kpts * L), jnp.float32)
        return msdetrpc(idx_full, w_full, ones, v)

    out_ref, vjp_ref = jax.vjp(ref_fn, ws, jnp.asarray(val))
    dws_ref, dv_ref = vjp_ref(g)
    out, vjp = jax.vjp(
        lambda ws_, v: msdetrpc_pallas_levels(idxs, ws_, v, sizes), ws,
        jnp.asarray(val),
    )
    dws, dv = vjp(g)

    scale = float(np.abs(np.asarray(out_ref)).max())
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               atol=2e-2 * scale)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_ref),
                               atol=2e-2 * float(np.abs(dv_ref).max()))
    for got, ref in zip(dws, dws_ref):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref),
            atol=2e-2 * float(np.abs(np.asarray(ref)).max()),
        )


def test_msdetrpc_pallas_levels_s_interpret_exact():
    """Stacked-operand forward (v14, channel-major output) matches the XLA
    reference exactly in fp32 interpret mode — the production default path
    (MSDETRPC_STACKED=1, models/pixel_decoder.py _msdetrpc_dispatch_t)."""
    from autofocusformermod_tpu.ops.clusten import msdetrpc
    from autofocusformermod_tpu.ops.pallas.msdetrpc_kernel import (
        msdetrpc_pallas_levels_s_impl,
    )

    nn_idx, nn_w, attn, val, sizes = _make_case(
        np.random.default_rng(5), bh=2, n=140
    )
    ref = np.asarray(
        msdetrpc(jnp.asarray(nn_idx), jnp.asarray(nn_w), jnp.asarray(attn),
                 jnp.asarray(val))
    )
    idxs, ws = _to_levels(nn_idx, nn_w, attn, sizes)
    idx_s = jnp.concatenate(idxs, axis=2)
    w_s = jnp.concatenate(ws, axis=2)
    out = np.asarray(
        msdetrpc_pallas_levels_s_impl(idx_s, w_s, jnp.asarray(val), sizes,
                                      interpret=True)
    )
    np.testing.assert_allclose(out.transpose(0, 2, 1), ref,
                               rtol=1e-5, atol=1e-5)


def test_msdetrpc_pallas_levels_s_bwd_interpret():
    """Stacked-path custom VJP (split per level + lane-gather backward,
    channel-major cotangent) vs autodiff of the XLA reference in fp32
    interpret mode."""
    from autofocusformermod_tpu.ops.clusten import msdetrpc
    from autofocusformermod_tpu.ops.pallas.msdetrpc_kernel import (
        msdetrpc_pallas_levels_s_bwd_impl,
    )

    rng = np.random.default_rng(6)
    nn_idx, nn_w, attn, val, sizes = _make_case(rng, bh=2, n=140)
    idxs, ws = _to_levels(nn_idx, nn_w, attn, sizes)
    idx_s = jnp.concatenate(idxs, axis=2)
    w_s = jnp.concatenate(ws, axis=2)
    bh, n = nn_idx.shape[:2]
    c_ = val.shape[-1]
    g = jnp.asarray(rng.standard_normal((bh, n, c_)), jnp.float32)

    # XLA reference as a function of the SAME stacked folded weights
    L = len(sizes)
    kpts = nn_idx.shape[2] // L
    p = kpts * 4
    offs = np.cumsum([0] + list(sizes))

    def ref_fn(w_s_, v):
        parts_i, parts_w = [], []
        for ki in range(kpts):
            for j in range(L):
                parts_i.append(jnp.asarray(nn_idx[:, :, ki * L + j, :]))
                parts_w.append(
                    w_s_[:, :, j * p:(j + 1) * p]
                    .reshape(bh, n, kpts, 4)[:, :, ki, :]
                )
        idx_full = jnp.stack(parts_i, axis=2)
        w_full = jnp.stack(parts_w, axis=2)
        ones = jnp.ones((bh, n, kpts * L), jnp.float32)
        return jnp.vdot(msdetrpc(idx_full, w_full, ones, v), g)

    dw_ref, dv_ref = jax.grad(ref_fn, argnums=(0, 1))(w_s, jnp.asarray(val))
    # cotangent arrives CHANNEL-MAJOR in production (out of _run_fwd_v14)
    _, dw, dv = msdetrpc_pallas_levels_s_bwd_impl(
        idx_s, w_s, jnp.asarray(val), g.transpose(0, 2, 1), sizes,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_ref),
                               rtol=1e-4, atol=1e-4)


def test_dual_layout_dense_input_bhcn():
    """DualLayoutDense(input_bhcn=True) — the out_proj consuming the v14
    kernel's channel-major (b, h, c_, n) output — equals the row-major Dense
    on the untransposed/head-merged input (models/pixel_decoder.py)."""
    from autofocusformermod_tpu.models.pixel_decoder import DualLayoutDense

    rng = np.random.default_rng(7)
    b, h, c_, n, f = 2, 4, 16, 96, 32
    x_bhcn = jnp.asarray(rng.standard_normal((b, h, c_, n)), jnp.float32)
    mod = DualLayoutDense(f)
    params = mod.init(jax.random.PRNGKey(0), x_bhcn, input_bhcn=True)
    got = mod.apply(params, x_bhcn, input_bhcn=True)          # (b, n, f)
    # row-major equivalent: (b, n, h*c_) @ kernel
    x_row = x_bhcn.transpose(0, 3, 1, 2).reshape(b, n, h * c_)
    ref = mod.apply(params, x_row)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # and the transposed output mode used by the offset/attention nets
    got_t = mod.apply(params, x_row, transposed=True)         # (b, f, n)
    np.testing.assert_allclose(np.asarray(got_t).transpose(0, 2, 1),
                               np.asarray(ref), rtol=1e-5, atol=1e-5)


def _to_bh(idxs, ws, h):
    """(b*h, n, P) per-level arrays -> (b, n, h, P) head-natural."""
    out_i, out_w = [], []
    for i_, w_ in zip(idxs, ws):
        bh, n, p = i_.shape
        b = bh // h
        out_i.append(jnp.asarray(i_).reshape(b, h, n, p).transpose(0, 2, 1, 3))
        out_w.append(jnp.asarray(w_).reshape(b, h, n, p).transpose(0, 2, 1, 3))
    return tuple(out_i), tuple(out_w)


def test_msdetrpc_pallas_bh_interpret_exact():
    """Head-natural path (BlockSpec index maps instead of XLA transposes) is
    bit-identical to the v8 levels path on permuted inputs."""
    from autofocusformermod_tpu.ops.pallas.msdetrpc_kernel import (
        msdetrpc_pallas_bh_impl,
        msdetrpc_pallas_levels_impl,
    )

    nn_idx, nn_w, attn, val, sizes = _make_case(
        np.random.default_rng(3), bh=4, n=140
    )
    idxs, ws = _to_levels(nn_idx, nn_w, attn, sizes)
    h = 2
    bh, ntot, c_ = val.shape
    b = bh // h
    idxs_bh, ws_bh = _to_bh(idxs, ws, h)
    val_bh = jnp.asarray(val).reshape(b, h, ntot, c_).transpose(0, 2, 1, 3)

    ref = np.asarray(msdetrpc_pallas_levels_impl(
        tuple(jnp.asarray(x) for x in idxs),
        tuple(jnp.asarray(x) for x in ws),
        jnp.asarray(val), sizes, interpret=True, version=8,
    ))
    got = np.asarray(msdetrpc_pallas_bh_impl(
        idxs_bh, ws_bh, val_bh, sizes, interpret=True,
    ))
    got_t = got.transpose(0, 2, 1, 3).reshape(bh, -1, c_)
    np.testing.assert_array_equal(got_t, ref)


def test_msdetrpc_pallas_bh_bwd_interpret():
    """Head-natural backward kernel vs autodiff of the XLA reference."""
    from autofocusformermod_tpu.ops.clusten import msdetrpc
    from autofocusformermod_tpu.ops.pallas.msdetrpc_kernel import (
        msdetrpc_pallas_bh_bwd_impl,
    )

    rng = np.random.default_rng(4)
    nn_idx, nn_w, attn, val, sizes = _make_case(rng, bh=4, n=140)
    idxs, ws = _to_levels(nn_idx, nn_w, attn, sizes)
    h = 2
    bh, ntot, c_ = val.shape
    b, n = bh // h, nn_idx.shape[1]
    idxs_bh, ws_bh = _to_bh(idxs, ws, h)
    val_bh = jnp.asarray(val).reshape(b, h, ntot, c_).transpose(0, 2, 1, 3)
    g_bh = jnp.asarray(rng.standard_normal((b, n, h, c_)), jnp.float32)

    _, dws, dval = msdetrpc_pallas_bh_bwd_impl(
        idxs_bh, ws_bh, val_bh, g_bh, sizes, interpret=True,
    )

    # XLA reference on the equivalent (b*h)-transposed layout
    L = len(sizes)
    kpts = nn_idx.shape[2] // L
    g_flat = g_bh.transpose(0, 2, 1, 3).reshape(bh, n, c_)

    def ref_fn(ws_, v):
        parts_i, parts_w = [], []
        for ki in range(kpts):
            for j in range(L):
                parts_i.append(jnp.asarray(nn_idx[:, :, ki * L + j, :]))
                parts_w.append(
                    ws_[j].reshape(bh, n, kpts, 4)[:, :, ki, :]
                )
        idx_full = jnp.stack(parts_i, axis=2)
        w_full = jnp.stack(parts_w, axis=2)
        ones = jnp.ones((bh, n, kpts * L), jnp.float32)
        return jnp.vdot(msdetrpc(idx_full, w_full, ones, v), g_flat)

    dref = jax.grad(ref_fn, argnums=(0, 1))(
        tuple(jnp.asarray(x) for x in ws), jnp.asarray(val)
    )
    for j in range(L):
        mine = np.asarray(dws[j]).transpose(0, 2, 1, 3).reshape(bh, n, -1)
        np.testing.assert_allclose(mine, np.asarray(dref[0][j]),
                                   rtol=1e-4, atol=1e-4)
    dval_t = np.asarray(dval).transpose(0, 2, 1, 3).reshape(bh, ntot, c_)
    np.testing.assert_allclose(dval_t, np.asarray(dref[1]),
                               rtol=1e-4, atol=1e-4)
