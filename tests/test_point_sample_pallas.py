"""Parity tests for the fused one-hot MXU point-sampling kernel vs the XLA
flat-gather reference (losses/point_sample.point_sample)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def _tpu():
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _case(rng, n=4, h=128, w=128, p=256):
    masks = jnp.asarray(rng.standard_normal((n, h, w)), jnp.float32)
    # cover in-bounds, edge, and out-of-bounds coords
    coords = jnp.asarray(rng.uniform(-0.05, 1.05, (n, p, 2)), jnp.float32)
    return masks, coords


def test_point_sample_pallas_interpret_exact():
    from autofocusformermod_tpu.losses.point_sample import point_sample
    from autofocusformermod_tpu.ops.pallas.point_sample_kernel import (
        point_sample_pallas_impl,
    )

    masks, coords = _case(np.random.default_rng(0))
    ref = np.asarray(point_sample(masks, coords))
    out = np.asarray(point_sample_pallas_impl(masks, coords, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_point_sample_pallas_bwd_interpret_exact():
    from autofocusformermod_tpu.losses.point_sample import point_sample
    from autofocusformermod_tpu.ops.pallas.point_sample_kernel import (
        point_sample_pallas_bwd_impl,
    )

    masks, coords = _case(np.random.default_rng(1))
    _, vjp = jax.vjp(lambda m: point_sample(m, coords), masks)
    g = jnp.asarray(
        np.random.default_rng(2).standard_normal((masks.shape[0], coords.shape[1])),
        jnp.float32,
    )
    (dref,) = vjp(g)
    dout = point_sample_pallas_bwd_impl(masks.shape, coords, g, interpret=True)
    np.testing.assert_allclose(
        np.asarray(dout), np.asarray(dref), rtol=1e-5, atol=1e-5
    )


def test_snap_to_cell_centers_is_nearest_read():
    """Bilinear at snapped centers == the integer nearest-cell gather."""
    from autofocusformermod_tpu.losses.point_sample import point_sample
    from autofocusformermod_tpu.ops.pallas.point_sample_kernel import (
        snap_to_cell_centers,
    )

    rng = np.random.default_rng(3)
    n, h, w, p = 3, 64, 32, 100
    masks = jnp.asarray(rng.standard_normal((n, h, w)), jnp.float32)
    coords = jnp.asarray(rng.uniform(0, 1, (n, p, 2)), jnp.float32)
    out = np.asarray(point_sample(masks, snap_to_cell_centers(coords, h, w)))
    cx = np.clip((np.asarray(coords[..., 0]) * w).astype(int), 0, w - 1)
    cy = np.clip((np.asarray(coords[..., 1]) * h).astype(int), 0, h - 1)
    ref = np.asarray(masks)[np.arange(n)[:, None], cy, cx]
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)


@pytest.mark.skipif(not _tpu(), reason="needs TPU")
def test_point_sample_pallas_tpu_parity():
    from autofocusformermod_tpu.losses.point_sample import point_sample
    from autofocusformermod_tpu.ops.pallas.point_sample_kernel import (
        point_sample_pallas,
    )

    masks, coords = _case(np.random.default_rng(4), n=8, h=512, w=512, p=512)
    out, vjp = jax.vjp(lambda m: point_sample_pallas(m, coords), masks)
    ref, vjp_ref = jax.vjp(lambda m: point_sample(m, coords), masks)
    scale = np.abs(np.asarray(ref)).max()
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-2 * scale
    )
    g = jnp.asarray(
        np.random.default_rng(5).standard_normal(out.shape), jnp.float32
    )
    (d,) = vjp(g)
    (dref,) = vjp_ref(g)
    dscale = np.abs(np.asarray(dref)).max()
    np.testing.assert_allclose(
        np.asarray(d), np.asarray(dref), atol=2e-2 * dscale
    )


def test_point_sample_nearest_interpret_exact():
    from autofocusformermod_tpu.ops.pallas.point_sample_kernel import (
        point_sample_nearest_pallas,
    )

    rng = np.random.default_rng(6)
    n, h, w, p = 3, 128, 128, 256
    masks = jnp.asarray(rng.standard_normal((n, h, w)), jnp.float32)
    coords = jnp.asarray(rng.uniform(-0.05, 1.05, (n, p, 2)), jnp.float32)
    out = np.asarray(point_sample_nearest_pallas(masks, coords, interpret=True))
    cx = np.clip((np.asarray(coords[..., 0]) * w).astype(int), 0, w - 1)
    cy = np.clip((np.asarray(coords[..., 1]) * h).astype(int), 0, h - 1)
    ref = np.asarray(masks)[np.arange(n)[:, None], cy, cx]
    # image values round to bf16 inside the kernel (ranking-only tolerance)
    np.testing.assert_allclose(out, ref, rtol=1e-2, atol=1e-2)


@pytest.mark.skipif(not _tpu(), reason="needs TPU")
def test_point_sample_nearest_tpu_parity():
    from autofocusformermod_tpu.ops.pallas.point_sample_kernel import (
        point_sample_nearest_pallas,
    )

    rng = np.random.default_rng(7)
    n, h, w, p = 4, 128, 128, 5376
    masks = jnp.asarray(rng.standard_normal((n, h, w)), jnp.float32)
    coords = jnp.asarray(rng.uniform(-0.05, 1.05, (n, p, 2)), jnp.float32)
    out = np.asarray(jax.jit(point_sample_nearest_pallas)(masks, coords))
    cx = np.clip((np.asarray(coords[..., 0]) * w).astype(int), 0, w - 1)
    cy = np.clip((np.asarray(coords[..., 1]) * h).astype(int), 0, h - 1)
    ref = np.asarray(masks)[np.arange(n)[:, None], cy, cx]
    scale = np.abs(ref).max()
    np.testing.assert_allclose(out, ref, atol=1e-2 * scale)


def test_point_sample_nearest_rows_interpret_exact():
    """Row-stratified nearest kernel: exact (fp32 lane gathers) vs direct
    indexing when each chunk's cy spans its two pinned rows."""
    from autofocusformermod_tpu.ops.pallas.point_sample_kernel import (
        point_sample_nearest_rows_pallas,
        point_sample_nearest_rows_supported,
    )

    rng = np.random.default_rng(8)
    n, h, w = 3, 128, 128
    chunks = 294          # = 37632 / 128, the criterion ranking shape
    assert point_sample_nearest_rows_supported(n, h, w, chunks * 128)
    masks = jnp.asarray(rng.standard_normal((n, h, w)), jnp.float32)
    u = rng.uniform(size=(n, chunks, 128))
    ys = (np.arange(chunks)[None, :, None] + u) / chunks
    cy = np.clip((ys * h).astype(np.int32), 0, h - 1)
    cx = rng.integers(0, w, (n, chunks, 128)).astype(np.int32)
    out = np.asarray(
        point_sample_nearest_rows_pallas(
            masks, jnp.asarray(cx), jnp.asarray(cy), interpret=True
        )
    )
    ref = np.asarray(masks)[np.arange(n)[:, None, None], cy, cx]
    np.testing.assert_array_equal(out, ref)


def test_stratified_ranking_marginals():
    """Stratified candidate y (as generated by the ranked sampler) has an
    exactly uniform marginal: equal counts per equal-height band."""
    from autofocusformermod_tpu.losses.point_sample import _counter_uniform

    ns, chunks = 37632, 294
    j = np.arange(ns)
    u = np.asarray(
        _counter_uniform(jnp.uint32(7), jnp.arange(ns, dtype=jnp.uint32))
    )
    y = (j // 128 + u) / chunks
    counts, _ = np.histogram(y, bins=16, range=(0.0, 1.0))
    # 294 chunks over 16 bands: band counts within one chunk of each other
    assert counts.min() >= (ns // 16) - 128 and counts.max() <= (ns // 16) + 128
    assert 0.0 <= y.min() and y.max() < 1.0
