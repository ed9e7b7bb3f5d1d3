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


def test_stratified_topk_captures_global_uncertainty_mass():
    """Bound the STRATIFIED_TOPK selection drift vs the reference's global
    top-k (ADVICE r4): per-128-chunk capped selection can differ from global
    top-k only when >k_per winners land in one y-band, so measure what
    matters for supervision — the fraction of the global winners' total
    uncertainty mass the capped selection captures — at representative mask
    logit distributions (edge-concentrated, blob, and uniform-noise), using
    the exact flagship ranking geometry (ns=37632, k=9408, 294 chunks).

    The loss integrates uncertainty-weighted BCE/dice over the selected
    points; captured-mass is the first-order proxy for that integral's
    support.  Random-remainder points (25%) are identical in both schemes
    and excluded here, making this a conservative bound."""
    from autofocusformermod_tpu.losses.point_sample import _counter_uniform

    ns, k = 37632, 9408
    chunks, k_per = ns // 128, 9408 // (ns // 128) * 0 + 9408 // 294
    assert chunks * 128 == ns and k_per * chunks == k

    h = w = 128
    j = np.arange(ns)
    ux = np.asarray(
        _counter_uniform(jnp.uint32(3), jnp.arange(ns, dtype=jnp.uint32))
    )
    uy = np.asarray(
        _counter_uniform(jnp.uint32(11), jnp.arange(ns, dtype=jnp.uint32))
    )
    ys = (j // 128 + uy) / chunks
    cx = np.clip((ux * w).astype(np.int32), 0, w - 1)
    cy = np.clip((ys * h).astype(np.int32), 0, h - 1)

    yy, xx = np.mgrid[0:h, 0:w]
    cases = {
        # horizontal edge: uncertainty concentrated in ONE y-band — the
        # adversarial case for a per-y-stratum cap
        "horizontal_edge": 8.0 * (yy - 40.5) / 4.0,
        # circular blob boundary (typical object mask)
        "blob": 8.0 * (np.hypot(yy - 64, xx - 64) - 30.0) / 5.0,
        # near-tied everywhere (random init)
        "noise": np.random.default_rng(0).normal(0, 0.5, (h, w)),
    }
    measured = {}
    for name, logit_map in cases.items():
        unc = -np.abs(logit_map[cy, cx])
        glob = np.argsort(unc)[-k:]
        capped = np.concatenate([
            c * 128 + np.argsort(unc[c * 128:(c + 1) * 128])[-k_per:]
            for c in range(chunks)
        ])
        mass = lambda sel: float(np.sum(unc[sel] - unc.min()))
        captured = mass(capped) / max(mass(glob), 1e-9)
        overlap = len(np.intersect1d(glob, capped)) / k
        measured[name] = (captured, overlap)
        print(f"{name}: captured_mass={captured:.4f} overlap={overlap:.3f}")

    # measured: noise 0.998/0.93, blob 0.898/0.62, edge 0.644/0.25 —
    # near-ties are benign; 2-D boundaries keep ~90% of the mass but swap
    # ~38% of borderline picks for spread ones; a 1-D band is the worst case
    assert measured["blob"][0] > 0.85, measured
    assert measured["noise"][0] > 0.95, measured
    # 1-D horizontal band: the ADVERSARIAL axis for a per-y-stratum cap —
    # only 32/128 winners per in-band chunk are admitted, the rest trade
    # for spatially-spread less-uncertain points.  Measured: ~0.64 mass /
    # ~0.25 overlap.  This is the cap's real worst case; whether it affects
    # TRAINING is pinned at the end-metric level by the overfit-loss A/B
    # artifact (STRATTOPK_AB_r05.json, tools/train_soak.py --ab-topk),
    # mirroring how NN_RANK_UNCERTAINTY drift was budgeted.
    assert measured["horizontal_edge"][0] > 0.55, measured


def test_stratified_topk_ab_artifact_within_budget():
    """End-metric pin for the STRATIFIED_TOPK cap (ADVICE r4): the committed
    overfit A/B (same seed/data/steps, cap on vs reference global top-k)
    must show the capped selection does not slow optimization — final
    matched-mask BCE and dice within 15% relative (the run-to-run noise
    band measured across soak seeds) of the global-top-k run."""
    import json
    import os

    path = os.path.join(
        os.path.dirname(__file__), "..", "STRATTOPK_AB_r05.json"
    )
    if not os.path.exists(path):
        pytest.skip("STRATTOPK_AB_r05.json not yet committed (TPU artifact)")
    with open(path) as f:
        ab = json.load(f)
    fin_c, fin_g = ab["capped"]["final"], ab["global"]["final"]
    for key in ("loss_mask", "loss_dice"):
        c, g = fin_c[key], fin_g[key]
        assert c <= g * 1.15 + 5e-3, (key, c, g)
