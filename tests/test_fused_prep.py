"""Parity tests for the channel-major fused sampling-prep path.

The fused path (models/pixel_decoder.py MSDeformAttnPc._level_fused_t) runs
the offset/attention projections, Morton-windowed packed-table lookup,
Shepard weighting, and the sampling kernel entirely with queries on the
minor axis.  These tests pin it against the legacy row-major path (the
semantic reference, itself parity-tested against the real reference) with
the Pallas pieces in interpret mode so they run on the CPU mesh.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_morton_perm_bijection_and_rank():
    from autofocusformermod_tpu.geometry.morton import (
        is_pow2, morton_perm, morton_rank,
    )

    for h, w in [(32, 32), (16, 64), (128, 128), (64, 16)]:
        assert is_pow2(h) and is_pow2(w)
        perm = morton_perm(h, w)
        assert sorted(perm.tolist()) == list(range(h * w))
        # perm[rank] = cell  <=>  rank(cell) round-trips
        lw = w.bit_length() - 1
        lh = h.bit_length() - 1
        ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        rank = morton_rank(xs.reshape(-1), ys.reshape(-1), lw, lh)
        cells = ys.reshape(-1) * w + xs.reshape(-1)
        assert np.array_equal(perm[rank], cells)


def test_morton_locality():
    """Cells of a small square region span a bounded Morton rank window —
    the property the windowed gather's fast path relies on."""
    from autofocusformermod_tpu.geometry.morton import morton_rank

    rng = np.random.default_rng(0)
    spreads = []
    for _ in range(200):
        y0 = int(rng.integers(0, 128 - 8))
        x0 = int(rng.integers(0, 128 - 8))
        ys, xs = np.meshgrid(np.arange(y0, y0 + 8), np.arange(x0, x0 + 8),
                             indexing="ij")
        r = morton_rank(xs.reshape(-1), ys.reshape(-1), 7, 7)
        spreads.append(int(r.max() - r.min()))
    spreads = np.sort(spreads)
    # Z-order has unbounded worst-case seams (a window straddling the grid
    # midlines spans ~the whole rank space) — the gather's per-128-sample
    # fallback eats those — but TYPICAL windows are rank-compact, which is
    # what makes the fast path the common case:
    assert spreads[len(spreads) // 2] <= 1024       # median within 8 bands
    assert spreads[int(0.8 * len(spreads))] <= 4096  # p80 within 32 bands


def test_windowed_row_gather_k_sub_exact():
    from autofocusformermod_tpu.ops.pallas.window_gather import (
        windowed_row_gather,
    )

    rng = np.random.default_rng(1)
    b, c, n = 2, 12, 1024
    table = jnp.asarray(rng.standard_normal((b, c, n)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, n, (b, 500)), jnp.int32)
    want = jnp.take_along_axis(table, idx[:, None, :].repeat(c, 1), axis=2)
    for k_sub in (2, 4, 16):
        got = windowed_row_gather(table, idx, interpret=True, k_sub=k_sub)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def _interpret_pallas(monkeypatch):
    """Route the fused path's Pallas calls through interpret mode (CPU)."""
    import functools

    from autofocusformermod_tpu.ops.pallas import msdetrpc_kernel as mk
    from autofocusformermod_tpu.ops.pallas import window_gather as wg

    real_gather = wg.windowed_row_gather
    monkeypatch.setattr(
        wg, "windowed_row_gather",
        functools.partial(real_gather, interpret=True),
    )
    monkeypatch.setattr(
        mk, "msdetrpc_pallas_levels_t",
        functools.partial(mk.msdetrpc_pallas_levels_t_impl, interpret=True),
    )


@pytest.mark.parametrize("learnable_power", [True, False])
def test_fused_prep_matches_legacy(monkeypatch, learnable_power):
    """Full MSDeformAttnPc forward: fused channel-major path == legacy
    row-major path on identical params and inputs."""
    from autofocusformermod_tpu.geometry.morton import morton_perm
    from autofocusformermod_tpu.models.pixel_decoder import MSDeformAttnPc

    _interpret_pallas(monkeypatch)

    rng = np.random.default_rng(2)
    b, c = 2, 64
    level_sizes = (512, 256, 128)
    shapes = [(16, 16), (8, 8), (4, 4)]
    gh = gw = 32
    grid_hw = (gh, gw)
    spatial_shapes = shapes + [grid_hw]

    querys = [jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)
              for n in level_sizes]
    values = [jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)
              for n in level_sizes]
    poss = [
        jnp.asarray(
            rng.uniform(0, [sw, sh], (b, n, 2)), jnp.float32
        )
        for n, (sh, sw) in zip(level_sizes, shapes)
    ]
    # synthetic packed tables: [idx x4 | x x4 | y x4] per grid cell, with
    # level-local indices and positions in the level's canvas
    nb_packed = []
    for n, (sh, sw) in zip(level_sizes, shapes):
        nbi = rng.integers(0, n, (b, gh * gw, 4)).astype(np.float32)
        nbx = rng.uniform(0, sw, (b, gh * gw, 4)).astype(np.float32)
        nby = rng.uniform(0, sh, (b, gh * gw, 4)).astype(np.float32)
        nb_packed.append(jnp.asarray(np.concatenate([nbi, nbx, nby], -1)))
    perm = jnp.asarray(morton_perm(gh, gw))
    nb_packed_t = [t[:, perm, :].transpose(0, 2, 1) for t in nb_packed]

    module = MSDeformAttnPc(
        d_model=c, n_levels=3, n_heads=4, n_points=4,
        shepard_power=3.0, shepard_power_learnable=learnable_power,
    )
    variables = module.init(
        jax.random.PRNGKey(0), querys, poss, values, spatial_shapes,
        nb_packed,
    )
    # break the zero-init symmetry so offsets/attention actually vary
    variables = jax.tree_util.tree_map(
        lambda p: p + 0.02 * jnp.asarray(
            np.random.default_rng(3).standard_normal(p.shape), p.dtype
        ),
        variables,
    )

    legacy = module.apply(
        variables, querys, poss, values, spatial_shapes, nb_packed,
    )
    fused = module.apply(
        variables, querys, poss, values, spatial_shapes, nb_packed,
        nb_packed_t,
    )
    for lo, fo in zip(legacy, fused):
        np.testing.assert_allclose(
            np.asarray(fo), np.asarray(lo), rtol=2e-4, atol=2e-4,
        )


def test_fused_prep_grads_match_legacy(monkeypatch):
    """Parameter gradients agree between the two paths (the fused path's
    stop_gradient on the packed gather must not cut any real grad route).

    The sampling kernel is stubbed with a differentiable XLA equivalent —
    this test pins the PREP chain's gradients (offsets/attention/power
    through d2 and Shepard); the kernel's own VJP is pinned by
    test_msdetrpc_pallas."""
    import functools

    from autofocusformermod_tpu.geometry.morton import morton_perm
    from autofocusformermod_tpu.models.pixel_decoder import MSDeformAttnPc
    from autofocusformermod_tpu.ops.pallas import msdetrpc_kernel as mk
    from autofocusformermod_tpu.ops.pallas import window_gather as wg

    monkeypatch.setattr(
        wg, "windowed_row_gather",
        functools.partial(wg.windowed_row_gather, interpret=True),
    )

    def levels_t_ref(idx_ts, w_ts, val, level_sizes):
        offs = np.cumsum([0] + list(level_sizes))[:-1]
        bh = val.shape[0]
        out = 0.0
        for off, it, wt in zip(offs, idx_ts, w_ts):
            gid = (it + int(off)
                   + (jnp.arange(bh, dtype=jnp.int32) * val.shape[1])
                   [:, None, None]).reshape(-1)
            rows = jnp.take(val.reshape(-1, val.shape[-1]), gid, axis=0)
            rows = rows.reshape(*it.shape, val.shape[-1])  # (bh, P, n, c)
            out = out + jnp.sum(wt[..., None] * rows, axis=1)  # (bh, n, c)
        return out

    monkeypatch.setattr(mk, "msdetrpc_pallas_levels_t", levels_t_ref)

    rng = np.random.default_rng(4)
    b, c = 1, 32
    level_sizes = (256, 128, 128)
    shapes = [(16, 16), (8, 8), (4, 4)]
    gh = gw = 16
    spatial_shapes = shapes + [(gh, gw)]

    querys = [jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)
              for n in level_sizes]
    values = [jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)
              for n in level_sizes]
    poss = [jnp.asarray(rng.uniform(0, [sw, sh], (b, n, 2)), jnp.float32)
            for n, (sh, sw) in zip(level_sizes, shapes)]
    nb_packed = []
    for n, (sh, sw) in zip(level_sizes, shapes):
        nbi = rng.integers(0, n, (b, gh * gw, 4)).astype(np.float32)
        nbx = rng.uniform(0, sw, (b, gh * gw, 4)).astype(np.float32)
        nby = rng.uniform(0, sh, (b, gh * gw, 4)).astype(np.float32)
        nb_packed.append(jnp.asarray(np.concatenate([nbi, nbx, nby], -1)))
    perm = jnp.asarray(morton_perm(gh, gw))
    nb_packed_t = [t[:, perm, :].transpose(0, 2, 1) for t in nb_packed]

    module = MSDeformAttnPc(
        d_model=c, n_levels=3, n_heads=4, n_points=4,
        shepard_power=3.0, shepard_power_learnable=True,
    )
    variables = module.init(
        jax.random.PRNGKey(0), querys, poss, values, spatial_shapes,
        nb_packed,
    )
    variables = jax.tree_util.tree_map(
        lambda p: p + 0.02 * jnp.asarray(
            np.random.default_rng(5).standard_normal(p.shape), p.dtype
        ),
        variables,
    )

    def loss(v, tables_t):
        outs = module.apply(v, querys, poss, values, spatial_shapes,
                            nb_packed, tables_t)
        return sum(jnp.sum(o * o) for o in outs)

    g_legacy = jax.grad(loss)(variables, None)
    g_fused = jax.grad(loss)(variables, nb_packed_t)
    flat_l, _ = jax.tree_util.tree_flatten(g_legacy)
    flat_f, _ = jax.tree_util.tree_flatten(g_fused)
    for gl, gf in zip(flat_l, flat_f):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gl), rtol=5e-3, atol=5e-4,
        )
