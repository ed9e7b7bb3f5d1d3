"""Dense full-grid PointConv fast path vs the 9-NN gather path.

The dense path (models/pixel_decoder.py PointConv._dense_grid) must be
numerically interchangeable with the gather composition for any token
permutation of the grid — including the border ring, where 9-NN membership
ties at d2 >= 2 are broken by LOWEST TOKEN INDEX (gridnn._window_knn lut
semantics) and therefore depend on the runtime token order.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from autofocusformermod_tpu.models import pixel_decoder as pd


@pytest.mark.parametrize("b,h,w,c", [(2, 12, 9, 16), (1, 8, 8, 8), (3, 9, 17, 4)])
def test_dense_grid_pointconv_matches_gather(b, h, w, c):
    rng = np.random.default_rng(0)
    n = h * w
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    raster = np.stack([xs, ys], -1).reshape(-1, 2).astype(np.float32)
    perm = np.stack([rng.permutation(n) for _ in range(b)])
    pos = jnp.asarray(raster[perm])
    x = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)

    m = pd.PointConv(out_dim=8)
    vars_ = m.init(jax.random.PRNGKey(0), x, pos, (h, w))
    saved = pd.DENSE_GRID_POINTCONV
    try:
        pd.DENSE_GRID_POINTCONV = True
        out_dense = m.apply(vars_, x, pos, (h, w))
        pd.DENSE_GRID_POINTCONV = False
        out_ref = m.apply(vars_, x, pos, (h, w))
    finally:
        pd.DENSE_GRID_POINTCONV = saved
    np.testing.assert_allclose(
        np.asarray(out_dense), np.asarray(out_ref), atol=1e-4
    )


def test_dense_grid_pointconv_grads_flow():
    """The fast path must stay differentiable (training uses it too)."""
    rng = np.random.default_rng(1)
    b, h, w, c = 1, 8, 8, 4
    n = h * w
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    raster = np.stack([xs, ys], -1).reshape(-1, 2).astype(np.float32)
    pos = jnp.asarray(raster[rng.permutation(n)][None])
    x = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)

    m = pd.PointConv(out_dim=8)
    vars_ = m.init(jax.random.PRNGKey(0), x, pos, (h, w))
    saved = pd.DENSE_GRID_POINTCONV
    try:
        pd.DENSE_GRID_POINTCONV = True
        g = jax.grad(
            lambda v, x: jnp.sum(m.apply(v, x, pos, (h, w)) ** 2), argnums=(0, 1)
        )(vars_, x)
    finally:
        pd.DENSE_GRID_POINTCONV = saved
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert any(float(jnp.abs(l).sum()) > 0 for l in leaves)
