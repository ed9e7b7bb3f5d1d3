"""AFF backbone shape/sanity tests (tiny config to keep CPU compile fast)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from autofocusformermod_tpu.models.aff import AFF


@pytest.fixture(scope="module")
def tiny_aff_out():
    model = AFF(
        embed_dim=(16, 32, 48, 64),
        cluster_size=8,
        # nbhd < n for every downsample stage (global attn + downsample is
        # unsupported, matching the reference); stage 4 (n=4 <= 8) exercises
        # the global-attention fallback (aff.py:442-444)
        nbhd_size=(8, 8, 8, 8),
        depths=(1, 1, 1, 1),
        num_heads=(2, 2, 2, 2),
        drop_path_rate=0.0,
        use_pallas=False,
    )
    x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (2, 64, 64, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    return model, variables, out, x


def test_output_shapes(tiny_aff_out):
    _, _, out, _ = tiny_aff_out
    # 64x64 input -> canvas 16x16 -> n0=256; 25% keep per stage
    assert out["res2"].shape == (2, 256, 16)
    assert out["res3"].shape == (2, 64, 32)
    assert out["res4"].shape == (2, 16, 48)
    assert out["res5"].shape == (2, 4, 64)
    assert out["res2_pos"].shape == (2, 256, 2)
    assert out["res5_pos"].shape == (2, 4, 2)
    assert out["res2_spatial_shape"] == (16, 16)


def test_positions_valid_and_reserved_grid_survives(tiny_aff_out):
    _, _, out, _ = tiny_aff_out
    for res, stride in [("res2", 1), ("res3", 2), ("res4", 4), ("res5", 8)]:
        pos = np.asarray(out[f"{res}_pos"])
        assert pos.min() >= 0 and pos.max() < 16
    # reserve grids must survive each downsample: layer-1 reserves the
    # stride-8 grid (-> res4), layer-2 the stride-16 grid (-> res5)
    pos4 = np.asarray(out["res4_pos"]).astype(int)
    pos5 = np.asarray(out["res5_pos"]).astype(int)
    for b in range(pos4.shape[0]):
        assert {(0, 0), (8, 0), (0, 8), (8, 8)} <= {tuple(p) for p in pos4[b]}
        assert (0, 0) in {tuple(p) for p in pos5[b]}


def test_forward_is_deterministic_and_finite(tiny_aff_out):
    model, variables, out, x = tiny_aff_out
    out2 = model.apply(variables, x, train=False)
    for k in ("res2", "res5"):
        assert np.isfinite(np.asarray(out[k])).all()
        np.testing.assert_array_equal(np.asarray(out[k]), np.asarray(out2[k]))


def test_jit_and_grad(tiny_aff_out):
    model, variables, _, x = tiny_aff_out

    @jax.jit
    def loss_fn(params, batch_stats, x):
        out = model.apply(
            {"params": params, "batch_stats": batch_stats}, x, train=False
        )
        return sum(jnp.sum(out[f"res{i}"] ** 2) for i in range(2, 6))

    g = jax.grad(loss_fn)(variables["params"], variables["batch_stats"], x)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # gradient must reach the importance scorer (prob_net) through the
    # PointConv weights (the reference trains it the same indirect way)
    pn = g["layers_0"]["prob_net"]["kernel"]
    assert float(jnp.abs(pn).sum()) > 0
