"""UpDownBackbone forward test."""

import numpy as np
import jax
import jax.numpy as jnp

from autofocusformermod_tpu.models.updown import UpDownBackbone


def test_updown_forward_with_oracle():
    model = UpDownBackbone(
        n_scales=3, patch_sizes=(16, 8, 4), embed_dims=(32, 32, 32),
        depths=(1, 1, 1), num_heads=(2, 2, 2), mlp_ratio=1.0, nbhd_size=16,
        oracle_ratio=0.5,
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 255, (1, 64, 64, 3)), jnp.float32)
    gt = jnp.asarray(rng.integers(0, 5, (1, 64, 64)), jnp.int32)
    v = model.init(
        {"params": jax.random.PRNGKey(0), "oracle": jax.random.PRNGKey(1)},
        x, gt, True,
    )
    out = model.apply(
        v, x, gt, True,
        rngs={"oracle": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)},
    )
    assert out["res2"].shape == (1, 16, 32)
    assert out["res3"].shape == (1, 16, 32)
    assert out["res4"].shape == (1, 16, 32)
    assert out["upsampling_mask_pred_0"].shape == (1, 16)
    assert out["upsampling_mask_oracle_1"].shape == (1, 32)
    for k, val in out.items():
        if hasattr(val, "shape"):
            assert np.isfinite(np.asarray(val)).all(), k
