"""MRML backbone + metaloss supervision tests."""

import numpy as np
import jax
import jax.numpy as jnp

from autofocusformermod_tpu.models.mrml import MixResMetaLoss, metaloss_l1


def test_mrml_forward_shapes():
    model = MixResMetaLoss(
        n_scales=3, patch_sizes=(16, 8, 4), embed_dims=(32, 32, 32),
        depths=(1, 1, 1), num_heads=(2, 2, 2), mlp_ratio=1.0,
    )
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 255, (1, 64, 64, 3)), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(v, x, train=False)
    # stage 0: 16 tokens scale0; split 4 -> keep 12 + 16 new scale1;
    # stage 1: split 4 of 16 -> keep 12 + 16 new scale2
    assert out["res4"].shape[1] == 12
    assert out["res3"].shape[1] == 12
    assert out["res2"].shape[1] == 16
    assert out["metaloss0"].shape == (1, 16)
    assert out["metaloss1"].shape == (1, 16)
    for k in ("res2", "res3", "res4"):
        assert np.isfinite(np.asarray(out[k])).all()


def test_metaloss_l1_targets_box_error():
    # error concentrated in top-left quarter of an 8x8 min-patch map
    err = np.zeros((1, 8, 8), np.float32)
    err[:, :4, :4] = 1.0
    pos = jnp.asarray([[[0, 0], [4, 4]]], jnp.float32)  # patch size 4
    pred = jnp.asarray([[1.0, 0.0]])
    loss = float(metaloss_l1(pred, pos, jnp.asarray(err), 4))
    assert loss < 1e-6  # predictions equal actual error rates (1.0, 0.0)
    pred_bad = jnp.asarray([[0.0, 1.0]])
    assert float(metaloss_l1(pred_bad, pos, jnp.asarray(err), 4)) > 0.9
