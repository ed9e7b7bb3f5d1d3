"""MixResLayer fused-path wiring parity.

The fused block-sparse attention path (ops/pallas/local_attn.py) is gated
into MixResLayer the same way as AFF's BasicLayer.  The Pallas kernel itself
is parity-tested on TPU (tests/test_pallas.py); here we verify the *wiring* —
that the ctx MixResLayer hands the fused path produces the same result as its
gather path — by routing `sfc_cluster_attention` to the backend-agnostic mask
formulation (`sfc_attention_reference`), which test_pallas.py pins against
both the gather composition and the TPU kernel.

Reference chain being modeled: mixres_neighbour.py cluster attention blocks
(same CLUSTEN qk/av + bias + blank-token softmax as aff.py:102-160).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_mixres_layer_fused_matches_gather(monkeypatch):
    import jax
    import jax.numpy as jnp

    from autofocusformermod_tpu.models.mixres import MixResLayer
    from autofocusformermod_tpu.ops import dispatch
    from autofocusformermod_tpu.ops.pallas import local_attn

    # pretend the fused kernel is available, but execute its XLA semantic
    # definition so the test runs on any backend
    monkeypatch.setattr(dispatch, "fused_attention_available", lambda: True)
    monkeypatch.setattr(
        local_attn,
        "sfc_cluster_attention",
        lambda q, k, v, pos, nc, w5, b5, blank_k, cluster_size:
            local_attn.sfc_attention_reference(
                q, k, v, pos, nc, w5, b5, blank_k, cluster_size
            ),
    )

    b, n, c = 2, 512, 64
    rng = np.random.default_rng(0)
    xy = jnp.asarray(rng.uniform(0, 32, (b, n, 2)), jnp.float32)
    pos = jnp.concatenate([jnp.zeros((b, n, 1)), xy], axis=-1)
    feat = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)

    def run(use_pallas):
        m = MixResLayer(
            dim=c, cluster_size=8, nbhd_size=48, depth=2, num_heads=4,
            mlp_ratio=2.0, use_pallas=use_pallas,
        )
        vs = m.init(jax.random.PRNGKey(2), pos, feat, 32, 32)
        return m, vs

    m_g, vs = run(False)
    m_f, vs_f = run(True)
    # identical parameter trees: the fused path recovers pos_embed weights via
    # probes instead of introducing new params
    assert jax.tree_util.tree_structure(vs) == jax.tree_util.tree_structure(vs_f)

    _, out_g = m_g.apply(vs, pos, feat, 32, 32)
    _, out_f = m_f.apply(vs, pos, feat, 32, 32)
    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(out_g), rtol=2e-4, atol=2e-4
    )


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
