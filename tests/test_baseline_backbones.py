"""Swin + ConvNeXtV2 baseline backbone shape tests."""

import numpy as np
import jax
import jax.numpy as jnp

from autofocusformermod_tpu.models.swin import SwinTransformer
from autofocusformermod_tpu.models.convnextv2 import ConvNeXtV2


def test_swin_shapes_and_shifted_windows():
    model = SwinTransformer(
        embed_dim=24, depths=(2, 2), num_heads=(2, 2), window_size=4,
        drop_path_rate=0.0, out_indices=(0, 1),
    )
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 64, 64, 3)), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(v, x)
    assert out["res2"].shape == (2, 256, 24)
    assert out["res3"].shape == (2, 64, 48)
    assert out["res2_pos"].shape == (2, 256, 2)
    assert np.isfinite(np.asarray(out["res3"])).all()
    # rel-pos table named for the no-weight-decay rule
    flat = jax.tree_util.tree_leaves_with_path(v["params"])
    assert any(
        "relative_position_bias_table" in jax.tree_util.keystr(p) for p, _ in flat
    )


def test_convnextv2_shapes():
    model = ConvNeXtV2(depths=(1, 1, 1, 1), dims=(16, 32, 48, 64))
    x = jnp.asarray(np.random.default_rng(1).normal(size=(1, 64, 64, 3)), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(v, x)
    assert out["res2"].shape == (1, 256, 16)
    assert out["res5"].shape == (1, 4, 64)
    assert out["res5_scale"].shape == (1, 4)
    assert np.isfinite(np.asarray(out["res2"])).all()


def test_grid_pixel_decoder_with_swin():
    from autofocusformermod_tpu.models.pixel_decoder_grid import (
        MSDeformAttnPixelDecoderGrid,
    )

    model = SwinTransformer(
        embed_dim=24, depths=(1, 1, 1, 1), num_heads=(2, 2, 2, 2), window_size=4,
        drop_path_rate=0.0,
    )
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 64, 64, 3)), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x)
    feats = model.apply(v, x)

    pd = MSDeformAttnPixelDecoderGrid(
        conv_dim=32, mask_dim=32, transformer_nheads=2,
        transformer_dim_feedforward=32, transformer_enc_layers=1,
    )
    vp = pd.init(jax.random.PRNGKey(1), feats)
    mf, mf_pos, t0, ms, poss, ms_shapes = pd.apply(vp, feats)
    assert mf.shape == (1, 256, 32)
    assert mf_pos.shape == (1, 256, 2)
    assert len(ms) == 3 and len(poss) == 3
    assert ms_shapes[0] == (2, 2)  # res5 grid of a 64x64 input
    assert np.isfinite(np.asarray(mf)).all()


def test_bilinear_sample_matches_point_sample():
    from autofocusformermod_tpu.models.pixel_decoder_grid import bilinear_sample
    from autofocusformermod_tpu.losses import point_sample

    rng = np.random.default_rng(3)
    v = jnp.asarray(rng.normal(size=(2, 7, 9, 1)), jnp.float32)
    loc = jnp.asarray(rng.uniform(0, 1, (2, 13, 2)), jnp.float32)
    a = np.asarray(bilinear_sample(v, loc))[..., 0]
    b = np.asarray(point_sample(v[..., 0], loc))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_registry_builds_instances_from_config():
    """Round-1 gap: these registrations returned classes or ignored cfg."""
    import flax.linen as nn

    from autofocusformermod_tpu.config import add_maskformer2_config, get_cfg
    from autofocusformermod_tpu.models.registry import BACKBONE_REGISTRY

    cfg = get_cfg()
    add_maskformer2_config(cfg)
    xattn = BACKBONE_REGISTRY.get("MixResNeighbourXAttn")(cfg, 1)
    assert isinstance(xattn, nn.Module) and xattn.cross_attend_image
    assert xattn.d_model == cfg.MODEL.MR.EMBED_DIM[1]
    cnx = BACKBONE_REGISTRY.get("ConvNeXtV2")(cfg, 0)
    assert isinstance(cnx, nn.Module)
    assert cnx.d_model == cfg.MODEL.MR.EMBED_DIM[0]
    vit = BACKBONE_REGISTRY.get("MixResViT")(cfg, 0)
    assert isinstance(vit, nn.Module) and vit.first_layer


def test_convnextv2_stage_forward():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from autofocusformermod_tpu.models.convnextv2 import ConvNeXtV2Stage

    m = ConvNeXtV2Stage(
        scale=0, n_scales=3, patch_size=16, min_patch_size=4,
        d_model=32, n_layers=1, first_layer=True, out_feature="res4",
    )
    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 255, (1, 64, 64, 3)), jnp.float32
    )
    v = m.init(jax.random.PRNGKey(0), x, None, None, None, ())
    outs, tps = m.apply(v, x, None, None, None, ())
    assert outs["res4"].shape == (1, 16, 32)
    assert outs["res4_pos"].shape == (1, 16, 2)
    assert tps == (16,)


def test_resnet50_maskformer_end_to_end():
    """R50 baseline configs (reference maskformer2_R50_*.yaml) build and run:
    the ResNet emits the on-grid point-cloud dict the pc pixel decoder needs."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from autofocusformermod_tpu.config import add_maskformer2_config, get_cfg
    from autofocusformermod_tpu.models.registry import build_model

    cfg = get_cfg()
    add_maskformer2_config(cfg)
    cfg.MODEL.BACKBONE.NAME = "build_resnet_backbone"
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES = 7
    cfg.MODEL.SEM_SEG_HEAD.CONVS_DIM = 32
    cfg.MODEL.SEM_SEG_HEAD.MASK_DIM = 32
    cfg.MODEL.SEM_SEG_HEAD.TRANSFORMER_ENC_LAYERS = 1
    cfg.MODEL.MASK_FORMER.HIDDEN_DIM = 32
    cfg.MODEL.MASK_FORMER.NUM_OBJECT_QUERIES = 5
    cfg.MODEL.MASK_FORMER.NHEADS = 2
    cfg.MODEL.MASK_FORMER.DIM_FEEDFORWARD = 32
    cfg.MODEL.MASK_FORMER.DEC_LAYERS = 4
    cfg.TPU.USE_PALLAS = False
    m = build_model(cfg)
    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 255, (1, 64, 64, 3)), jnp.float32
    )
    v = jax.jit(lambda: m.init(jax.random.PRNGKey(0), x, train=False))()
    out = m.apply(v, x, train=False)
    assert out["pred_logits"].shape == (1, 5, 8)
    assert out["pred_masks"].shape[:2] == (1, 5)
    assert np.isfinite(np.asarray(out["pred_logits"])).all()
