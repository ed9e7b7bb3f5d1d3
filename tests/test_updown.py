"""UpDownBackbone (2n-1-stage U-Net) and MaskFinerOracleTeacherBB tests."""

import numpy as np
import jax
import jax.numpy as jnp

from autofocusformermod_tpu.models.updown import UpDownBackbone, updown_from_config


def small_updown(n=3, oracle_ratio=0.5):
    # 2n-1 = 5 per-stage entries; tiny dims
    return UpDownBackbone(
        n_scales=n,
        names=("MixResViT", "MixResNeighbour", "MixResNeighbour",
               "MixResNeighbour", "MixResViT"),
        patch_sizes=(16, 8, 4, 8, 16),
        embed_dims=(32, 32, 32, 32, 32),
        depths=(1, 1, 1, 1, 1),
        num_heads=(2, 2, 2, 2, 2),
        mlp_ratios=(1.0,) * 5,
        cluster_sizes=(8,) * 5,
        nbhd_sizes=(16,) * 5,
        upscale_ratios=(0.0, 0.5, 0.5, 0.0, 0.0),
        split_ratios=(4,) * 5,
        drop_rates=(0.0,) * 5,
        attn_drop_rates=(0.0,) * 5,
        oracle_ratio=oracle_ratio,
    )


def test_updown_forward_with_oracle():
    model = small_updown()
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
    # stage-0 grid is 4x4=16 tokens (patch 16 on 64x64)
    assert out["res4"].shape[:2] == (1, 16)
    assert "res3" in out and "res2" in out
    # up-side channel widths come from the up-stage embed dims
    assert out["res4"].shape[2] == 32 and out["res3"].shape[2] == 32
    # supervision pairs cover the NEWEST scale segment only
    assert out["upsampling_mask_pred_0"].shape == (1, 16)
    n1 = out["upsampling_mask_pred_1"].shape[1]
    assert out["upsampling_mask_oracle_1"].shape == (1, n1)
    assert out["upsampling_mask_pos_1"].shape == (1, n1, 3)
    for k, val in out.items():
        if hasattr(val, "shape"):
            assert np.isfinite(np.asarray(val)).all(), k


def test_updown_from_config_builds_reference_lists():
    from autofocusformermod_tpu.config import add_maskformer2_config, get_cfg

    cfg = get_cfg()
    add_maskformer2_config(cfg)
    cfg.MODEL.MASK_FINER.NUM_RESOLUTION_SCALES = 4
    cfg.MODEL.MR.NAME = ["MixResViT"] + ["MixResNeighbour"] * 5 + ["MixResViT"]
    cfg.MODEL.MR.EMBED_DIM = [512, 256, 128, 64, 128, 256, 512]
    cfg.MODEL.MR.DEPTHS = [1, 1, 1, 4, 4, 16, 4]
    cfg.MODEL.MR.NUM_HEADS = [16, 8, 4, 2, 4, 8, 16]
    cfg.MODEL.MR.PATCH_SIZES = [32, 16, 8, 4, 8, 16, 32]
    cfg.MODEL.MR.MLP_RATIO = [3.0] * 7
    cfg.MODEL.MR.DROP_RATE = [0.0] * 7
    cfg.MODEL.MR.ATTN_DROP_RATE = [0.0] * 7
    cfg.MODEL.MR.UPSCALE_RATIO = [0.0, 0.85, 0.7, 0.6, 0.0, 0.0, 0.0]
    cfg.MODEL.MR.SPLIT_RATIO = [4] * 7
    cfg.MODEL.MR.CLUSTER_SIZE = [8] * 7
    cfg.MODEL.MR.NBHD_SIZE = [48] * 7
    m = updown_from_config(cfg)
    assert m.n_scales == 4 and len(m.names) == 7
    assert m.embed_dims == (512, 256, 128, 64, 128, 256, 512)


def test_maskfiner_ot_bb_forward():
    """MaskFinerOracleTeacherBB: UpDownBackbone + single final-stage head."""
    from autofocusformermod_tpu.config import add_maskformer2_config, get_cfg
    from autofocusformermod_tpu.models.registry import META_ARCH_REGISTRY

    cfg = get_cfg()
    add_maskformer2_config(cfg)
    n = 3
    cfg.MODEL.BACKBONE.NAME = "UpDownBackbone"
    cfg.MODEL.MASK_FINER.NUM_RESOLUTION_SCALES = n
    cfg.MODEL.MR.NAME = ["MixResViT", "MixResNeighbour", "MixResNeighbour",
                         "MixResNeighbour", "MixResViT"]
    cfg.MODEL.MR.EMBED_DIM = [32, 32, 32, 32, 32]
    cfg.MODEL.MR.DEPTHS = [1, 1, 1, 1, 1]
    cfg.MODEL.MR.NUM_HEADS = [2, 2, 2, 2, 2]
    cfg.MODEL.MR.PATCH_SIZES = [16, 8, 4, 8, 16]
    cfg.MODEL.MR.MLP_RATIO = [1.0] * 5
    cfg.MODEL.MR.DROP_RATE = [0.0] * 5
    cfg.MODEL.MR.ATTN_DROP_RATE = [0.0] * 5
    cfg.MODEL.MR.UPSCALE_RATIO = [0.0, 0.5, 0.5, 0.0, 0.0]
    cfg.MODEL.MR.SPLIT_RATIO = [4] * 5
    cfg.MODEL.MR.CLUSTER_SIZE = [8] * 5
    cfg.MODEL.MR.NBHD_SIZE = [16] * 5
    cfg.MODEL.MR_SEM_SEG_HEAD.NUM_CLASSES = 5
    cfg.MODEL.MR_SEM_SEG_HEAD.IN_FEATURES = ["res2", "res3", "res4"]
    cfg.MODEL.MR_SEM_SEG_HEAD.DEFORMABLE_TRANSFORMER_ENCODER_IN_FEATURES = [
        "res3", "res4"
    ]
    cfg.MODEL.MR_SEM_SEG_HEAD.CONVS_DIM = [32, 32, 32]
    cfg.MODEL.MR_SEM_SEG_HEAD.TRANSFORMER_ENC_LAYERS = [1, 1, 1]
    cfg.MODEL.MR_SEM_SEG_HEAD.NHEADS = [2, 2, 2]
    cfg.MODEL.MR_SEM_SEG_HEAD.MLP_RATIO = [1.0, 1.0, 1.0]
    cfg.MODEL.MR_SEM_SEG_HEAD.PIXEL_DECODER_NAME = [
        "ProjMaskFinerOracleTeacher", "ProjMaskFinerOracleTeacher",
        "MSDeformAttnPixelDecoderMaskFiner",
    ]
    cfg.MODEL.MASK_FINER.HIDDEN_DIM = [32, 32, 32]
    cfg.MODEL.MASK_FINER.MASK_DIM = [32, 32, 32]
    cfg.MODEL.MASK_FINER.NHEADS = [2, 2, 2]
    cfg.MODEL.MASK_FINER.DIM_FEEDFORWARD = [32, 32, 32]
    cfg.MODEL.MASK_FINER.DEC_LAYERS = [3, 3, 4]
    cfg.MODEL.MASK_FINER.DECODER_LEVELS = [1, 2, 2]
    cfg.MODEL.MASK_FINER.NUM_OBJECT_QUERIES = 5
    cfg.MODEL.MASK_FINER.ORACLE_TEACHER_RATIO = 0.5

    model = META_ARCH_REGISTRY.get("MaskFinerOracleTeacherBB")(cfg)
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
    assert out["pred_logits"].shape[:2] == (1, 5)
    assert out["pred_masks"].ndim == 4
    assert len(out["upsampling_preds"]) == n - 1
    assert len(out["upsampling_oracles"]) == n - 1
    for p, o in zip(out["upsampling_preds"], out["upsampling_oracles"]):
        assert p.shape == o.shape
    assert np.isfinite(np.asarray(out["pred_logits"])).all()
