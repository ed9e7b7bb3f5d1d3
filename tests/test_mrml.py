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


def test_maskformer_ml_end_to_end():
    """MaskFormerML meta-arch: MRML backbone + Up pixel decoder + metaloss
    in the train step (maskformer_model_ml.py:181-229)."""
    from autofocusformermod_tpu.config import get_cfg, add_maskformer2_config
    from autofocusformermod_tpu.models.registry import build_model
    from autofocusformermod_tpu.engine.optimizer import build_optimizer
    from autofocusformermod_tpu.parallel import TrainState, make_train_step

    cfg = get_cfg()
    add_maskformer2_config(cfg)
    cfg.MODEL.META_ARCHITECTURE = "MaskFormerML"
    cfg.MODEL.MRML.NUM_SCALES = 4
    cfg.MODEL.MRML.PATCH_SIZES = [32, 16, 8, 4]
    cfg.MODEL.MRML.EMBED_DIM = [32, 32, 32, 32]
    cfg.MODEL.MRML.DEPTHS = [1, 1, 1, 1]
    cfg.MODEL.MRML.NUM_HEADS = [2, 2, 2, 2]
    cfg.MODEL.MRML.MLP_RATIO = 1.0
    cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES = 5
    cfg.MODEL.SEM_SEG_HEAD.CONVS_DIM = 32
    cfg.MODEL.SEM_SEG_HEAD.MASK_DIM = 32
    cfg.MODEL.SEM_SEG_HEAD.PIXEL_DECODER_NAME = "MSDeformAttnPixelDecoderUp"
    cfg.MODEL.SEM_SEG_HEAD.IN_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.SEM_SEG_HEAD.DEFORMABLE_TRANSFORMER_ENCODER_IN_FEATURES = [
        "res3", "res4", "res5",
    ]
    cfg.MODEL.SEM_SEG_HEAD.TRANSFORMER_ENC_LAYERS = 1
    cfg.MODEL.MASK_FORMER.HIDDEN_DIM = 32
    cfg.MODEL.MASK_FORMER.NUM_OBJECT_QUERIES = 5
    cfg.MODEL.MASK_FORMER.NHEADS = 2
    cfg.MODEL.MASK_FORMER.DIM_FEEDFORWARD = 32
    cfg.MODEL.MASK_FORMER.DEC_LAYERS = 3

    model = build_model(cfg)
    rng = np.random.default_rng(0)
    b, H, W, t = 2, 128, 128, 3
    img = jnp.asarray(rng.uniform(0, 255, (b, H, W, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img, train=False)
    out = model.apply(variables, img, train=False)
    assert len(out["metaloss_preds"]) == 3
    assert out["pred_masks"].shape[:2] == (b, 5)
    # mask features came from the full finest grid (Up variant)
    assert out["pred_masks"].shape[-2:] == (32, 32)

    batch = {
        "image": img,
        "labels": jnp.asarray(rng.integers(0, 5, (b, t)), jnp.int32),
        "masks": jnp.asarray(rng.integers(0, 2, (b, t, H, W)), jnp.float32),
        "valid": jnp.ones((b, t), bool),
    }
    tx = build_optimizer(cfg, variables["params"])
    bs = variables.get("batch_stats", {})
    state = TrainState.create(variables["params"], bs, tx)
    step = make_train_step(
        model, 5, num_points=64, metaloss_weight=0.5, ml_min_patch_size=4,
        donate=False,
    )
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert "meta_loss" in metrics
    assert np.isfinite(float(metrics["meta_loss"]))
    assert np.isfinite(float(metrics["total_loss"]))
