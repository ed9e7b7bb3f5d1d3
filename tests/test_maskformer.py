"""End-to-end MaskFormer forward test on a tiny config (CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from autofocusformermod_tpu.config import get_cfg, add_maskformer2_config
from autofocusformermod_tpu.models import maskformer_from_config, semantic_inference, upsample_masks


def tiny_cfg():
    cfg = get_cfg()
    add_maskformer2_config(cfg)
    cfg.MODEL.AFF.EMBED_DIM = [16, 24, 32, 40]
    cfg.MODEL.AFF.DEPTHS = [1, 1, 1, 1]
    cfg.MODEL.AFF.NUM_HEADS = [2, 2, 2, 2]
    cfg.MODEL.AFF.NBHD_SIZE = [8, 8, 8, 8]
    cfg.MODEL.AFF.DROP_PATH_RATE = 0.0
    cfg.MODEL.SEM_SEG_HEAD.CONVS_DIM = 32
    cfg.MODEL.SEM_SEG_HEAD.MASK_DIM = 32
    cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES = 7
    cfg.MODEL.SEM_SEG_HEAD.TRANSFORMER_ENC_LAYERS = 1
    cfg.MODEL.MASK_FORMER.HIDDEN_DIM = 32
    cfg.MODEL.MASK_FORMER.NUM_OBJECT_QUERIES = 5
    cfg.MODEL.MASK_FORMER.NHEADS = 2
    cfg.MODEL.MASK_FORMER.DIM_FEEDFORWARD = 32
    cfg.MODEL.MASK_FORMER.DEC_LAYERS = 4  # 3 decoder rounds
    cfg.TPU.USE_PALLAS = False
    return cfg


@pytest.fixture(scope="module")
def model_and_out():
    cfg = tiny_cfg()
    model = maskformer_from_config(cfg)
    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 255, (2, 64, 64, 3)), jnp.float32
    )
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    return cfg, model, variables, x, out


def test_output_structure(model_and_out):
    cfg, model, variables, x, out = model_and_out
    q = cfg.MODEL.MASK_FORMER.NUM_OBJECT_QUERIES
    nc = cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES
    assert out["pred_logits"].shape == (2, q, nc + 1)
    # masks rasterized on the stride-4 canvas (64/4 = 16)
    assert out["pred_masks"].shape == (2, q, 16, 16)
    assert len(out["aux_outputs"]) == cfg.MODEL.MASK_FORMER.DEC_LAYERS - 1
    for aux in out["aux_outputs"]:
        assert aux["pred_logits"].shape == (2, q, nc + 1)
        assert aux["pred_masks"].shape == (2, q, 16, 16)
    assert np.isfinite(np.asarray(out["pred_masks"])).all()
    assert np.isfinite(np.asarray(out["pred_logits"])).all()


def test_semantic_inference(model_and_out):
    cfg, model, variables, x, out = model_and_out
    up = upsample_masks(out["pred_masks"], (64, 64))
    assert up.shape == (2, cfg.MODEL.MASK_FORMER.NUM_OBJECT_QUERIES, 64, 64)
    sem = semantic_inference(out["pred_logits"][0], up[0])
    assert sem.shape == (cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES, 64, 64)
    s = np.asarray(sem)
    assert np.isfinite(s).all() and s.min() >= 0


def test_jit_forward(model_and_out):
    cfg, model, variables, x, out = model_and_out
    jit_apply = jax.jit(lambda v, x: model.apply(v, x, train=False))
    out2 = jit_apply(variables, x)
    np.testing.assert_allclose(
        np.asarray(out2["pred_logits"]), np.asarray(out["pred_logits"]),
        rtol=2e-4, atol=2e-4,
    )
