"""Minimal end-to-end forward for the `-m smoke` gate: the smallest
MaskFormer that exercises config-build -> AFF backbone -> pixel decoder ->
transformer decoder -> criterion wiring in one CPU trace.  The exhaustive
e2e tests (shapes, inference modes, train steps) live in test_maskformer.py
/ test_train_step.py on the slow tier; this one exists so the < 2 min gate
still catches a broken import, registry, or shape contract anywhere on the
main path."""

import numpy as np
import jax
import jax.numpy as jnp

from autofocusformermod_tpu.config import add_maskformer2_config, get_cfg
from autofocusformermod_tpu.losses.criterion import set_criterion_downsample
from autofocusformermod_tpu.models import maskformer_from_config


def test_smoke_forward_and_loss():
    cfg = get_cfg()
    add_maskformer2_config(cfg)
    cfg.MODEL.AFF.EMBED_DIM = [8, 12, 16, 20]
    cfg.MODEL.AFF.DEPTHS = [1, 1, 1, 1]
    cfg.MODEL.AFF.NUM_HEADS = [2, 2, 2, 2]
    cfg.MODEL.AFF.NBHD_SIZE = [8, 8, 8, 8]
    cfg.MODEL.AFF.DROP_PATH_RATE = 0.0
    cfg.MODEL.SEM_SEG_HEAD.CONVS_DIM = 16
    cfg.MODEL.SEM_SEG_HEAD.MASK_DIM = 16
    cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES = 4
    cfg.MODEL.SEM_SEG_HEAD.TRANSFORMER_ENC_LAYERS = 1
    cfg.MODEL.MASK_FORMER.HIDDEN_DIM = 16
    cfg.MODEL.MASK_FORMER.NUM_OBJECT_QUERIES = 4
    cfg.MODEL.MASK_FORMER.NHEADS = 2
    cfg.MODEL.MASK_FORMER.DIM_FEEDFORWARD = 16
    cfg.MODEL.MASK_FORMER.DEC_LAYERS = 2
    cfg.TPU.USE_PALLAS = False
    model = maskformer_from_config(cfg)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 255, (1, 64, 64, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)

    nq = cfg.MODEL.MASK_FORMER.NUM_OBJECT_QUERIES
    nc = cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES
    assert out["pred_logits"].shape == (1, nq, nc + 1)
    assert out["pred_masks"].shape[:2] == (1, nq)
    assert len(out["aux_outputs"]) == cfg.MODEL.MASK_FORMER.DEC_LAYERS - 1
    assert bool(jnp.isfinite(out["pred_logits"]).all())
    assert bool(jnp.isfinite(out["pred_masks"]).all())

    t = 2
    masks = np.zeros((1, t, 64, 64), np.float32)
    masks[:, 0, :32] = 1.0
    masks[:, 1, 32:] = 1.0
    total, losses = set_criterion_downsample(
        jax.random.PRNGKey(0), out,
        {"labels": jnp.asarray(rng.integers(0, nc, (1, t)), jnp.int32),
         "masks": jnp.asarray(masks),
         "valid": jnp.ones((1, t), bool)},
        nc,
    )
    assert np.isfinite(float(total))
    assert "loss_ce" in losses and "loss_ce_0" in losses
