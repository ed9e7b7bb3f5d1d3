"""Optimizer and LR schedule.

Rebuild of the reference's per-module hyperparameter groups
(train_net.py:254-334) on optax:

  - AdamW (betas/eps from SOLVER), weight decay 0.05 default
  - backbone params: lr x SOLVER.BACKBONE_MULTIPLIER
  - norm-layer params (LayerNorm/BatchNorm scale+bias): WEIGHT_DECAY_NORM (0)
  - embedding tables (query_feat/query_embed/level_embed): WEIGHT_DECAY_EMBED (0)
  - full-model grad-norm clip before the update (FullModelGradientClipping)
  - WarmupPolyLR schedule (power 0.9, constant ending)
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import optax
from flax import traverse_util


def _is_backbone(path: tuple) -> bool:
    return any("backbone" in p for p in path)


def _is_norm_param(path: tuple) -> bool:
    # flax norm params live under .../<norm name>/{scale,bias}; our norm
    # modules are all named with 'norm'/'bn'/'ln' prefixes or are LayerNorm_
    parent = path[-2].lower() if len(path) >= 2 else ""
    return (
        "norm" in parent
        or parent == "bn"
        or parent.startswith("layernorm")
        or parent.startswith("batchnorm")
        or parent.startswith("groupnorm")
    )


def _is_embed_param(path: tuple) -> bool:
    # nn.Embed parameter leaf is named 'embedding'
    return path[-1] == "embedding"


def _no_decay_table(path: tuple) -> bool:
    leaf = path[-1]
    return "relative_position_bias_table" in leaf or "absolute_pos_embed" in leaf


def make_label_fn():
    """Label each param leaf with its hyperparameter group."""

    def label(params):
        flat = traverse_util.flatten_dict(params)
        labels = {}
        for path in flat:
            backbone = _is_backbone(path)
            if _is_embed_param(path):
                group = "embed"
            elif _is_norm_param(path) or _no_decay_table(path):
                group = "norm"
            else:
                group = "default"
            labels[path] = ("backbone_" + group) if backbone else group
        return traverse_util.unflatten_dict(labels)

    return label


def warmup_poly_schedule(
    base_lr: float,
    max_iter: int,
    warmup_factor: float = 1.0,
    warmup_iters: int = 0,
    power: float = 0.9,
    constant_ending: float = 0.0,
) -> optax.Schedule:
    """detectron2 WarmupPolyLR (train_net.py:246-252 selects it)."""

    def schedule(step):
        step_f = jnp.asarray(step, jnp.float32)
        warm = jnp.where(
            step_f < warmup_iters,
            warmup_factor * (1 - step_f / jnp.maximum(warmup_iters, 1))
            + step_f / jnp.maximum(warmup_iters, 1),
            1.0,
        )
        poly = jnp.maximum(
            (1.0 - step_f / max_iter) ** power, constant_ending
        )
        return base_lr * warm * poly

    return schedule


def build_optimizer(cfg, params) -> optax.GradientTransformation:
    """AdamW with reference param groups + full-model grad clipping."""
    base_lr = cfg.SOLVER.BASE_LR
    wd = cfg.SOLVER.WEIGHT_DECAY
    wd_norm = cfg.SOLVER.WEIGHT_DECAY_NORM
    wd_embed = cfg.SOLVER.WEIGHT_DECAY_EMBED
    betas = cfg.SOLVER.BETAS
    eps = cfg.SOLVER.EPSILON
    mult = cfg.SOLVER.BACKBONE_MULTIPLIER

    sched = warmup_poly_schedule(
        1.0,  # scale factor; base lr applied per group
        cfg.SOLVER.MAX_ITER,
        cfg.SOLVER.WARMUP_FACTOR,
        cfg.SOLVER.WARMUP_ITERS,
        cfg.SOLVER.POLY_LR_POWER,
        cfg.SOLVER.POLY_LR_CONSTANT_ENDING,
    )

    def adamw(lr_mult: float, weight_decay: float):
        return optax.chain(
            optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps),
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_schedule(sched),
            optax.scale(-base_lr * lr_mult),
        )

    tx = optax.multi_transform(
        {
            "default": adamw(1.0, wd),
            "norm": adamw(1.0, wd_norm),
            "embed": adamw(1.0, wd_embed),
            "backbone_default": adamw(mult, wd),
            "backbone_norm": adamw(mult, wd_norm),
            "backbone_embed": adamw(mult, wd_embed),
        },
        make_label_fn()(params),
    )

    if (
        cfg.SOLVER.CLIP_GRADIENTS.ENABLED
        and cfg.SOLVER.CLIP_GRADIENTS.CLIP_TYPE == "full_model"
        and cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE > 0
    ):
        tx = optax.chain(
            optax.clip_by_global_norm(cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE), tx
        )
    return tx
