"""The jitted training step: forward -> Hungarian+criterion -> grad -> clip ->
AdamW update, data-parallel over the mesh via GSPMD.

Replaces the reference's detectron2 SimpleTrainer.run_step + DDP backward
(SURVEY.md section 3.1): one compiled program per step; gradient all-reduce is
inserted by XLA from the shardings (batch on ``data``, params replicated).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from ..losses.criterion import set_criterion
from ..models.oracle import upsampling_mse_loss
from .precision import amp_variables, f32_outputs


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, params, batch_stats, tx):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            tx=tx,
        )


def _device_image(batch) -> jnp.ndarray:
    """uint8 HWC host batches cast to float32 ON DEVICE (north star: the host
    never touches float pixels); float inputs pass through for compatibility
    with synthetic/test batches."""
    return batch["image"].astype(jnp.float32)


def _device_masks(batch) -> jnp.ndarray:
    """Target mask stack on device.  Semantic batches ship only the uint8
    sem_seg map + per-slot labels; the (b, t, H, W) binary stack is derived
    here (a broadcast equality) and gated by ``valid`` so padded label slots
    (0) cannot alias class 0.  Panoptic/instance batches ship uint8 masks."""
    if "masks" in batch:
        return batch["masks"].astype(jnp.float32)
    sem = batch["sem_seg_map"].astype(jnp.int32)           # (b, H, W)
    eq = sem[:, None] == batch["labels"][:, :, None, None]  # (b, t, H, W)
    return (eq & batch["valid"][:, :, None, None]).astype(jnp.float32)


def make_train_step(
    model,
    num_classes: int,
    *,
    eos_coef: float = 0.1,
    class_weight: float = 2.0,
    mask_weight: float = 5.0,
    dice_weight: float = 5.0,
    num_points: int = 12544,
    oversample_ratio: float = 3.0,
    importance_sample_ratio: float = 0.75,
    metaloss_weight: float = 0.0,
    ml_min_patch_size: int = 4,
    donate: bool = True,
    amp: bool = False,
) -> Callable:
    """Returns train_step(state, batch, key) -> (state, metrics).

    batch: {'image': (b, H, W, 3) float32 RGB,
            'labels': (b, t) int32, 'masks': (b, t, H, W) float32,
            'valid': (b, t) bool}
    """

    def loss_fn(params, batch_stats, batch, key):
        k_drop, k_crit = jax.random.split(key)
        # amp: fp32 master params cast to bf16 for the forward (grads arrive
        # fp32 through the cast); the meta-arch returns fp32 outputs, and
        # mutated batch_stats are restored to fp32 for the train state
        variables = amp_variables(
            {"params": params, "batch_stats": batch_stats}, enabled=amp
        )
        outputs, mutated = model.apply(
            variables,
            _device_image(batch),
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": k_drop},
        )
        targets = {
            "labels": batch["labels"],
            "masks": _device_masks(batch),
            "valid": batch["valid"],
        }
        total, losses = set_criterion(
            k_crit, outputs, targets, num_classes,
            eos_coef=eos_coef,
            class_weight=class_weight,
            mask_weight=mask_weight,
            dice_weight=dice_weight,
            num_points=num_points,
            oversample_ratio=oversample_ratio,
            importance_sample_ratio=importance_sample_ratio,
        )
        if metaloss_weight > 0 and "metaloss_preds" in outputs:
            from ..models.mrml import compute_meta_loss

            ml = compute_meta_loss(
                outputs, batch["labels"], _device_masks(batch), batch["valid"],
                ml_min_patch_size,
            )
            losses["meta_loss"] = ml
            total = total + metaloss_weight * ml
        new_bs = mutated.get("batch_stats", batch_stats)
        if amp:
            new_bs = f32_outputs(new_bs)
        return total, (losses, new_bs)

    def train_step(state: TrainState, batch, key) -> Tuple[TrainState, Dict]:
        (total, (losses, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, batch, key)
        updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {"total_loss": total, **losses}
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
        )
        return new_state, metrics

    donate_argnums = (0,) if donate else ()
    return jax.jit(train_step, donate_argnums=donate_argnums)


def make_maskfiner_train_step(
    model,
    num_classes: int,
    *,
    upsampling_weight: float = 10.0,
    needs_sem_seg_gt: bool = False,
    eos_coef: float = 0.1,
    class_weight: float = 2.0,
    mask_weight: float = 5.0,
    dice_weight: float = 5.0,
    num_points: int = 12544,
    oversample_ratio: float = 3.0,
    importance_sample_ratio: float = 0.75,
    donate: bool = True,
    amp: bool = False,
) -> Callable:
    """Train step for the MaskFiner family: deep-supervision criterion across
    all cascade stages plus (for oracle-teacher models) the upsampling-mask
    MSE against the GT-edge oracle (reference maskfiner_model.py:129-147,
    MODEL.MASK_FINER.UPSAMPLING_WEIGHT).

    batch additionally carries 'sem_seg' (b, H, W) when needs_sem_seg_gt."""

    def loss_fn(params, batch_stats, batch, key):
        k_drop, k_oracle, k_crit = jax.random.split(key, 3)
        variables = {"params": params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        variables = amp_variables(variables, enabled=amp)
        args = (_device_image(batch),)
        rngs = {"dropout": k_drop, "oracle": k_oracle}
        if needs_sem_seg_gt:
            args = args + (batch["sem_seg"],)
        outputs, mutated = model.apply(
            variables, *args, train=True, mutable=["batch_stats"], rngs=rngs,
        )
        targets = {
            "labels": batch["labels"],
            "masks": _device_masks(batch),
            "valid": batch["valid"],
        }
        total, losses = set_criterion(
            k_crit, outputs, targets, num_classes,
            eos_coef=eos_coef, class_weight=class_weight,
            mask_weight=mask_weight, dice_weight=dice_weight,
            num_points=num_points, oversample_ratio=oversample_ratio,
            importance_sample_ratio=importance_sample_ratio,
        )
        if "upsampling_preds" in outputs and outputs["upsampling_preds"]:
            l_up = upsampling_mse_loss(
                outputs["upsampling_preds"], outputs["upsampling_oracles"]
            )
            losses["loss_upsampling"] = l_up
            total = total + upsampling_weight * l_up
        bs = mutated.get("batch_stats", batch_stats)
        if amp:
            bs = f32_outputs(bs)
        return total, (losses, bs)

    def train_step(state: TrainState, batch, key) -> Tuple[TrainState, Dict]:
        (total, (losses, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, batch, key)
        updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {"total_loss": total, **losses}
        metrics["grad_norm"] = optax.global_norm(grads)
        return (
            state.replace(
                step=state.step + 1, params=new_params,
                batch_stats=new_bs, opt_state=new_opt,
            ),
            metrics,
        )

    donate_argnums = (0,) if donate else ()
    return jax.jit(train_step, donate_argnums=donate_argnums)
