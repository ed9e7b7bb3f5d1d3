"""Meta-architecture variants beyond MaskFormer/MaskFiner.

- MaskFormerSwin (reference maskformer_model_swin.py): MaskFormer with the
  grid Swin backbone + grid deformable pixel decoder; the shared
  transformer decoder consumes the grid as an on-grid point cloud.
- MaskFinerOracleTeacher (reference maskfiner_oracle_teacher_model.py): the
  MaskFiner cascade where the inter-stage upsampling mask is replaced by the
  GT-edge oracle with probability ORACLE_TEACHER_RATIO during training
  (:252-258) and the predicted masks are supervised against the oracle with
  MSE (:260,286 + criterion_mixed_oracle.py:300-344).  The Oracle (always-
  oracle) and BB/SW backbone variants are the ratio=1.0 / backbone-swap
  configurations of the same module.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from .maskfiner import MaskPredictor, maskfiner_from_config
from .maskformer import MaskFormer, MaskFormerHead
from .oracle import gt_edge_map, mix_teacher_mask, oracle_upsampling_mask
from .pixel_decoder_grid import MSDeformAttnPixelDecoderGrid
from .swin import swin_from_config
from .transformer_decoder import (
    MultiScaleMaskedTransformerDecoder,
    transformer_decoder_from_config,
)


class GridHead(nn.Module):
    """MaskFormerHead over the grid pixel decoder (same predictor)."""

    pixel_decoder: MSDeformAttnPixelDecoderGrid
    predictor: MultiScaleMaskedTransformerDecoder

    @nn.compact
    def __call__(self, features: Dict, deterministic: bool = True) -> Dict:
        mask_features, mf_pos, _, ms_feats, ms_poss, ms_shapes = (
            self.pixel_decoder(features, deterministic)
        )
        mask_size = features["res2_spatial_shape"]
        return self.predictor(
            ms_feats, ms_poss, mask_features, mf_pos, mask_size, deterministic,
            level_shapes=ms_shapes,
        )


def maskformer_swin_from_config(cfg) -> MaskFormer:
    """MaskFormerSwin: Swin + grid pixel decoder + shared mask decoder."""
    backbone = swin_from_config(cfg)
    pixel_decoder = MSDeformAttnPixelDecoderGrid(
        conv_dim=cfg.MODEL.SEM_SEG_HEAD.CONVS_DIM,
        mask_dim=cfg.MODEL.SEM_SEG_HEAD.MASK_DIM,
        transformer_nheads=cfg.MODEL.MASK_FORMER.NHEADS,
        transformer_enc_layers=cfg.MODEL.SEM_SEG_HEAD.TRANSFORMER_ENC_LAYERS,
    )
    predictor = transformer_decoder_from_config(cfg, cfg.MODEL.SEM_SEG_HEAD.CONVS_DIM)
    head = GridHead(pixel_decoder=pixel_decoder, predictor=predictor)
    return MaskFormer(
        backbone=backbone,
        head=head,
        pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
        pixel_std=tuple(cfg.MODEL.PIXEL_STD),
    )


class MaskFinerOracleTeacher(nn.Module):
    """MaskFiner cascade with oracle-teacher mixing of the inter-stage
    upsampling masks and pred/oracle pairs exposed for MSE supervision."""

    mask_predictors: Sequence[MaskPredictor]
    patch_sizes: Sequence[int]
    min_patch_size: int
    oracle_teacher_ratio: float = 0.5
    ignore_label: int = 255
    pixel_mean: Sequence[float] = (123.675, 116.28, 103.53)
    pixel_std: Sequence[float] = (58.395, 57.12, 57.375)
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images, sem_seg_gt=None, train: bool = False) -> Dict:
        images = images.astype(jnp.float32)  # uint8 host batches cast on device
        x = (images - jnp.asarray(self.pixel_mean, images.dtype)) / jnp.asarray(
            self.pixel_std, images.dtype
        )
        x = x.astype(self.compute_dtype)
        edges = (
            gt_edge_map(sem_seg_gt, self.ignore_label)
            if sem_seg_gt is not None
            else None
        )
        features = features_pos = upsampling_mask = None
        tokens_per_scale = None
        aux = ()
        preds, oracles = [], []
        outs = None
        for l_idx, predictor in enumerate(self.mask_predictors):
            outs, features, features_pos, upsampling_mask, seg_sizes, _ = predictor(
                x, features, features_pos, upsampling_mask, tokens_per_scale, train
            )
            tokens_per_scale = seg_sizes
            aux = aux + tuple(outs["aux_outputs"])
            if l_idx < len(self.mask_predictors) - 1 and edges is not None:
                oracle = oracle_upsampling_mask(
                    edges, features_pos[:, :, 1:], features_pos[:, :, 0],
                    self.patch_sizes, self.min_patch_size,
                )
                preds.append(upsampling_mask)
                oracles.append(oracle)
                if train and self.oracle_teacher_ratio > 0:
                    key = self.make_rng("oracle")
                    upsampling_mask = mix_teacher_mask(
                        key, upsampling_mask, oracle, self.oracle_teacher_ratio
                    )
        ret = {
            "pred_logits": outs["pred_logits"],
            "pred_masks": outs["pred_masks"],
            "aux_outputs": aux,
            "upsampling_preds": tuple(preds),
            "upsampling_oracles": tuple(oracles),
        }
        if self.compute_dtype != jnp.float32:
            from ..parallel.precision import f32_outputs

            ret = f32_outputs(ret)
        return ret


def maskfiner_oracle_teacher_from_config(cfg) -> MaskFinerOracleTeacher:
    base = maskfiner_from_config(cfg)
    n_scales = cfg.MODEL.MASK_FINER.NUM_RESOLUTION_SCALES
    return MaskFinerOracleTeacher(
        mask_predictors=base.mask_predictors,
        patch_sizes=tuple(cfg.MODEL.MR.PATCH_SIZES),
        min_patch_size=cfg.MODEL.MR.PATCH_SIZES[n_scales - 1],
        oracle_teacher_ratio=cfg.MODEL.MASK_FINER.ORACLE_TEACHER_RATIO,
        ignore_label=cfg.MODEL.MR_SEM_SEG_HEAD.IGNORE_VALUE,
        pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
        pixel_std=tuple(cfg.MODEL.PIXEL_STD),
        compute_dtype=jnp.bfloat16 if cfg.SOLVER.AMP.ENABLED else jnp.float32,
    )


def maskfiner_oracle_from_config(cfg) -> MaskFinerOracleTeacher:
    """MaskFinerOracle: always use the oracle mask (teacher ratio 1)."""
    return maskfiner_oracle_teacher_from_config(cfg).replace(
        oracle_teacher_ratio=1.0
    )


class MaskFinerOracleTeacherBB(nn.Module):
    """Backbone-based oracle-teacher model (reference
    maskfiner_oracle_teacher_model_bb.py): ONE composite backbone
    (UpDownBackbone — all 2n-1 MixRes stages inside, producing res2..res5 and
    the upsampling pred/oracle supervision pairs) followed by a single
    final-stage head (MaskFinerOTHead = final-index pixel decoder + final
    transformer decoder, reference mask_finer_ot_head.py:88-112).

    The SW variant (maskfiner_oracle_teacher_model_sw.py:207-292) is the
    same module with sliding-window evaluation (TEST.SW_STRIDE/SW_CROP_SIZE,
    count-normalized stitching) applied by the engine's sem-seg eval loop
    (engine/train.py Trainer._eval_sem_seg via
    models/inference.sliding_window_semantic_scores)."""

    backbone: nn.Module
    pixel_decoder: nn.Module
    mask_decoder: nn.Module
    n_scales: int = 4
    pixel_mean: Sequence[float] = (123.675, 116.28, 103.53)
    pixel_std: Sequence[float] = (58.395, 57.12, 57.375)
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images, sem_seg_gt=None, train: bool = False) -> Dict:
        images = images.astype(jnp.float32)  # uint8 host batches cast on device
        x = (images - jnp.asarray(self.pixel_mean, images.dtype)) / jnp.asarray(
            self.pixel_std, images.dtype
        )
        x = x.astype(self.compute_dtype)
        feats = self.backbone(x, sem_seg_gt, train=train)
        (mask_features, mf_pos, ms_feats, ms_poss, ms_scales, finest,
         input_shapes) = self.pixel_decoder(feats, deterministic=not train)
        predictions, _ = self.mask_decoder(
            ms_feats, ms_poss, mask_features, mf_pos, finest, input_shapes,
            deterministic=not train,
        )
        n_up = self.n_scales - 1
        preds = tuple(feats[f"upsampling_mask_pred_{i}"] for i in range(n_up))
        oracles = (
            tuple(feats[f"upsampling_mask_oracle_{i}"] for i in range(n_up))
            if sem_seg_gt is not None
            else ()
        )
        ret = {
            "pred_logits": predictions["pred_logits"],
            "pred_masks": predictions["pred_masks"],
            "aux_outputs": tuple(predictions["aux_outputs"]),
            "upsampling_preds": preds,
            "upsampling_oracles": oracles,
        }
        if self.compute_dtype != jnp.float32:
            from ..parallel.precision import f32_outputs

            ret = f32_outputs(ret)
        return ret


def maskfiner_oracle_teacher_bb_from_config(cfg) -> MaskFinerOracleTeacherBB:
    """MaskFinerOracleTeacherBB/SW from config: composite backbone via
    BACKBONE.NAME (UpDownBackbone for every reference updown config) + the
    final-index pixel/mask decoders (mask_finer_ot_head.py from_config)."""
    from .maskfiner import build_stage_mask_decoder, build_stage_pixel_decoder
    from .registry import BACKBONE_REGISTRY

    backbone = BACKBONE_REGISTRY.get(cfg.MODEL.BACKBONE.NAME)(cfg)
    n_scales = cfg.MODEL.MASK_FINER.NUM_RESOLUTION_SCALES
    final = n_scales - 1
    return MaskFinerOracleTeacherBB(
        backbone=backbone,
        pixel_decoder=build_stage_pixel_decoder(
            cfg, final, final=True, ot_predictor=False
        ),
        mask_decoder=build_stage_mask_decoder(cfg, final, final=True),
        n_scales=n_scales,
        pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
        pixel_std=tuple(cfg.MODEL.PIXEL_STD),
        compute_dtype=jnp.bfloat16 if cfg.SOLVER.AMP.ENABLED else jnp.float32,
    )
