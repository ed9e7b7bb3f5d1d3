"""MaskFiner — cascaded mixed-resolution mask prediction.

TPU-native rebuild of the Eiphodos research stack: per-cascade-stage
(backbone -> pixel decoder -> mask decoder) bundles threaded with
(features, features_pos, upsampling_mask) between stages
(reference maskfiner_model.py:175-227, meta_arch/mask_predictor.py:79-106,
msdeformattn_pc_maskfiner.py, maskfiner_transformer_decoder.py).

The per-stage token sets are scale-segmented with static counts
(models/mixres.py), so every reference ``torch.where(scale == s)`` partition
is a static slice here.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from ..geometry.knn import knn
from ..geometry.shepard import upsample_feature_shepard
from ..geometry.rasterize import point2img
from .layers import MLP, position_embedding_sine
from .mixres import MixResNeighbour, MixResViT
from .pixel_decoder import (
    MSDeformAttnEncoderLayerPc,
    PointConv,
    pack_neighbor_table,
    scale_pos,
)
from .transformer_decoder import (
    CrossAttentionLayer,
    FFNLayer,
    SelfAttentionLayer,
)


def fix_pos_no_bias(pos: jnp.ndarray, current_ss, finest_ss) -> jnp.ndarray:
    """Center coarse-scale token positions within their footprint on the
    finest grid (msdeformattn_pc_maskfiner.py:28-37)."""
    sh = (finest_ss[0] / current_ss[0]) / 2 - 0.5
    sw = (finest_ss[1] / current_ss[1]) / 2 - 0.5
    return pos + jnp.asarray([sw, sh], pos.dtype)


class MSDeformAttnPixelDecoderMaskFiner(nn.Module):
    """Per-cascade-stage pixel decoder (msdeformattn_pc_maskfiner.py:512-602):
    positions unified onto the min-patch canvas via fix_pos_no_bias, mask
    features = concat of ALL levels; returns the 7-tuple."""

    in_features: Sequence[str]                # e.g. ("res4", "res5")
    transformer_in_features: Sequence[str]    # e.g. ("res4", "res5")
    conv_dim: int = 256
    mask_dim: int = 256
    transformer_nheads: int = 8
    transformer_dim_feedforward: int = 1024
    transformer_enc_layers: int = 6
    transformer_dropout: float = 0.0
    n_points: int = 4
    shepard_power: float = 3.0
    shepard_power_learnable: bool = True
    maskformer_num_feature_levels: int = 3

    @nn.compact
    def __call__(self, features: Dict, deterministic: bool = True):
        min_ss = features["min_spatial_shape"]
        b = features[self.in_features[0]].shape[0]
        num_levels = len(self.transformer_in_features)

        ys, xs = np.meshgrid(np.arange(min_ss[0]), np.arange(min_ss[1]), indexing="ij")
        grid_pos = jnp.broadcast_to(
            jnp.asarray(np.stack([xs, ys], 2).reshape(1, -1, 2), jnp.float32),
            (b, min_ss[0] * min_ss[1], 2),
        )

        srcs, poss, scaless, fixed_poss, pos_embed, nb_packed = [], [], [], [], [], []
        # coarse -> fine (reversed feature names: res5 first)
        for idx, f in enumerate(self.transformer_in_features[::-1]):
            x = features[f].astype(jnp.float32)
            pos = features[f + "_pos"].astype(jnp.float32)
            ss = features[f + "_spatial_shape"]
            xp = nn.Dense(self.conv_dim, name=f"input_proj_{idx}_dense")(x)
            xp = nn.LayerNorm(name=f"input_proj_{idx}_norm")(xp)
            srcs.append(xp)
            poss.append(pos)
            scaless.append(features[f + "_scale"].astype(jnp.float32))
            fixed = fix_pos_no_bias(pos, ss, min_ss)
            fixed_poss.append(fixed)
            pos_embed.append(position_embedding_sine(fixed, self.conv_dim // 2))
            nb_packed.append(pack_neighbor_table(knn(grid_pos, fixed, 4), fixed))

        level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0), (num_levels, self.conv_dim)
        )
        lvl_pos = [pe + level_embed[i][None, None] for i, pe in enumerate(pos_embed)]

        # all levels share the min-patch canvas
        span_shapes = [min_ss] * num_levels + [min_ss]
        out = srcs
        for li in range(self.transformer_enc_layers):
            out = MSDeformAttnEncoderLayerPc(
                d_model=self.conv_dim,
                d_ffn=self.transformer_dim_feedforward,
                dropout=self.transformer_dropout,
                n_levels=num_levels,
                n_heads=self.transformer_nheads,
                n_points=self.n_points,
                shepard_power=self.shepard_power,
                shepard_power_learnable=self.shepard_power_learnable,
                name=f"encoder_layer_{li}",
            )(out, fixed_poss, span_shapes, lvl_pos, nb_packed, deterministic)
        out = list(out)

        # extra FPN levels (only the last cascade stage has any)
        num_fpn = len(self.in_features) - len(self.transformer_in_features)
        for idx, f in enumerate(self.in_features[:num_fpn][::-1]):
            x = features[f].astype(jnp.float32)
            pos = features[f + "_pos"].astype(jnp.float32)
            ss = features[f + "_spatial_shape"]
            poss.append(pos)
            scaless.append(features[f + "_scale"].astype(jnp.float32))
            cur_fpn = nn.Dense(self.conv_dim, name=f"adapter_{idx + 1}_dense")(x)
            cur_fpn = nn.LayerNorm(name=f"adapter_{idx + 1}_norm")(cur_fpn)
            fixed = fix_pos_no_bias(pos, ss, min_ss)
            y = cur_fpn + upsample_feature_shepard(fixed, fixed_poss[-1], out[-1])
            y = PointConv(self.conv_dim, name=f"layer_{idx + 1}_pointconv")(y, fixed)
            y = nn.LayerNorm(name=f"layer_{idx + 1}_norm")(y)
            y = nn.relu(y)
            fixed_poss.append(fixed)
            out.append(y)

        mf = jnp.concatenate(out, axis=1)
        mf_pos = jnp.concatenate(fixed_poss, axis=1)
        mask_features = nn.Dense(self.mask_dim, name="mask_features")(mf)
        finest_input_shape = min_ss
        input_shapes = [features[f + "_spatial_shape"] for f in self.in_features[::-1]]
        return (
            mask_features, mf_pos, out, poss, scaless, finest_input_shape,
            input_shapes,
        )


def gini_disagreement(outputs_mask: jnp.ndarray, outputs_class: jnp.ndarray) -> jnp.ndarray:
    """Gini impurity of per-class sigmoid mask sums — the token-level
    disagreement that drives next-stage splitting
    (maskfiner_transformer_decoder.py:598-624), vectorized over the classes
    actually predicted by the queries.
    outputs_mask: (b, q, n); outputs_class: (b, q, nc+1) -> (b, n)."""
    b, q, n = outputs_mask.shape
    ncp1 = outputs_class.shape[-1]
    cls_i = jnp.argmax(outputs_class, axis=-1)                 # (b, q)
    onehot = jax.nn.one_hot(cls_i, ncp1, dtype=outputs_mask.dtype)  # (b, q, nc+1)
    # per-class summed mask logits -> sigmoid (reference sums logits of the
    # queries voting for each class)
    per_class = jnp.einsum("bqn,bqc->bcn", outputs_mask, onehot)
    present = jnp.max(onehot, axis=1) > 0                       # (b, nc+1)
    x = jax.nn.sigmoid(per_class)                               # (b, nc+1, n)

    pm = present.astype(x.dtype)[:, :, None]
    cnt = jnp.maximum(jnp.sum(pm, axis=1), 1.0)                 # (b, 1)
    mean = jnp.sum(x * pm, axis=1) / cnt                        # (b, n)
    diff = jnp.abs(x[:, :, None, :] - x[:, None, :, :])         # (b, c, c, n)
    pair_m = pm[:, :, None, :] * pm[:, None, :, :]
    mad = jnp.sum(diff * pair_m, axis=(1, 2)) / jnp.maximum(cnt * cnt, 1.0)
    return 0.5 * mad / jnp.maximum(mean, 1e-6)


class MultiScaleMaskFinerTransformerDecoder(nn.Module):
    """Per-stage mask decoder (maskfiner_transformer_decoder.py:430-654):
    masked cross-attention over the stage's levels, predictions rasterized on
    the finest level's grid, disagreement mask emitted for the next stage."""

    in_channels: int
    num_classes: int
    hidden_dim: int = 256
    num_queries: int = 100
    nheads: int = 8
    dim_feedforward: int = 2048
    dec_layers: int = 9
    pre_norm: bool = False
    mask_dim: int = 256
    enforce_input_project: bool = False
    num_feature_levels: int = 3
    final_layer: bool = False

    @nn.compact
    def __call__(self, x: List, pos: List, mask_features, mf_pos,
                 finest_input_shape, input_shapes, deterministic: bool = True):
        finest_feat_shape = input_shapes[-1]
        nl = self.num_feature_levels
        x = x[:nl]
        pos = pos[:nl]
        shapes = input_shapes[:nl]
        b = x[0].shape[0]

        masked_attn = not (
            len(pos) == 1 and pos[0].shape == mf_pos.shape
        )

        mf_pos_scaled = scale_pos(mf_pos, finest_input_shape, finest_feat_shape)
        poss_scaled = [
            scale_pos(fix_pos_no_bias(p, s, finest_input_shape),
                      finest_input_shape, finest_feat_shape)
            for p, s in zip(pos, shapes)
        ]
        ys, xs = np.meshgrid(
            np.arange(finest_feat_shape[0]), np.arange(finest_feat_shape[1]),
            indexing="ij",
        )
        finest_pos = jnp.broadcast_to(
            jnp.asarray(np.stack([xs, ys], 2).reshape(1, -1, 2), jnp.float32),
            (b, finest_feat_shape[0] * finest_feat_shape[1], 2),
        )

        query_feat = nn.Embed(self.num_queries, self.hidden_dim, name="query_feat")
        query_embed = nn.Embed(self.num_queries, self.hidden_dim, name="query_embed")
        level_embed = nn.Embed(nl, self.hidden_dim, name="level_embed")
        decoder_norm = nn.LayerNorm(name="decoder_norm")
        class_embed = nn.Dense(self.num_classes + 1, name="class_embed")
        mask_embed = MLP(self.hidden_dim, self.mask_dim, 3, name="mask_embed")

        src, pos_emb = [], []
        for i in range(nl):
            pos_emb.append(position_embedding_sine(poss_scaled[i], self.hidden_dim // 2))
            s = x[i]
            if self.in_channels != self.hidden_dim or self.enforce_input_project:
                s = nn.Dense(self.hidden_dim, name=f"input_proj_{i}")(s)
            src.append(s + level_embed.embedding[i][None, None, :])

        output = jnp.broadcast_to(
            query_feat.embedding[None], (b, self.num_queries, self.hidden_dim)
        )
        qe = jnp.broadcast_to(
            query_embed.embedding[None], (b, self.num_queries, self.hidden_dim)
        )

        def prediction_heads(output, target_pos):
            dec = decoder_norm(output)
            ocls = class_embed(dec)
            memb = mask_embed(dec)
            omask = jnp.einsum("bqc,bnc->bqn", memb, mask_features)
            if masked_attn:
                am = upsample_feature_shepard(
                    target_pos, mf_pos_scaled, omask.transpose(0, 2, 1)
                ).transpose(0, 2, 1)
                am = jax.lax.stop_gradient(jax.nn.sigmoid(am) < 0.5)
                am = jnp.broadcast_to(
                    am[:, None], (b, self.nheads, am.shape[1], am.shape[2])
                )
            else:
                am = None
            return ocls, omask, am

        def rasterize(pred_mask):
            up = upsample_feature_shepard(
                finest_pos, mf_pos_scaled, pred_mask.transpose(0, 2, 1)
            ).transpose(0, 2, 1)
            return point2img(up, finest_pos, finest_feat_shape)

        predictions_class, predictions_mask = [], []
        ocls, pred_mask, attn_mask = prediction_heads(output, poss_scaled[0])
        predictions_class.append(ocls)
        predictions_mask.append(rasterize(pred_mask))

        for i in range(self.dec_layers):
            li = i % nl
            if attn_mask is not None:
                full = jnp.all(attn_mask, axis=-1, keepdims=True)
                attn_mask = jnp.logical_and(attn_mask, jnp.logical_not(full))
            output = CrossAttentionLayer(
                self.hidden_dim, self.nheads, 0.0, self.pre_norm, name=f"cross_{i}"
            )(output, src[li], attn_mask, pos_emb[li], qe, deterministic)
            output = SelfAttentionLayer(
                self.hidden_dim, self.nheads, 0.0, self.pre_norm, name=f"self_{i}"
            )(output, qe, deterministic)
            output = FFNLayer(
                self.hidden_dim, self.dim_feedforward, 0.0, self.pre_norm,
                name=f"ffn_{i}",
            )(output, deterministic)

            ocls, pred_mask, attn_mask = prediction_heads(
                output, poss_scaled[(i + 1) % nl]
            )
            predictions_class.append(ocls)
            predictions_mask.append(rasterize(pred_mask))

        disagreement = gini_disagreement(pred_mask, ocls)   # (b, n_mf)

        aux = tuple(
            {"pred_logits": a, "pred_masks": m}
            for a, m in zip(predictions_class, predictions_mask)
        )
        if self.final_layer:
            out = {
                "pred_logits": predictions_class[-1],
                "pred_masks": predictions_mask[-1],
                "aux_outputs": aux[:-1],
            }
        else:
            # earlier stages supervise every round as aux only
            # (maskfiner_transformer_decoder.py:543-556)
            out = {"aux_outputs": aux}
        return out, disagreement


class MaskPredictor(nn.Module):
    """One cascade stage: backbone + pixel decoder + mask decoder bundle
    (meta_arch/mask_predictor.py:79-106)."""

    backbone: nn.Module
    pixel_decoder: MSDeformAttnPixelDecoderMaskFiner
    mask_decoder: MultiScaleMaskFinerTransformerDecoder

    @nn.compact
    def __call__(self, im, features, features_pos, upsampling_mask,
                 tokens_per_scale, train: bool = False):
        feats, tokens_per_scale = self.backbone(
            im, features, features_pos, upsampling_mask, tokens_per_scale, train
        )
        (mask_features, mf_pos, ms_feats, ms_poss, ms_scales, finest_input_shape,
         input_shapes) = self.pixel_decoder(feats, deterministic=not train)
        predictions, upsampling_mask = self.mask_decoder(
            ms_feats, ms_poss, mask_features, mf_pos, finest_input_shape,
            input_shapes, deterministic=not train,
        )
        all_pos = jnp.concatenate(ms_poss, axis=1)
        all_scale = jnp.concatenate(ms_scales, axis=1)
        pos_scale = jnp.concatenate([all_scale[..., None], all_pos], axis=2)
        all_feat = jnp.concatenate(ms_feats, axis=1)
        # per-scale segment sizes of the pixel-decoder output stream
        seg_sizes = tuple(f.shape[1] for f in ms_feats)
        return predictions, all_feat, pos_scale, upsampling_mask, seg_sizes, tokens_per_scale


class MaskFiner(nn.Module):
    """Cascade meta-architecture (maskfiner_model.py:175-283): run the stage
    predictors in order, threading (features, features_pos, upsampling_mask);
    aux outputs accumulate across stages; the final stage provides
    pred_logits/pred_masks; eval carries per-stage disagreement maps."""

    mask_predictors: Sequence[MaskPredictor]
    pixel_mean: Sequence[float] = (123.675, 116.28, 103.53)
    pixel_std: Sequence[float] = (58.395, 57.12, 57.375)

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False) -> Dict:
        x = (images - jnp.asarray(self.pixel_mean, images.dtype)) / jnp.asarray(
            self.pixel_std, images.dtype
        )
        features = None
        features_pos = None
        upsampling_mask = None
        tokens_per_scale = None
        aux = ()
        disagreements = []
        outs = None
        for l_idx, predictor in enumerate(self.mask_predictors):
            outs, features, features_pos, upsampling_mask, seg_sizes, _tps = predictor(
                x, features, features_pos, upsampling_mask, tokens_per_scale, train
            )
            tokens_per_scale = seg_sizes
            disagreements.append(upsampling_mask)
            aux = aux + tuple(outs["aux_outputs"])
        return {
            "pred_logits": outs["pred_logits"],
            "pred_masks": outs["pred_masks"],
            "aux_outputs": aux,
            "disagreement_masks": tuple(disagreements),
            "features_pos": features_pos,
        }


def maskfiner_from_config(cfg) -> MaskFiner:
    """Build the full cascade (mirrors MaskFiner.from_config + the per-stage
    builders: backbone/build.py:7-20, pixel_decoder build, decoder build)."""
    mr = cfg.MODEL.MR
    mfr = cfg.MODEL.MASK_FINER
    head = cfg.MODEL.MR_SEM_SEG_HEAD
    n_scales = mfr.NUM_RESOLUTION_SCALES
    n_stages = len(mr.NAME)
    all_in_features = list(head.IN_FEATURES)          # ["res2".."res5"]
    all_trans = list(head.DEFORMABLE_TRANSFORMER_ENCODER_IN_FEATURES)

    dpr = list(np.linspace(0, mr.DROP_PATH_RATE, sum(mr.DEPTHS)))

    predictors = []
    for li in range(n_stages):
        lo = sum(mr.DEPTHS[:li])
        drop_path = tuple(dpr[lo : lo + mr.DEPTHS[li]])
        common = dict(
            scale=li,
            n_scales=n_scales,
            min_patch_size=mr.PATCH_SIZES[n_scales - 1],
            d_model=mr.EMBED_DIM[li],
            n_layers=mr.DEPTHS[li],
            n_heads=mr.NUM_HEADS[li],
            mlp_ratio=mr.MLP_RATIO[li],
            dropout=mr.DROP_RATE[li],
            drop_path=drop_path,
            layer_scale=mr.LAYER_SCALE,
        )
        if mr.NAME[li] == "MixResViT":
            backbone = MixResViT(
                patch_size=mr.PATCH_SIZES[li],
                first_layer=li == 0,
                in_channels=3 if li == 0 else head.CONVS_DIM[li - 1],
                num_register_tokens=mr.NUM_REGISTER_TOKENS,
                out_feature=f"res{n_scales - li + 1}",
                **common,
            )
        else:
            backbone = MixResNeighbour(
                patch_sizes=tuple(mr.PATCH_SIZES[: li + 1]),
                cluster_size=mr.CLUSTER_SIZE[li],
                nbhd_size=mr.NBHD_SIZE[li],
                split_ratio=mr.SPLIT_RATIO[li],
                upscale_ratio=mr.UPSCALE_RATIO[li],
                attn_drop=mr.ATTN_DROP_RATE[li],
                in_channels=3 if li == 0 else head.CONVS_DIM[li - 1],
                keep_old_scale=mr.KEEP_OLD_SCALE,
                first_layer=li == 0,
                do_upsample=li > 0,
                **common,
            )
        in_features = all_in_features[-(li + 1):]
        if li == n_stages - 1:
            trans = all_trans
        else:
            trans = all_trans[len(all_trans) - li - 1:]
        pixel_decoder = MSDeformAttnPixelDecoderMaskFiner(
            in_features=tuple(in_features),
            transformer_in_features=tuple(trans),
            conv_dim=head.CONVS_DIM[li],
            mask_dim=mfr.MASK_DIM[li],
            transformer_nheads=head.NHEADS[li],
            transformer_dim_feedforward=int(head.CONVS_DIM[li] * head.MLP_RATIO[li]),
            transformer_enc_layers=head.TRANSFORMER_ENC_LAYERS[li],
            transformer_dropout=head.DROPOUT,
            shepard_power=mfr.SHEPARD_POWER / 2.0,
            shepard_power_learnable=mfr.SHEPARD_POWER_LEARNABLE,
            maskformer_num_feature_levels=mfr.DECODER_LEVELS[li],
        )
        mask_decoder = MultiScaleMaskFinerTransformerDecoder(
            in_channels=head.CONVS_DIM[li],
            num_classes=head.NUM_CLASSES,
            hidden_dim=mfr.HIDDEN_DIM[li],
            num_queries=mfr.NUM_OBJECT_QUERIES,
            nheads=mfr.NHEADS[li],
            dim_feedforward=mfr.DIM_FEEDFORWARD[li],
            dec_layers=mfr.DEC_LAYERS[li] - 1,
            pre_norm=mfr.PRE_NORM,
            mask_dim=mfr.MASK_DIM[li],
            enforce_input_project=mfr.ENFORCE_INPUT_PROJ,
            num_feature_levels=mfr.DECODER_LEVELS[li],
            final_layer=li == n_stages - 1,
        )
        predictors.append(
            MaskPredictor(
                backbone=backbone,
                pixel_decoder=pixel_decoder,
                mask_decoder=mask_decoder,
                name=f"mask_predictors_{li}",
            )
        )
    return MaskFiner(
        mask_predictors=tuple(predictors),
        pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
        pixel_std=tuple(cfg.MODEL.PIXEL_STD),
    )
