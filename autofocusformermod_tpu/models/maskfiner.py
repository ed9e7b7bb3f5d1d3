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
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from ..geometry.gridnn import grid_shepard_upsample
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
    features = concat of ALL levels; returns the 7-tuple.

    ``activation="lrelu"`` + ``final_layer`` make this the
    MSDeformAttnPixelDecoderMaskFinerOracleTeacher variant
    (msdeformattn_pc_maskfiner_oracle_teacher.py: leaky-relu FFN/FPN,
    mask-features head only on the final stage)."""

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
    activation: str = "relu"
    final_layer: bool = True
    mask_decoder_all_levels: bool = False
    # MSDeformAttnPixelDecoderMaskFinerHierUp
    # (msdeformattn_pc_maskfiner_hierup.py:482-501): each FPN lateral is
    # hierarchically painted onto the FULL min-patch grid (finer levels claim
    # cells) before the Shepard residual add, and mask features come from the
    # dense last level only, on full-grid positions.
    hierup: bool = False

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
            x = features[f]                       # compute dtype (bf16 under AMP)
            pos = features[f + "_pos"].astype(jnp.float32)
            ss = features[f + "_spatial_shape"]
            xp = nn.Dense(self.conv_dim, name=f"input_proj_{idx}_dense")(x)
            xp = nn.LayerNorm(name=f"input_proj_{idx}_norm")(xp)
            srcs.append(xp)
            poss.append(pos)
            scaless.append(features[f + "_scale"].astype(jnp.float32))
            fixed = fix_pos_no_bias(pos, ss, min_ss)
            fixed_poss.append(fixed)
            pos_embed.append(
                position_embedding_sine(fixed, self.conv_dim // 2).astype(xp.dtype)
            )
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
                activation=self.activation,
                name=f"encoder_layer_{li}",
            )(out, fixed_poss, span_shapes, lvl_pos, nb_packed, deterministic)
        out = list(out)

        # extra FPN levels (only the last cascade stage has any)
        num_fpn = len(self.in_features) - len(self.transformer_in_features)
        for idx, f in enumerate(self.in_features[:num_fpn][::-1]):
            x = features[f]
            pos = features[f + "_pos"].astype(jnp.float32)
            ss = features[f + "_spatial_shape"]
            poss.append(pos)
            scaless.append(features[f + "_scale"].astype(jnp.float32))
            cur_fpn = nn.Dense(self.conv_dim, name=f"adapter_{idx + 1}_dense")(x)
            cur_fpn = nn.LayerNorm(name=f"adapter_{idx + 1}_norm")(cur_fpn)
            fixed = fix_pos_no_bias(pos, ss, min_ss)
            if self.hierup:
                # paint all levels so far + this lateral onto the dense grid
                # (reference hierup :484), then residual-add the Shepard
                # upsample of the previous level at the grid positions
                cur_fpn = hierarchical_upsample_dense(
                    out + [cur_fpn], fixed_poss + [fixed], min_ss
                )
                y = cur_fpn + upsample_feature_shepard(
                    grid_pos, fixed_poss[-1], out[-1]
                ).astype(cur_fpn.dtype)
                fixed = grid_pos
            else:
                y = cur_fpn + upsample_feature_shepard(
                    fixed, fixed_poss[-1], out[-1]
                ).astype(cur_fpn.dtype)
            y = PointConv(self.conv_dim, name=f"layer_{idx + 1}_pointconv")(y, fixed)
            y = nn.LayerNorm(name=f"layer_{idx + 1}_norm")(y)
            y = nn.leaky_relu(y) if self.activation == "lrelu" else nn.relu(y)
            fixed_poss.append(fixed)
            out.append(y)

        if self.hierup:
            # dense last level only (reference hierup :501)
            mf = out[-1]
            mf_pos = fixed_poss[-1]
        else:
            mf = jnp.concatenate(out, axis=1)
            mf_pos = jnp.concatenate(fixed_poss, axis=1)
        mask_features = (
            nn.Dense(self.mask_dim, name="mask_features")(mf)
            if self.final_layer or self.mask_decoder_all_levels
            else None
        )
        finest_input_shape = min_ss
        input_shapes = [features[f + "_spatial_shape"] for f in self.in_features[::-1]]
        return (
            mask_features, mf_pos, out, poss, scaless, finest_input_shape,
            input_shapes,
        )


class ProjPixelDecoderMaskFiner(nn.Module):
    """Projection-only per-stage pixel decoder — registry name
    ``ProjMaskFinerOracleTeacher`` (proj_maskfiner_oracle_teacher.py:344-506):
    per-level Linear+LN input projections (identity when the width already
    matches, reference :402-430 with force_proj=False), positions unified via
    fix_pos_no_bias, optional mask-features head on the concat; NO
    transformer.  Used by the first cascade stages of every oracle-teacher
    MaskFiner config."""

    in_features: Sequence[str]
    conv_dim: int = 256
    mask_dim: int = 256
    final_layer: bool = False
    mask_decoder_all_levels: bool = False

    @nn.compact
    def __call__(self, features: Dict, deterministic: bool = True):
        min_ss = features["min_spatial_shape"]
        srcs, poss, scaless, fixed_poss = [], [], [], []
        for idx, f in enumerate(self.in_features[::-1]):       # coarse first
            x = features[f].astype(jnp.float32)
            pos = features[f + "_pos"].astype(jnp.float32)
            ss = features[f + "_spatial_shape"]
            if x.shape[-1] != self.conv_dim:
                x = nn.Dense(self.conv_dim, name=f"input_proj_{idx}_dense")(x)
                x = nn.LayerNorm(name=f"input_proj_{idx}_norm")(x)
            srcs.append(x)
            poss.append(pos)
            scaless.append(features[f + "_scale"].astype(jnp.float32))
            fixed_poss.append(fix_pos_no_bias(pos, ss, min_ss))
        mf = jnp.concatenate(srcs, axis=1)
        mf_pos = jnp.concatenate(fixed_poss, axis=1)
        mask_features = (
            nn.Dense(self.mask_dim, name="mask_features")(mf)
            if self.final_layer or self.mask_decoder_all_levels
            else None
        )
        input_shapes = [features[f + "_spatial_shape"] for f in self.in_features[::-1]]
        return mask_features, mf_pos, srcs, poss, scaless, min_ss, input_shapes


def hierarchical_upsample_dense(feats: List, poss: List, finest_shape):
    """Paint per-level token features onto the full finest grid: each level-i
    token (coarsest first) covers a r_i x r_i block (r_i = 2^(L-1-i)) whose
    top-left corner is the token's raw position in finest-grid units; finer
    levels claim cells over coarser ones.

    Re-expression of the reference's hierarchical_upsample_ordered
    (point_utils.py:611-659, finest-claims-first with a visibility mask) as
    coarse-to-fine overwrite scatters — same content, but in canonical
    raster order with static shapes, so downstream mask rasterization is a
    plain reshape.  Returns (b, H*W, C)."""
    H, W = int(finest_shape[0]), int(finest_shape[1])
    L = len(feats)
    b, _, C = feats[0].shape
    dense = jnp.zeros((b, H * W, C), feats[0].dtype)
    bidx = jnp.arange(b)[:, None]
    for i, (f, p) in enumerate(zip(feats, poss)):
        r = 2 ** (L - 1 - i)
        xi = p[..., 0].astype(jnp.int32)
        yi = p[..., 1].astype(jnp.int32)
        dy, dx = np.meshgrid(np.arange(r), np.arange(r), indexing="ij")
        off = jnp.asarray((dy * W + dx).reshape(-1), jnp.int32)   # (r*r,)
        idx = (yi * W + xi)[:, :, None] + off[None, None, :]      # (b, n, r*r)
        vals = jnp.repeat(f, r * r, axis=1)                       # (b, n*r*r, C)
        dense = dense.at[bidx, idx.reshape(b, -1)].set(vals, mode="drop")
    return dense


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
    the finest level's grid, disagreement mask emitted for the next stage.

    With ``dense_mask_features=True`` this is the OracleTeacher variant
    (maskfiner_transformer_decoder_oracle_teacher.py:444-563): mask features
    are first painted onto the full finest grid (hierarchical upsample, finer
    levels claim cells) + sine PE, prediction heads read the dense grid
    directly (mask rasterization becomes a reshape) and no disagreement mask
    is produced — the OT cascade predicts upsampling masks with an MLP head
    instead (mask_predictor_oracle_teacher.py:83-126)."""

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
    dense_mask_features: bool = False
    # MultiScaleMaskFinerTransformerDecoderCat
    # (maskfiner_transformer_decoder_catfeatures.py:394-419): cross-attention
    # memory is the CONCATENATION of all levels every round (instead of
    # cycling one level per round), and the attention mask is computed at
    # the concatenated positions.
    cat_features: bool = False

    @nn.compact
    def __call__(self, x: List, pos: List, mask_features, mf_pos,
                 finest_input_shape, input_shapes, deterministic: bool = True):
        finest_feat_shape = input_shapes[-1]
        nl = self.num_feature_levels
        if self.dense_mask_features:
            # OT mode: paint mask features onto the full finest grid
            # (reference :455-457); the level lists here still hold ALL
            # levels coarse->fine, matching the mask_features concat order.
            segs = [xi.shape[1] for xi in x]
            starts = np.cumsum([0] + segs[:-1])
            mf_segments = [
                mask_features[:, s : s + n] for s, n in zip(starts, segs)
            ]
            mask_features = hierarchical_upsample_dense(
                mf_segments, pos, finest_input_shape
            )
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

        if self.dense_mask_features:
            # final-stage invariant: the min-patch canvas IS the finest level
            assert tuple(finest_input_shape) == tuple(finest_feat_shape), (
                finest_input_shape, finest_feat_shape,
            )
            mask_features = mask_features + position_embedding_sine(
                finest_pos, self.mask_dim // 2
            ).astype(mask_features.dtype)
            grid_lut = jnp.broadcast_to(
                jnp.arange(finest_pos.shape[1], dtype=jnp.int32)[None],
                (b, finest_pos.shape[1]),
            )

        query_feat = nn.Embed(self.num_queries, self.hidden_dim, name="query_feat")
        query_embed = nn.Embed(self.num_queries, self.hidden_dim, name="query_embed")
        level_embed = nn.Embed(nl, self.hidden_dim, name="level_embed")
        decoder_norm = nn.LayerNorm(name="decoder_norm")
        class_embed = nn.Dense(self.num_classes + 1, name="class_embed")
        mask_embed = MLP(self.hidden_dim, self.mask_dim, 3, name="mask_embed")

        src, pos_emb = [], []
        for i in range(nl):
            pos_emb.append(
                position_embedding_sine(poss_scaled[i], self.hidden_dim // 2).astype(
                    x[i].dtype
                )
            )
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
                if self.dense_mask_features:
                    am = grid_shepard_upsample(
                        target_pos, finest_pos, omask.transpose(0, 2, 1),
                        int(finest_feat_shape[0]), int(finest_feat_shape[1]),
                        lut=grid_lut,
                    ).transpose(0, 2, 1)
                else:
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
            if self.dense_mask_features:
                # dense grid masks are already in raster order
                return pred_mask.reshape(
                    b, -1, finest_feat_shape[0], finest_feat_shape[1]
                )
            up = upsample_feature_shepard(
                finest_pos, mf_pos_scaled, pred_mask.transpose(0, 2, 1)
            ).transpose(0, 2, 1)
            return point2img(up, finest_pos, finest_feat_shape)

        if self.cat_features:
            src_cat = jnp.concatenate(src, axis=1)
            pos_emb_cat = jnp.concatenate(pos_emb, axis=1)
            poss_cat = jnp.concatenate(poss_scaled, axis=1)

        predictions_class, predictions_mask = [], []
        ocls, pred_mask, attn_mask = prediction_heads(
            output, poss_cat if self.cat_features else poss_scaled[0]
        )
        predictions_class.append(ocls)
        predictions_mask.append(rasterize(pred_mask))

        for i in range(self.dec_layers):
            li = i % nl
            if attn_mask is not None:
                full = jnp.all(attn_mask, axis=-1, keepdims=True)
                attn_mask = jnp.logical_and(attn_mask, jnp.logical_not(full))
            memory = src_cat if self.cat_features else src[li]
            mem_pe = pos_emb_cat if self.cat_features else pos_emb[li]
            output = CrossAttentionLayer(
                self.hidden_dim, self.nheads, 0.0, self.pre_norm, name=f"cross_{i}"
            )(output, memory, attn_mask, mem_pe, qe, deterministic)
            output = SelfAttentionLayer(
                self.hidden_dim, self.nheads, 0.0, self.pre_norm, name=f"self_{i}"
            )(output, qe, deterministic)
            output = FFNLayer(
                self.hidden_dim, self.dim_feedforward, 0.0, self.pre_norm,
                name=f"ffn_{i}",
            )(output, deterministic)

            ocls, pred_mask, attn_mask = prediction_heads(
                output,
                poss_cat if self.cat_features else poss_scaled[(i + 1) % nl],
            )
            predictions_class.append(ocls)
            predictions_mask.append(rasterize(pred_mask))

        # OT decoder emits no disagreement (the cascade's upsampling masks
        # come from the predictor MLP instead, reference OT decoder :563)
        disagreement = (
            None if self.dense_mask_features
            else gini_disagreement(pred_mask, ocls)          # (b, n_mf)
        )

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
                 tokens_per_scale, train: bool = False, k_split=None):
        feats, tokens_per_scale = self.backbone(
            im, features, features_pos, upsampling_mask, tokens_per_scale, train,
            k_split=k_split,
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


class MaskPredictorOracleTeacher(nn.Module):
    """OT cascade stage (mask_predictor_oracle_teacher.py:35-126): non-final
    stages run backbone + projection pixel decoder ONLY — no mask decoder —
    and predict the next-stage upsampling mask with a 3-layer MLP over the
    concatenated pixel-decoder features; the final stage runs the full
    decoder (dense OT variant)."""

    backbone: nn.Module
    pixel_decoder: nn.Module
    mask_decoder: Optional[nn.Module]
    hidden_dim: int
    final_layer: bool

    @nn.compact
    def __call__(self, im, features, features_pos, upsampling_mask,
                 tokens_per_scale, train: bool = False, k_split=None):
        feats, tokens_per_scale = self.backbone(
            im, features, features_pos, upsampling_mask, tokens_per_scale, train,
            k_split=k_split,
        )
        (mask_features, mf_pos, ms_feats, ms_poss, ms_scales, finest_input_shape,
         input_shapes) = self.pixel_decoder(feats, deterministic=not train)
        if self.mask_decoder is not None:
            predictions, _ = self.mask_decoder(
                ms_feats, ms_poss, mask_features, mf_pos, finest_input_shape,
                input_shapes, deterministic=not train,
            )
        else:
            predictions = {"aux_outputs": ()}
        all_pos = jnp.concatenate(ms_poss, axis=1)
        all_scale = jnp.concatenate(ms_scales, axis=1)
        pos_scale = jnp.concatenate([all_scale[..., None], all_pos], axis=2)
        all_feat = jnp.concatenate(ms_feats, axis=1)
        upsampling_mask = (
            None if self.final_layer
            else MLP(self.hidden_dim * 2, 1, 3, name="upsample_out")(
                all_feat
            )[..., 0]
        )
        seg_sizes = tuple(f.shape[1] for f in ms_feats)
        return (predictions, all_feat, pos_scale, upsampling_mask, seg_sizes,
                tokens_per_scale)


class MaskFiner(nn.Module):
    """Cascade meta-architecture (maskfiner_model.py:175-283): run the stage
    predictors in order, threading (features, features_pos, upsampling_mask);
    aux outputs accumulate across stages; the final stage provides
    pred_logits/pred_masks; eval carries per-stage disagreement maps."""

    mask_predictors: Sequence[MaskPredictor]
    pixel_mean: Sequence[float] = (123.675, 116.28, 103.53)
    pixel_std: Sequence[float] = (58.395, 57.12, 57.375)
    # bf16 under SOLVER.AMP.ENABLED; pair with precision.amp_variables
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False,
                 k_splits=None) -> Dict:
        """k_splits: optional per-stage static split-count overrides (the
        bucketed eval-time dynamic ratios — see maskfiner_dynamic_eval)."""
        images = images.astype(jnp.float32)  # uint8 host batches cast on device
        x = (images - jnp.asarray(self.pixel_mean, images.dtype)) / jnp.asarray(
            self.pixel_std, images.dtype
        )
        x = x.astype(self.compute_dtype)
        features = None
        features_pos = None
        upsampling_mask = None
        tokens_per_scale = None
        aux = ()
        disagreements = []
        outs = None
        for l_idx, predictor in enumerate(self.mask_predictors):
            outs, features, features_pos, upsampling_mask, seg_sizes, _tps = predictor(
                x, features, features_pos, upsampling_mask, tokens_per_scale, train,
                k_split=None if k_splits is None else k_splits[l_idx],
            )
            tokens_per_scale = seg_sizes
            disagreements.append(upsampling_mask)
            aux = aux + tuple(outs["aux_outputs"])
        ret = {
            "pred_logits": outs["pred_logits"],
            "pred_masks": outs["pred_masks"],
            "aux_outputs": aux,
            "disagreement_masks": tuple(disagreements),
            "features_pos": features_pos,
        }
        if self.compute_dtype != jnp.float32:
            from ..parallel.precision import f32_outputs

            ret = f32_outputs(ret)
        return ret


def maskfiner_dynamic_eval(
    model: "MaskFiner",
    variables,
    images,
    threshold: float = 0.5,
    cap_ratio: float = 1.0,
    buckets=(0.1, 0.25, 0.5, 0.75, 1.0),
) -> Dict:
    """Eval-time DYNAMIC upsample ratios (reference
    mixres_neighbour.py:700-711), bucketed to static shapes.

    Runs the cascade stage-by-stage: after each stage the disagreement mask
    is brought to host, the fraction above ``threshold`` is quantized to a
    bucket (mixres.dynamic_k_split), and the next stage runs with that static
    ``k_split`` — one compiled program per (stage, bucket).  Semantics match
    the reference's clamp(frac, 0.1, cap) rule up to bucket rounding."""
    from .mixres import dynamic_k_split

    def run_stage(m, idx, im, features, features_pos, upsampling_mask,
                  tokens_per_scale, k_split):
        im = im.astype(jnp.float32)
        x = (im - jnp.asarray(m.pixel_mean, im.dtype)) / jnp.asarray(
            m.pixel_std, im.dtype
        )
        return m.mask_predictors[idx](
            x, features, features_pos, upsampling_mask, tokens_per_scale,
            False, k_split=k_split,
        )

    features = features_pos = upsampling_mask = None
    tokens_per_scale = None
    aux = ()
    disagreements = []
    outs = None
    for idx in range(len(model.mask_predictors)):
        k_split = None
        if idx > 0 and upsampling_mask is not None:
            n_curr = int(tokens_per_scale[-1])
            n_old = sum(tokens_per_scale[:-1])
            scores = np.asarray(upsampling_mask)
            scores = scores if scores.shape[1] == n_curr else scores[:, n_old:]
            k_split = dynamic_k_split(
                scores, n_curr, threshold, cap_ratio, buckets
            )
        outs, features, features_pos, upsampling_mask, seg_sizes, _ = model.apply(
            variables, idx, images, features, features_pos, upsampling_mask,
            tokens_per_scale, k_split, method=run_stage,
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


def build_backbone_indexed(cfg, li: int, name: str = None):
    """Per-cascade-stage backbone from MODEL.MR.NAME[li] (reference
    backbone/build.py:7-20 build_backbone_indexed).  Supports MixResViT,
    MixResNeighbour, MixResNeighbourXAttn, and ConvNeXtV2 stages; ``name``
    overrides the config dispatch (used by the direct registry entries)."""
    mr = cfg.MODEL.MR
    head = cfg.MODEL.MR_SEM_SEG_HEAD
    n_scales = cfg.MODEL.MASK_FINER.NUM_RESOLUTION_SCALES
    name = name or mr.NAME[li]
    # DROP_PATH_RATE is a scalar in the reference builder
    # (mixres_vit.py:538-540 torch.linspace over the global depth), but
    # several shipped reference configs set a per-stage LIST (all zeros) —
    # which torch.linspace rejects, so the reference itself cannot run them.
    # We accept the list as per-stage terminal rates: stage li's blocks take
    # their positions on the global ramp scaled to its own max.  Identical to
    # the reference formula for scalars and for the all-zero list configs.
    rate = mr.DROP_PATH_RATE
    max_rate = float(rate[li]) if isinstance(rate, (list, tuple)) else float(rate)
    dpr = list(np.linspace(0, max_rate, sum(mr.DEPTHS)))
    lo = sum(mr.DEPTHS[:li])
    drop_path = tuple(float(d) for d in dpr[lo : lo + mr.DEPTHS[li]])
    common = dict(
        scale=li,
        n_scales=n_scales,
        min_patch_size=mr.PATCH_SIZES[n_scales - 1],
        d_model=mr.EMBED_DIM[li],
        n_layers=mr.DEPTHS[li],
        in_channels=3 if li == 0 else head.CONVS_DIM[li - 1],
        first_layer=li == 0,
    )
    if name == "ConvNeXtV2":
        from .convnextv2 import ConvNeXtV2Stage

        return ConvNeXtV2Stage(
            patch_size=mr.PATCH_SIZES[li],
            out_feature=f"res{n_scales - li + 1}",
            **common,
        )
    common.update(
        n_heads=mr.NUM_HEADS[li],
        mlp_ratio=mr.MLP_RATIO[li],
        dropout=mr.DROP_RATE[li],
        drop_path=drop_path,
        layer_scale=mr.LAYER_SCALE,
    )
    if name == "MixResViT":
        return MixResViT(
            patch_size=mr.PATCH_SIZES[li],
            num_register_tokens=mr.NUM_REGISTER_TOKENS,
            out_feature=f"res{n_scales - li + 1}",
            **common,
        )
    if name in ("MixResNeighbour", "MixResNeighbourXAttn"):
        return MixResNeighbour(
            patch_sizes=tuple(mr.PATCH_SIZES[: li + 1]),
            cluster_size=mr.CLUSTER_SIZE[li],
            nbhd_size=mr.NBHD_SIZE[li],
            split_ratio=mr.SPLIT_RATIO[li],
            upscale_ratio=mr.UPSCALE_RATIO[li],
            attn_drop=mr.ATTN_DROP_RATE[li],
            keep_old_scale=mr.KEEP_OLD_SCALE,
            do_upsample=li > 0,
            cross_attend_image=name == "MixResNeighbourXAttn",
            **common,
        )
    raise KeyError(f"unknown cascade-stage backbone {name!r}")


def build_stage_pixel_decoder(cfg, li: int, final: bool, ot_predictor: bool):
    """Per-stage pixel decoder (reference pixel_decoder/build.py
    build_pixel_decoder_indexed): li indexes the per-scale config lists."""
    mfr = cfg.MODEL.MASK_FINER
    head = cfg.MODEL.MR_SEM_SEG_HEAD
    all_in_features = list(head.IN_FEATURES)
    all_trans = list(head.DEFORMABLE_TRANSFORMER_ENCODER_IN_FEATURES)
    in_features = all_in_features[-(li + 1):]
    if final:
        trans = all_trans
    else:
        trans = all_trans[len(all_trans) - li - 1:]
    pd_names = head.PIXEL_DECODER_NAME
    if isinstance(pd_names, str):
        pd_names = [pd_names] * (li + 1)
    pd_name = pd_names[li]
    if pd_name.endswith("HierUp"):
        return MSDeformAttnPixelDecoderMaskFiner(
            in_features=tuple(in_features),
            transformer_in_features=tuple(trans),
            conv_dim=head.CONVS_DIM[li],
            mask_dim=mfr.MASK_DIM[li],
            transformer_nheads=head.NHEADS[li],
            transformer_dim_feedforward=int(
                head.CONVS_DIM[li] * head.MLP_RATIO[li]
            ),
            transformer_enc_layers=head.TRANSFORMER_ENC_LAYERS[li],
            transformer_dropout=head.DROPOUT,
            shepard_power=mfr.SHEPARD_POWER / 2.0,
            shepard_power_learnable=mfr.SHEPARD_POWER_LEARNABLE,
            maskformer_num_feature_levels=mfr.DECODER_LEVELS[li],
            final_layer=final,
            mask_decoder_all_levels=mfr.MASK_DECODER_ALL_LEVELS,
            hierup=True,
        )
    if pd_name == "ProjMaskFinerOracleTeacher":
        return ProjPixelDecoderMaskFiner(
            in_features=tuple(in_features),
            conv_dim=head.CONVS_DIM[li],
            mask_dim=mfr.MASK_DIM[li],
            final_layer=final,
            mask_decoder_all_levels=mfr.MASK_DECODER_ALL_LEVELS,
        )
    return MSDeformAttnPixelDecoderMaskFiner(
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
        activation="lrelu" if pd_name.endswith("OracleTeacher") else "relu",
        # the mask-features head is only skipped when the OT
        # predictor really runs no decoder at this stage
        final_layer=final or not (pd_name.endswith("OracleTeacher")
                                  and ot_predictor),
        mask_decoder_all_levels=mfr.MASK_DECODER_ALL_LEVELS,
    )


def build_stage_mask_decoder(cfg, li: int, final: bool):
    """Per-stage transformer decoder (reference transformer_decoder/build.py
    build_transformer_decoder_indexed)."""
    mfr = cfg.MODEL.MASK_FINER
    head = cfg.MODEL.MR_SEM_SEG_HEAD
    dec_name = getattr(mfr, "TRANSFORMER_DECODER_NAME",
                       "MultiScaleMaskFinerTransformerDecoder")
    return MultiScaleMaskFinerTransformerDecoder(
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
        final_layer=final,
        dense_mask_features=dec_name.endswith("OracleTeacher"),
        cat_features="Cat" in dec_name,
    )


def maskfiner_from_config(cfg) -> MaskFiner:
    """Build the full cascade (mirrors MaskFiner.from_config + the per-stage
    builders: backbone/build.py:7-20, pixel_decoder build, decoder build)."""
    mr = cfg.MODEL.MR
    mfr = cfg.MODEL.MASK_FINER
    head = cfg.MODEL.MR_SEM_SEG_HEAD
    n_stages = len(mr.NAME)
    predictors = []
    for li in range(n_stages):
        backbone = build_backbone_indexed(cfg, li)
        final = li == n_stages - 1
        ot_predictor = head.NAME == "MaskPredictorOracleTeacher"
        pixel_decoder = build_stage_pixel_decoder(cfg, li, final, ot_predictor)
        build_decoder = (not ot_predictor) or final or mfr.MASK_DECODER_ALL_LEVELS
        mask_decoder = (
            build_stage_mask_decoder(cfg, li, final) if build_decoder else None
        )
        if ot_predictor:
            predictors.append(
                MaskPredictorOracleTeacher(
                    backbone=backbone,
                    pixel_decoder=pixel_decoder,
                    mask_decoder=mask_decoder,
                    hidden_dim=head.CONVS_DIM[li],
                    final_layer=final,
                    name=f"mask_predictors_{li}",
                )
            )
        else:
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
        compute_dtype=jnp.bfloat16 if cfg.SOLVER.AMP.ENABLED else jnp.float32,
    )
