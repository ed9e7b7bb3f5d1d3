"""Point-cloud Mask2Former transformer decoder.

TPU-native rebuild of reference
mask2former/modeling/transformer_decoder/mask2former_transformer_decoder.py:
100 learnable queries, ``dec_layers`` rounds of masked cross-attention ->
self-attention -> FFN cycling over 3 feature levels, with prediction heads
between rounds.  The attention mask is produced by Shepard-upsampling the
current mask logits to the *next* level's point positions and thresholding
sigmoid < 0.5 (reference :484-486); fully-masked rows are un-masked (:431).
Masks rasterize onto the stride-4 canvas by scatter (geometry/rasterize.py).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from ..geometry.rasterize import point2img
from ..geometry.gridnn import grid_shepard_upsample, pos_index_lut
from ..geometry.shepard import upsample_feature_shepard
from .layers import MLP, position_embedding_sine


class MultiheadAttention(nn.Module):
    """Batch-first multi-head attention with an optional boolean mask
    (True = blocked), matching torch.nn.MultiheadAttention semantics."""

    d_model: int
    nhead: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, query, key, value, attn_mask=None, deterministic: bool = True):
        b, nq, c = query.shape
        h = self.nhead
        c_ = c // h
        q = nn.Dense(c, name="q_proj")(query).reshape(b, nq, h, c_)
        k = nn.Dense(c, name="k_proj")(key).reshape(b, key.shape[1], h, c_)
        v = nn.Dense(c, name="v_proj")(value).reshape(b, value.shape[1], h, c_)
        logits = jnp.einsum("bqhc,bkhc->bhqk", q, k) / jnp.sqrt(c_).astype(q.dtype)
        if attn_mask is not None:
            # attn_mask: (b, h, nq, nk) bool, True = not allowed to attend
            logits = jnp.where(attn_mask, -1e9, logits)
        attn = jax.nn.softmax(logits, axis=-1)
        attn = nn.Dropout(self.dropout, deterministic=deterministic)(attn)
        out = jnp.einsum("bhqk,bkhc->bqhc", attn, v).reshape(b, nq, c)
        return nn.Dense(c, name="out_proj")(out)


class SelfAttentionLayer(nn.Module):
    """(mask2former_transformer_decoder.py:42-97), post-norm variant."""

    d_model: int
    nhead: int
    dropout: float = 0.0
    pre_norm: bool = False

    @nn.compact
    def __call__(self, tgt, query_pos, deterministic: bool = True):
        attn = MultiheadAttention(self.d_model, self.nhead, self.dropout, name="self_attn")
        norm = nn.LayerNorm(name="norm")
        drop = nn.Dropout(self.dropout, deterministic=deterministic)
        if self.pre_norm:
            t = norm(tgt)
            qk = t + query_pos
            return tgt + drop(attn(qk, qk, t, deterministic=deterministic))
        qk = tgt + query_pos
        tgt = tgt + drop(attn(qk, qk, tgt, deterministic=deterministic))
        return norm(tgt)


class CrossAttentionLayer(nn.Module):
    """(mask2former_transformer_decoder.py:100-160)."""

    d_model: int
    nhead: int
    dropout: float = 0.0
    pre_norm: bool = False

    @nn.compact
    def __call__(self, tgt, memory, memory_mask, pos, query_pos, deterministic: bool = True):
        attn = MultiheadAttention(self.d_model, self.nhead, self.dropout, name="multihead_attn")
        norm = nn.LayerNorm(name="norm")
        drop = nn.Dropout(self.dropout, deterministic=deterministic)
        if self.pre_norm:
            t = norm(tgt)
            return tgt + drop(
                attn(t + query_pos, memory + pos, memory, memory_mask, deterministic)
            )
        tgt = tgt + drop(
            attn(tgt + query_pos, memory + pos, memory, memory_mask, deterministic)
        )
        return norm(tgt)


class FFNLayer(nn.Module):
    """(mask2former_transformer_decoder.py:163-203)."""

    d_model: int
    dim_feedforward: int
    dropout: float = 0.0
    pre_norm: bool = False

    @nn.compact
    def __call__(self, tgt, deterministic: bool = True):
        norm = nn.LayerNorm(name="norm")
        drop = nn.Dropout(self.dropout, deterministic=deterministic)
        lin1 = nn.Dense(self.dim_feedforward, name="linear1")
        lin2 = nn.Dense(self.d_model, name="linear2")
        if self.pre_norm:
            t = norm(tgt)
            return tgt + drop(lin2(drop(nn.relu(lin1(t)))))
        tgt = tgt + drop(lin2(drop(nn.relu(lin1(tgt)))))
        return norm(tgt)


class MultiScaleMaskedTransformerDecoder(nn.Module):
    """(mask2former_transformer_decoder.py:232-501).

    __call__(x, pos, mask_features, mf_pos, mask_size) -> dict with
    'pred_logits' (b, q, nc+1), 'pred_masks' (b, q, h, w), 'aux_outputs'.
    """

    in_channels: int
    num_classes: int
    hidden_dim: int = 256
    num_queries: int = 100
    nheads: int = 8
    dim_feedforward: int = 2048
    dec_layers: int = 9          # config DEC_LAYERS - 1
    pre_norm: bool = False
    mask_dim: int = 256
    enforce_input_project: bool = False
    num_feature_levels: int = 3
    # MultiScaleMaskedTransformerDecoderSwin
    # (mask2former_transformer_decoder_swin.py:435-450): the attention mask
    # is the rasterized mask bilinearly resized to each level's grid (the
    # stock grid Mask2Former behavior) instead of Shepard-upsampled onto the
    # level's point positions.  Requires level_shapes at call time.
    grid_attn_mask: bool = False
    # fp32 island under AMP (parallel.precision "mask_head"): the prediction
    # heads — decoder_norm -> class/mask embeds -> the mask-logit dot and its
    # Shepard attention-mask upsample — run fp32 at HIGHEST matmul precision.
    # The mask logit feeds a >0 threshold (the decision PQ/AP consume);
    # DRIFT_r04.json measured uniform bf16 flipping 3.14% of those decisions
    # at trained weights.  The query/feature path stays bf16.
    f32_mask_head: bool = False

    def setup(self):
        self.query_feat = nn.Embed(self.num_queries, self.hidden_dim)
        self.query_embed = nn.Embed(self.num_queries, self.hidden_dim)
        self.level_embed = nn.Embed(self.num_feature_levels, self.hidden_dim)
        if self.in_channels != self.hidden_dim or self.enforce_input_project:
            self.input_proj = [
                nn.Dense(self.hidden_dim, name=f"input_proj_{i}")
                for i in range(self.num_feature_levels)
            ]
        else:
            self.input_proj = [None] * self.num_feature_levels
        self.cross_layers = [
            CrossAttentionLayer(self.hidden_dim, self.nheads, 0.0, self.pre_norm,
                                name=f"cross_{i}")
            for i in range(self.dec_layers)
        ]
        self.self_layers = [
            SelfAttentionLayer(self.hidden_dim, self.nheads, 0.0, self.pre_norm,
                               name=f"self_{i}")
            for i in range(self.dec_layers)
        ]
        self.ffn_layers = [
            FFNLayer(self.hidden_dim, self.dim_feedforward, 0.0, self.pre_norm,
                     name=f"ffn_{i}")
            for i in range(self.dec_layers)
        ]
        self.decoder_norm = nn.LayerNorm()
        self.class_embed = nn.Dense(self.num_classes + 1)
        self.mask_embed = MLP(self.hidden_dim, self.mask_dim, 3)

    def _prediction_heads(self, output, mask_features, mf_pos, target_pos,
                          mask_size=None, mf_raster=False, target_hw=None):
        """(reference :468-488). output: (b, q, c)."""
        if self.f32_mask_head:
            with jax.default_matmul_precision("float32"):
                return self._prediction_heads_impl(
                    output.astype(jnp.float32),
                    mask_features.astype(jnp.float32),
                    mf_pos, target_pos, mask_size, mf_raster, target_hw,
                )
        return self._prediction_heads_impl(
            output, mask_features, mf_pos, target_pos, mask_size, mf_raster,
            target_hw,
        )

    def _prediction_heads_impl(self, output, mask_features, mf_pos, target_pos,
                               mask_size=None, mf_raster=False, target_hw=None):
        dec = self.decoder_norm(output)
        outputs_class = self.class_embed(dec)                       # (b, q, nc+1)
        mask_embed = self.mask_embed(dec)                           # (b, q, cm)
        outputs_mask = jnp.einsum("bqc,bnc->bqn", mask_embed, mask_features)
        # upsample mask logits to the next level's positions -> attention mask
        if self.grid_attn_mask and target_hw is not None:
            # Swin variant: bilinear resize of the rasterized mask to the
            # level grid (reference swin decoder :444-448)
            b, q, _ = outputs_mask.shape
            raster = outputs_mask.reshape(b, q, mask_size[0], mask_size[1])
            am = jax.image.resize(
                raster, (b, q, int(target_hw[0]), int(target_hw[1])),
                method="bilinear",
            ).reshape(b, q, -1)
        elif mf_raster:
            # mask features are raster-ordered (token == cell): the window-KNN
            # needs no cell->token LUT gather
            am = grid_shepard_upsample(
                target_pos, mf_pos, outputs_mask.transpose(0, 2, 1),
                mask_size[0], mask_size[1], identity_lut=True,
            ).transpose(0, 2, 1)
        else:
            am = upsample_feature_shepard(
                target_pos, mf_pos, outputs_mask.transpose(0, 2, 1)
            ).transpose(0, 2, 1)                                    # (b, q, n_lvl)
        am = jax.lax.stop_gradient(jax.nn.sigmoid(am) < 0.5)        # True = blocked
        attn_mask = jnp.broadcast_to(
            am[:, None], (am.shape[0], self.nheads, am.shape[1], am.shape[2])
        )
        return outputs_class, outputs_mask, attn_mask

    def __call__(self, x: List, pos: List, mask_features, mf_pos,
                 mask_size: Tuple[int, int], deterministic: bool = True,
                 level_shapes: List = None) -> Dict:
        assert len(x) == self.num_feature_levels
        if self.grid_attn_mask:
            assert level_shapes is not None, (
                "grid_attn_mask (Swin decoder) needs level_shapes"
            )

        def level_hw(i):
            return level_shapes[i] if level_shapes is not None else None
        b = x[0].shape[0]

        src, pos_emb = [], []
        for i in range(self.num_feature_levels):
            # sine embedding is fp32 geometry; cast down so the additions in
            # the attention layers keep the compute dtype under mixed precision
            pos_emb.append(
                position_embedding_sine(pos[i], self.hidden_dim // 2).astype(
                    x[i].dtype
                )
            )
            s = x[i] if self.input_proj[i] is None else self.input_proj[i](x[i])
            src.append(s + self.level_embed.embedding[i][None, None, :])

        query_embed = jnp.broadcast_to(
            self.query_embed.embedding[None], (b, self.num_queries, self.hidden_dim)
        )
        output = jnp.broadcast_to(
            self.query_feat.embedding[None], (b, self.num_queries, self.hidden_dim)
        )

        # mask features cover the full canvas for AFF.  Permute them into
        # RASTER order once (one wide row gather), after which every
        # per-round consumer degenerates: the 10x point2img rasterizations
        # become reshapes (were 5.3 ms of (b, q, n) lane gathers at 512x512
        # batch 4), and the attention-mask window-KNN's cell->token LUT
        # lookups (take_scalars over 16 candidates per level query) vanish
        # because token index == cell id.  Mask logits, the einsum, and all
        # tie semantics are order-covariant, so outputs are unchanged.
        mf_raster = mf_pos.shape[1] == mask_size[0] * mask_size[1]
        if mf_raster:
            from ..ops.gather import take_rows

            mf_lut = pos_index_lut(mf_pos, mask_size[0], mask_size[1])
            mask_features = take_rows(mask_features, mf_lut)
            h_m, w_m = int(mask_size[0]), int(mask_size[1])
            ys, xs = np.meshgrid(np.arange(h_m), np.arange(w_m), indexing="ij")
            mf_pos = jnp.broadcast_to(
                jnp.asarray(np.stack([xs, ys], 2).reshape(1, -1, 2),
                            mf_pos.dtype),
                (b, h_m * w_m, 2),
            )
        predictions_class, predictions_mask = [], []
        outputs_class, outputs_mask, attn_mask = self._prediction_heads(
            output, mask_features, mf_pos, pos[0], mask_size, mf_raster,
            target_hw=level_hw(0),
        )
        def rasterize(m):
            if mf_raster:
                return m.reshape(*m.shape[:2], *(int(s) for s in mask_size))
            return point2img(m, mf_pos, mask_size)

        predictions_class.append(outputs_class)
        predictions_mask.append(rasterize(outputs_mask))

        for i in range(self.dec_layers):
            level_index = i % self.num_feature_levels
            # un-mask rows that mask out everything (reference :431)
            full = jnp.all(attn_mask, axis=-1, keepdims=True)
            attn_mask = jnp.logical_and(attn_mask, jnp.logical_not(full))

            output = self.cross_layers[i](
                output, src[level_index], attn_mask,
                pos_emb[level_index], query_embed, deterministic,
            )
            output = self.self_layers[i](output, query_embed, deterministic)
            output = self.ffn_layers[i](output, deterministic)

            outputs_class, outputs_mask, attn_mask = self._prediction_heads(
                output, mask_features, mf_pos,
                pos[(i + 1) % self.num_feature_levels], mask_size, mf_raster,
                target_hw=level_hw((i + 1) % self.num_feature_levels),
            )
            predictions_class.append(outputs_class)
            predictions_mask.append(rasterize(outputs_mask))

        return {
            "pred_logits": predictions_class[-1],
            "pred_masks": predictions_mask[-1],
            "aux_outputs": tuple(
                {"pred_logits": a, "pred_masks": m}
                for a, m in zip(predictions_class[:-1], predictions_mask[:-1])
            ),
        }


def transformer_decoder_from_config(
    cfg, in_channels: int, f32_mask_head: bool = False
) -> MultiScaleMaskedTransformerDecoder:
    """Mirror of from_config (mask2former_transformer_decoder.py:362-387).
    TRANSFORMER_DECODER_NAME "...Swin" selects the grid attention-mask
    variant (mask2former_transformer_decoder_swin.py)."""
    name = cfg.MODEL.MASK_FORMER.TRANSFORMER_DECODER_NAME
    return MultiScaleMaskedTransformerDecoder(
        f32_mask_head=f32_mask_head,
        in_channels=in_channels,
        num_classes=cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES,
        hidden_dim=cfg.MODEL.MASK_FORMER.HIDDEN_DIM,
        num_queries=cfg.MODEL.MASK_FORMER.NUM_OBJECT_QUERIES,
        nheads=cfg.MODEL.MASK_FORMER.NHEADS,
        dim_feedforward=cfg.MODEL.MASK_FORMER.DIM_FEEDFORWARD,
        dec_layers=cfg.MODEL.MASK_FORMER.DEC_LAYERS - 1,
        pre_norm=cfg.MODEL.MASK_FORMER.PRE_NORM,
        mask_dim=cfg.MODEL.SEM_SEG_HEAD.MASK_DIM,
        enforce_input_project=cfg.MODEL.MASK_FORMER.ENFORCE_INPUT_PROJ,
        grid_attn_mask=name.endswith("Swin"),
    )
