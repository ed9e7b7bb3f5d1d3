"""MixRes MetaLoss (MRML) family — the earlier cascade iteration where token
splitting is driven by a learned per-token "meta loss" (predicted future
error) instead of decoder disagreement.

Rebuild of reference mask2former/modeling/backbone/mrml.py (global-attention
variant; the cluster-attention variant mrml_neighbour.py differs only in the
block type) and the MaskFormerML meta-arch's metaloss supervision
(maskformer_model_ml.py:424-477): L1 between the predicted per-token meta
loss and the actual downstream error at the token's patch.

MixResMeanAct (mrmean.py:429-440) is the ``mean_activation_scores=True``
configuration: the split decision comes from mean absolute activation instead
of the learned metaloss head.

Same static scale-segment layout as models/mixres.py.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from .layers import Mlp, position_embedding_sine
from .mixres import (
    MixResLayer,
    OverlapPatchEmbedding,
    ViTBlock,
    get_2dpos_of_curr_ps_in_min_ps,
)


class MixResMetaLoss(nn.Module):
    """Single backbone with internal metaloss-driven splitting (mrml.py:200-440).

    Returns the point-cloud outs dict + metaloss{l} predictions and their
    positions for supervision.
    """

    n_scales: int = 4
    patch_sizes: Sequence[int] = (32, 16, 8, 4)
    embed_dims: Sequence[int] = (512, 256, 128, 64)
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (32, 16, 8, 4)
    mlp_ratio: float = 4.0
    split_ratio: int = 4
    upscale_ratio: float = 0.25
    cluster_size: int = 8
    nbhd_size: int = 48
    use_cluster_attention: bool = False  # mrml_neighbour variant
    mean_activation_scores: bool = False  # MixResMeanAct (mrmean.py:429-440):
    # split decision from the mean absolute activation instead of a learned head

    @nn.compact
    def __call__(self, im, train: bool = False) -> Dict:
        b, H, W, _ = im.shape
        min_ps = self.patch_sizes[self.n_scales - 1]
        min_patched = (H // min_ps, W // min_ps)

        ps = self.patch_sizes[0]
        x = OverlapPatchEmbedding(ps, self.embed_dims[0], name="patch_embed")(im, train)
        pos_np = get_2dpos_of_curr_ps_in_min_ps(H, W, ps, min_ps, 0)
        pos = jnp.broadcast_to(jnp.asarray(pos_np)[None], (b, pos_np.shape[0], 3))
        x = x + position_embedding_sine(pos[:, :, 1:], self.embed_dims[0] // 2).astype(x.dtype)
        tokens_per_scale: Tuple[int, ...] = (pos_np.shape[0],)

        outs: Dict = {"min_spatial_shape": min_patched}
        for l in range(self.n_scales):
            out_idx = self.n_scales - l + 1
            dim = self.embed_dims[l]
            if self.use_cluster_attention:
                pos, x = MixResLayer(
                    dim=dim, cluster_size=self.cluster_size,
                    nbhd_size=self.nbhd_size, depth=self.depths[l],
                    num_heads=self.num_heads[l], mlp_ratio=self.mlp_ratio,
                    name=f"layers_{l}",
                )(pos, x, min_patched[0], min_patched[1], deterministic=not train)
            else:
                hh = H // self.patch_sizes[min(l, self.n_scales - 1)]
                ww = W // self.patch_sizes[min(l, self.n_scales - 1)]
                for j in range(self.depths[l]):
                    # MRML blocks have no DWConv (tokens are mixed-scale after
                    # the first split; mrml.py:223-225 calls blocks w/o h, w)
                    x = ViTBlock(
                        dim, self.num_heads[l], int(dim * self.mlp_ratio),
                        dw_conv=False, name=f"layers_{l}_blocks_{j}",
                    )(x, hh, ww, deterministic=not train)

            outs[f"res{out_idx}_spatial_shape"] = (
                H // self.patch_sizes[l], W // self.patch_sizes[l]
            )

            if l < self.n_scales - 1:
                # split the newest (last) scale segment by predicted meta loss
                n_curr = tokens_per_scale[-1]
                n_old = sum(tokens_per_scale[:-1])
                feat_old, pos_old = x[:, :n_old], pos[:, :n_old]
                feat_c, pos_c = x[:, n_old:], pos[:, n_old:]

                if self.mean_activation_scores:
                    pred_ml = jnp.mean(
                        jnp.abs(jax.lax.stop_gradient(feat_c)), axis=-1
                    )                                         # (b, n_curr)
                else:
                    pred_ml = Mlp(dim, 1, name=f"metalosses_{l}")(
                        jax.lax.stop_gradient(feat_c)
                    )[..., 0]                                 # (b, n_curr)
                outs[f"metaloss{l}"] = pred_ml
                outs[f"metaloss{l}_pos"] = pos_c[:, :, 1:]

                k_split = max(1, int(n_curr * self.upscale_ratio))
                _, top = jax.lax.top_k(pred_ml, k_split)
                _, bot = jax.lax.top_k(-pred_ml, n_curr - k_split)
                keep_f = jnp.take_along_axis(feat_c, bot[..., None], axis=1)
                keep_p = jnp.take_along_axis(pos_c, bot[..., None], axis=1)
                split_f = jnp.take_along_axis(feat_c, top[..., None], axis=1)
                split_p = jnp.take_along_axis(pos_c, top[..., None], axis=1)

                # learned 4-way split: Linear(dim -> 4*dim) + rel/scale embeds
                # (mrml.py:344-351)
                sf = nn.Dense(self.split_ratio * dim, name=f"splits_{l}")(split_f)
                sf = sf.reshape(b, k_split, self.split_ratio, dim)
                rel_emb = self.param(
                    f"rel_pos_embs_{l}", nn.initializers.normal(0.02),
                    (1, 1, self.split_ratio, dim),
                )
                scale_emb = self.param(
                    f"scale_embs_{l}", nn.initializers.normal(0.02),
                    (1, 1, 1, dim),
                )
                sf = (sf + rel_emb + scale_emb).reshape(b, k_split * 4, dim)

                new_scale = l + 1
                r = 2 ** (self.n_scales - new_scale - 1)
                xx, yy = split_p[:, :, 1], split_p[:, :, 2]
                children = jnp.stack(
                    [
                        jnp.stack([xx, yy], -1),
                        jnp.stack([xx + r, yy], -1),
                        jnp.stack([xx, yy + r], -1),
                        jnp.stack([xx + r, yy + r], -1),
                    ],
                    axis=2,
                ).reshape(b, k_split * 4, 2)
                sc = jnp.full((b, k_split * 4, 1), float(new_scale))
                sp = jnp.concatenate([sc, children], axis=2)

                # high-res image features at the children (patched conv embed,
                # mrml.py:373-381)
                nps = self.patch_sizes[new_scale]
                patched = nn.Conv(
                    dim, (nps, nps), strides=(nps, nps),
                    name=f"high_res_patchers_{l}",
                )(im)
                hw = patched.shape[1:3]
                cx = (children[..., 0] / (2 ** (self.n_scales - new_scale - 1))).astype(jnp.int32)
                cy = (children[..., 1] / (2 ** (self.n_scales - new_scale - 1))).astype(jnp.int32)
                flatp = patched.reshape(b, hw[0] * hw[1], dim)
                idx = jnp.clip(cy, 0, hw[0] - 1) * hw[1] + jnp.clip(cx, 0, hw[1] - 1)
                sf = sf + jnp.take_along_axis(flatp, idx[..., None], axis=1)

                x = jnp.concatenate([feat_old, keep_f, sf], axis=1)
                pos = jnp.concatenate([pos_old, keep_p, sp], axis=1)
                tokens_per_scale = tokens_per_scale[:-1] + (
                    n_curr - k_split, k_split * 4,
                )
                # channel downsampling between scales (mrml.py downsamplers)
                x = nn.Dense(self.embed_dims[l + 1], name=f"downsamplers_{l}")(
                    nn.LayerNorm(name=f"downsamplers_norm_{l}")(x)
                )

        # emit per-scale outputs from static segments
        start = 0
        for s, cnt in enumerate(tokens_per_scale):
            out_idx = self.n_scales - s + 1
            seg = slice(start, start + cnt)
            div = 2 ** (self.n_scales - s - 1)
            outs[f"res{out_idx}"] = x[:, seg]
            outs[f"res{out_idx}_pos"] = jnp.floor(pos[:, seg, 1:] / div)
            outs[f"res{out_idx}_scale"] = pos[:, seg, 0]
            start += cnt
        return outs


class MaskFormerML(nn.Module):
    """MaskFormer with the MixResMetaLoss backbone (maskformer_model_ml.py:
    24-229): the standard pixel/mask decoder head runs on the mixed-scale
    point cloud, and the backbone's per-scale metaloss predictions are
    surfaced for L1 supervision against the actual segmentation error."""

    backbone: MixResMetaLoss
    head: nn.Module
    pixel_mean: Sequence[float] = (123.675, 116.28, 103.53)
    pixel_std: Sequence[float] = (58.395, 57.12, 57.375)
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False) -> Dict:
        images = images.astype(jnp.float32)  # uint8 host batches cast on device
        x = (images - jnp.asarray(self.pixel_mean, images.dtype)) / jnp.asarray(
            self.pixel_std, images.dtype
        )
        x = x.astype(self.compute_dtype)
        feats = self.backbone(x, train)
        out = self.head(feats, deterministic=not train)
        n = self.backbone.n_scales - 1
        out["metaloss_preds"] = tuple(feats[f"metaloss{i}"] for i in range(n))
        out["metaloss_pos"] = tuple(feats[f"metaloss{i}_pos"] for i in range(n))
        if self.compute_dtype != jnp.float32:
            from ..parallel.precision import f32_outputs

            out = f32_outputs(out)
        return out


def compute_meta_loss(
    outputs: Dict,
    tgt_labels: jnp.ndarray,
    tgt_masks: jnp.ndarray,
    tgt_valid: jnp.ndarray,
    min_patch_size: int,
) -> jnp.ndarray:
    """The ML meta-loss target (maskformer_model_ml.py:424-477): per-pixel CE
    of the (detached) soft semantic prediction against the composed GT label
    map, pooled per min patch, L1 against each scale's metaloss prediction
    over its token footprint; mean over scales.

    tgt_labels (b,t) int32 / tgt_masks (b,t,H,W) / tgt_valid (b,t)."""
    preds = outputs["metaloss_preds"]
    poss = outputs["metaloss_pos"]
    n_scales = len(preds) + 1
    H, W = tgt_masks.shape[-2:]
    v = tgt_valid.astype(jnp.float32)
    label_map = jnp.einsum(
        "bqhw,bq->bhw", tgt_masks * v[:, :, None, None],
        tgt_labels.astype(jnp.float32) * v,
    ).astype(jnp.int32)                                        # (b, H, W)
    nc = outputs["pred_logits"].shape[-1] - 1
    # semantic GT masks are disjoint so the einsum reproduces the class id;
    # clamp to stay in-range if instance masks overlap
    label_map = jnp.clip(label_map, 0, nc - 1)

    mask_cls = jax.lax.stop_gradient(outputs["pred_logits"])
    mask_pred = jax.lax.stop_gradient(outputs["pred_masks"])
    b, q = mask_cls.shape[:2]
    mask_pred = jax.image.resize(
        mask_pred, (b, q, H, W), method="bilinear"
    )
    cls = jax.nn.softmax(mask_cls, axis=-1)[..., :-1]          # (b, q, nc)
    semseg = jnp.einsum(
        "bqc,bqhw->bchw", cls, jax.nn.sigmoid(mask_pred)
    )
    # reference F.cross_entropy treats semseg as logits
    logp = jax.nn.log_softmax(semseg, axis=1)
    ce = -jnp.take_along_axis(logp, label_map[:, None], axis=1)[:, 0]  # (b,H,W)

    p = min_patch_size
    emap = ce.reshape(b, H // p, p, W // p, p).mean(axis=(2, 4))       # (b,Hm,Wm)

    losses = [
        metaloss_l1(pred, pos, emap, 2 ** (n_scales - 1 - i))
        for i, (pred, pos) in enumerate(zip(preds, poss))
    ]
    return jnp.mean(jnp.stack(losses))


def mixres_metaloss_from_config(cfg) -> MixResMetaLoss:
    mrml = cfg.MODEL.MRML
    return MixResMetaLoss(
        n_scales=mrml.NUM_SCALES,
        patch_sizes=tuple(mrml.PATCH_SIZES),
        embed_dims=tuple(mrml.EMBED_DIM),
        depths=tuple(mrml.DEPTHS),
        num_heads=tuple(mrml.NUM_HEADS),
        mlp_ratio=mrml.MLP_RATIO,
        split_ratio=mrml.SPLIT_RATIO,
        upscale_ratio=mrml.UPSCALE_RATIO,
    )


def maskformer_ml_from_config(cfg) -> MaskFormerML:
    """MaskFormerML.from_config (maskformer_model_ml.py:104-179)."""
    from .maskformer import MaskFormerHead
    from .pixel_decoder import pixel_decoder_from_config
    from .transformer_decoder import transformer_decoder_from_config

    backbone = mixres_metaloss_from_config(cfg)
    pixel_decoder = pixel_decoder_from_config(cfg, {})
    if cfg.MODEL.SEM_SEG_HEAD.PIXEL_DECODER_NAME == "MSDeformAttnPixelDecoderUp":
        pixel_decoder = pixel_decoder.clone(mask_on_full_grid=True)
    predictor = transformer_decoder_from_config(
        cfg, cfg.MODEL.SEM_SEG_HEAD.CONVS_DIM
    )
    head = MaskFormerHead(pixel_decoder=pixel_decoder, predictor=predictor)
    return MaskFormerML(
        backbone=backbone,
        head=head,
        pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
        pixel_std=tuple(cfg.MODEL.PIXEL_STD),
        compute_dtype=jnp.bfloat16 if cfg.SOLVER.AMP.ENABLED else jnp.float32,
    )


def metaloss_l1(
    pred_metaloss: jnp.ndarray,
    pos_xy: jnp.ndarray,
    error_map: jnp.ndarray,
    patch_size_in_min_units: int,
) -> jnp.ndarray:
    """L1 between the predicted per-token meta loss and the actual error rate
    in the token's patch (maskformer_model_ml.py:424-477).

    pred_metaloss - (b, n); pos_xy - (b, n, 2) min-patch coords
    error_map - (b, Hm, Wm) per-min-patch error rates in [0, 1]
    """
    b, Hm, Wm = error_map.shape
    ii = jnp.cumsum(jnp.cumsum(error_map, axis=1), axis=2)
    ii = jnp.pad(ii, ((0, 0), (1, 0), (1, 0)))
    p = patch_size_in_min_units
    x0 = jnp.clip(pos_xy[..., 0].astype(jnp.int32), 0, Wm)
    y0 = jnp.clip(pos_xy[..., 1].astype(jnp.int32), 0, Hm)
    x1 = jnp.clip(x0 + p, 0, Wm)
    y1 = jnp.clip(y0 + p, 0, Hm)

    def box(ii_b, x0b, y0b, x1b, y1b):
        return ii_b[y1b, x1b] - ii_b[y0b, x1b] - ii_b[y1b, x0b] + ii_b[y0b, x0b]

    sums = jax.vmap(
        lambda ii_b, a, c, d, e: jax.vmap(box, (None, 0, 0, 0, 0))(ii_b, a, c, d, e)
    )(ii, x0, y0, x1, y1)
    area = jnp.maximum((x1 - x0) * (y1 - y0), 1).astype(jnp.float32)
    actual = sums / area
    return jnp.mean(jnp.abs(pred_metaloss - jax.lax.stop_gradient(actual)))
