"""MixRes backbones — the MaskFiner cascade's mixed-resolution token models.

TPU-native rebuild of reference mask2former/modeling/backbone/mixres_vit.py and
mixres_neighbour.py:

  - MixResViT: cascade stage 0 — a coarse global-attention ViT (patch 32)
    with overlapping conv patch embed and DWConv feed-forwards; emits tokens
    with (scale, x, y) positions on the min-patch canvas (mixres_vit.py:505-).
  - MixResNeighbour: later stages — split the top-rho most "disagreeing"
    tokens 4-way (straight-through estimator, mixres_neighbour.py:699-733),
    re-inject raw image patch features into the new tokens (:785-806), then
    run cluster-attention blocks over the mixed-scale point cloud (:374-509,
    the AFF machinery without downsampling; blank-sink logit clamped to +-5).

Static-shape design: tokens are kept ORDERED BY SCALE in contiguous segments
whose lengths (``tokens_per_scale``) are compile-time constants — the
reference's data-dependent ``torch.where(pos[:,:,0]==s)`` partitions become
static slices.  The cluster reorder inside a stage is inverted afterwards so
segments stay contiguous.  Split counts default to the training-time static
ratio ``int(N * upscale_ratio)``; the reference's eval-time *dynamic* ratios
(mixres_neighbour.py:700-711) become BUCKETED static counts: the host
quantizes the measured disagreement fraction to a small set of precompiled
split sizes (``dynamic_k_split``) and passes the chosen count as the static
``k_split`` override (``models.maskfiner.maskfiner_dynamic_eval`` drives the
cascade stage-by-stage this way, one XLA program per bucket).
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from ..geometry.cluster import space_filling_cluster
from ..geometry.knn import knn
from .aff import ClusterTransformerBlock, _gather_by_idx, _nbhd_from_clusters
from .layers import Mlp, DropPath, position_embedding_sine


def dynamic_k_split(
    scores,
    n_curr: int,
    threshold: float = 0.5,
    cap_ratio: float = 1.0,
    buckets=(0.1, 0.25, 0.5, 0.75, 1.0),
) -> int:
    """Eval-time dynamic split count, bucketed to static shapes.

    The reference (mixres_neighbour.py:700-711) computes
    ``clamp(max_b(frac(importance > threshold)), 0.1, cap)`` per batch and
    splits that data-dependent number of tokens.  Here the fraction is
    measured on host from the concrete scores and rounded UP to the nearest
    bucket, so each bucket is one precompiled XLA program.

    scores: (b, n_curr) concrete array (host/numpy).  Returns a python int.
    """
    frac = float(np.max(np.mean(np.asarray(scores) > threshold, axis=-1)))
    frac = min(max(frac, 0.1), cap_ratio)
    ratio = next((r for r in sorted(buckets) if r >= frac), sorted(buckets)[-1])
    ratio = min(ratio, cap_ratio)
    return max(1, int(n_curr * ratio))


def get_2dpos_of_curr_ps_in_min_ps(height, width, patch_size, min_patch_size, scale):
    """Token (scale, x, y) coords of a regular patch grid expressed on the
    min-patch canvas (mixres_vit.py:80-92).  Static numpy."""
    step = patch_size // min_patch_size
    xs = np.arange(0, width // min_patch_size, step)
    ys = np.arange(0, height // min_patch_size, step)
    gx, gy = np.meshgrid(xs, ys, indexing="xy")
    coords = np.stack([gx.reshape(-1), gy.reshape(-1)], axis=1)
    scale_col = np.full((coords.shape[0], 1), scale)
    return np.concatenate([scale_col, coords], axis=1).astype(np.float32)


class DownSampleConvBlock(nn.Module):
    """Conv s2 k3 -> LeakyReLU -> norm (mixres_vit.py:306-318 GroupNorm(1);
    mixres_neighbour BatchNorm variant selected by ``use_bn``)."""

    out_dim: int
    use_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.out_dim, (3, 3), strides=(2, 2),
                    padding=((1, 1), (1, 1)), name="conv")(x)
        x = nn.leaky_relu(x, 0.01)
        if self.use_bn:
            x = nn.BatchNorm(use_running_average=not train, name="norm")(x)
        else:
            x = nn.GroupNorm(num_groups=1, name="norm")(x)
        return x


class OverlapPatchEmbedding(nn.Module):
    """log2(patch_size) stacked stride-2 conv blocks + LN (mixres_vit.py:345-366)."""

    patch_size: int
    embed_dim: int
    use_bn: bool = False

    @nn.compact
    def __call__(self, im, train: bool = False):
        n_layers = int(math.log2(self.patch_size))
        dims = [int(self.embed_dim // 2 ** (n_layers - 1 - i)) for i in range(n_layers)]
        x = im
        for i, d in enumerate(dims):
            x = DownSampleConvBlock(d, self.use_bn, name=f"conv_{i}")(x, train)
        b, h, w, c = x.shape
        x = x.reshape(b, h * w, c)
        return nn.LayerNorm(name="out_norm")(x)


class DWConvFFN(nn.Module):
    """FeedForward with an optional depthwise conv on the token grid between
    fc1 and GELU (mixres_vit.py:152-178; MRML builds it without the conv,
    mrml.py:53)."""

    hidden_dim: int
    out_dim: int
    drop: float = 0.0
    dw_conv: bool = True

    @nn.compact
    def __call__(self, x, h, w, deterministic: bool = True):
        b, n, c = x.shape
        x = nn.Dense(self.hidden_dim, name="fc1")(x)
        if self.dw_conv:
            xg = x.reshape(b, h, w, self.hidden_dim)
            xg = nn.Conv(
                self.hidden_dim, (3, 3), padding=((1, 1), (1, 1)),
                feature_group_count=self.hidden_dim, name="dwconv",
            )(xg)
            x = xg.reshape(b, n, self.hidden_dim)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.drop, deterministic=deterministic)(x)
        x = nn.Dense(self.out_dim, name="fc2")(x)
        x = nn.Dropout(self.drop, deterministic=deterministic)(x)
        return x


class ViTBlock(nn.Module):
    """Global attention + DWConv-FFN block (mixres_vit.py:283-301)."""

    dim: int
    num_heads: int
    mlp_dim: int
    drop: float = 0.0
    drop_path: float = 0.0
    layer_scale: float = 0.0
    dw_conv: bool = True

    @nn.compact
    def __call__(self, x, h, w, deterministic: bool = True):
        b, n, c = x.shape
        hh = self.num_heads
        c_ = c // hh

        y = nn.LayerNorm(name="norm1")(x)
        qkv = nn.Dense(3 * c, name="attn_qkv")(y).reshape(b, n, 3, hh, c_)
        q, k, v = [qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3)]
        attn = jnp.einsum("bhic,bhjc->bhij", q * (c_**-0.5), k)
        attn = jax.nn.softmax(attn, axis=-1)
        y = jnp.einsum("bhij,bhjc->bhic", attn, v).transpose(0, 2, 1, 3).reshape(b, n, c)
        y = nn.Dense(c, name="attn_proj")(y)

        dp = DropPath(self.drop_path)
        if self.layer_scale > 0:
            g1 = self.param("gamma1", nn.initializers.constant(self.layer_scale), (c,))
            g2 = self.param("gamma2", nn.initializers.constant(self.layer_scale), (c,))
            x = x + dp(g1 * y, deterministic)
            ffn = DWConvFFN(self.mlp_dim, c, self.drop, self.dw_conv, name="mlp")(
                nn.LayerNorm(name="norm2")(x), h, w, deterministic)
            x = x + dp(g2 * ffn, deterministic)
        else:
            x = x + dp(y, deterministic)
            ffn = DWConvFFN(self.mlp_dim, c, self.drop, self.dw_conv, name="mlp")(
                nn.LayerNorm(name="norm2")(x), h, w, deterministic)
            x = x + dp(ffn, deterministic)
        return x


class MixResViT(nn.Module):
    """Cascade stage-0 coarse ViT (mixres_vit.py:399-505).

    __call__(im, features, features_pos, upsampling_mask, tokens_per_scale)
    -> (outs dict, tokens_per_scale).  Positions carry (scale, x, y) on the
    min-patch canvas; outs use the reference naming res{n_scales-s+1}.
    """

    scale: int                      # cascade stage id (= token scale emitted)
    n_scales: int
    patch_size: int                 # this stage's patch size
    min_patch_size: int
    d_model: int
    n_layers: int
    n_heads: int
    mlp_ratio: float = 4.0
    dropout: float = 0.0
    drop_path: Sequence[float] = ()
    layer_scale: float = 0.0
    in_channels: int = 3
    first_layer: bool = True
    num_register_tokens: int = 0
    out_feature: str = "res5"

    @nn.compact
    def __call__(self, im, features, features_pos, upsampling_mask,
                 tokens_per_scale, train: bool = False,
                 k_split: Optional[int] = None):
        # k_split accepted for stage-interface uniformity; stage 0 never splits
        b, H, W, _ = im.shape
        ps = self.patch_size
        patched = (H // ps, W // ps)
        min_patched = (H // self.min_patch_size, W // self.min_patch_size)

        if self.first_layer:
            x = OverlapPatchEmbedding(ps, self.d_model, name="patch_embed")(im, train)
            pos_np = get_2dpos_of_curr_ps_in_min_ps(
                H, W, ps, self.min_patch_size, self.scale
            )
            pos = jnp.broadcast_to(jnp.asarray(pos_np)[None], (b, pos_np.shape[0], 3))
            x = x + position_embedding_sine(pos[:, :, 1:], self.d_model // 2).astype(x.dtype)
            tokens_per_scale = (pos_np.shape[0],)
        else:
            x = nn.LayerNorm(name="token_norm")(features)
            if features.shape[-1] != self.d_model:
                x = nn.Dense(self.d_model, name="token_projection")(x)
            pos = features_pos

        if self.num_register_tokens:
            reg = self.param(
                "register_tokens", nn.initializers.zeros,
                (1, self.num_register_tokens, self.d_model),
            )
            x = jnp.concatenate(
                [jnp.broadcast_to(reg, (b, self.num_register_tokens, self.d_model)), x],
                axis=1,
            )

        for i in range(self.n_layers):
            dp = self.drop_path[i] if len(self.drop_path) else 0.0
            x = ViTBlock(
                self.d_model, self.n_heads, int(self.d_model * self.mlp_ratio),
                self.dropout, dp, self.layer_scale, name=f"blocks_{i}",
            )(x, patched[0], patched[1], deterministic=not train)
        x = x[:, self.num_register_tokens:]

        outs = {
            self.out_feature: nn.LayerNorm(name="norm_out")(x),
            self.out_feature + "_pos": pos[:, :, 1:],
            self.out_feature + "_spatial_shape": patched,
            self.out_feature + "_scale": pos[:, :, 0],
            "min_spatial_shape": min_patched,
        }
        return outs, tokens_per_scale


class MixResLayer(nn.Module):
    """Cluster-attention blocks over a mixed-scale point cloud — the MRNB
    BasicLayer (mixres_neighbour.py:374-509): cluster on (x, y), run blocks,
    restore the incoming (scale-segment) order afterwards.

    ``xattn_ctx`` (the MixResNeighbourXAttn variant,
    mixres_neighbour_xattn.py:317,366-374): {'n_new': int, 'img_feat':
    (b, n_img, c)} — before EVERY block the newest-scale tokens (the trailing
    static segment in original order) pre-norm cross-attend to the stage's
    image patch features with a residual, mirroring the reference's
    per-block CrossAttention(normalize_before=True).  The reference splits
    high/low tokens with a data-dependent scale compare; here the newest
    segment is a static slice, so the split is free — only the SFC reorder
    has to be inverted around the attention."""

    dim: int
    cluster_size: int
    nbhd_size: int
    depth: int
    num_heads: int
    mlp_ratio: float
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: Sequence[float] = ()
    layer_scale: float = 0.0
    use_pallas: bool = True

    @nn.compact
    def __call__(self, pos, feat, h, w, deterministic: bool = True,
                 xattn_ctx: Optional[Dict] = None):
        """pos: (b, n, 3) (scale, x, y).  Returns (pos, feat) in the ORIGINAL
        token order (segments preserved)."""
        b, n, _ = pos.shape
        m = self.cluster_size
        xy = pos[:, :, 1:]

        global_attn = self.nbhd_size >= n
        if global_attn:
            from .layers import rel_pos_features

            rel = xy[:, None, :, :] - xy[:, :, None, :]
            ctx = {"fused": False, "rel_feat5": rel_pos_features(rel)}
            feat_s = feat
            rank = None
        else:
            k = int(math.ceil(n / float(m)))
            nnc = min(int(round(self.nbhd_size / float(m))), k)
            span = m if k < n else 1
            if k == n:
                xy_s, centers = xy, xy
                rank = None
                feat_s = feat
            else:
                xy_s, centers, _, _, pos_ranking = space_filling_cluster(
                    xy, m, h, w, no_reorder=False
                )
                rank = pos_ranking[..., 0]
                feat_s = _gather_by_idx(feat, rank)
            nc = knn(xy_s, centers, nnc)
            from ..ops.dispatch import fused_attention_available

            # same gating as AFF BasicLayer: the fused block-sparse kernel
            # needs contiguous cluster_size-token spans aligned to 128-blocks;
            # rel-pos features are (x, y)-only here too, so the kernel's
            # on-the-fly bias matches the gather path's rel_feat5 exactly
            fused = (
                self.use_pallas
                and fused_attention_available()
                and n % 128 == 0
                and span > 0 and 128 % span == 0
            )
            if fused:
                ctx = {"fused": True, "pos": xy_s, "nc": nc,
                       "cluster_size": span}
            else:
                member_idx, cluster_mask, rel_feat5 = _nbhd_from_clusters(
                    xy_s, nc, span, n
                )
                ctx = {
                    "fused": False,
                    "member_idx": member_idx,
                    "cluster_mask": cluster_mask,
                    "rel_feat5": rel_feat5,
                }

        inv = None
        if rank is not None:
            # inverse of the curve reorder (needed per-block for xattn and
            # once at the end to restore scale-segment order)
            binv = jnp.broadcast_to(jnp.arange(b)[:, None], (b, n))
            inv = jnp.zeros((b, n), jnp.int32).at[binv, rank].set(
                jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (b, n))
            )

        for i in range(self.depth):
            if xattn_ctx is not None:
                from .transformer_decoder import MultiheadAttention

                n_new = xattn_ctx["n_new"]
                img_feat = xattn_ctx["img_feat"]
                f_orig = feat_s if inv is None else _gather_by_idx(feat_s, inv)
                new_tok = f_orig[:, -n_new:]
                q = nn.LayerNorm(name=f"x_attn_norm_{i}")(new_tok)
                new_tok = new_tok + MultiheadAttention(
                    self.dim, self.num_heads, name=f"x_attn_{i}"
                )(q, img_feat, img_feat, deterministic=deterministic)
                f_orig = jnp.concatenate([f_orig[:, :-n_new], new_tok], axis=1)
                feat_s = f_orig if rank is None else _gather_by_idx(f_orig, rank)
            feat_s = ClusterTransformerBlock(
                dim=self.dim,
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                drop=self.drop,
                attn_drop=self.attn_drop,
                drop_path=self.drop_path[i] if len(self.drop_path) else 0.0,
                layer_scale=self.layer_scale,
                use_pallas=self.use_pallas,
                name=f"blocks_{i}",
            )(feat_s, ctx, global_attn, deterministic)

        if inv is not None:
            # invert the curve reorder so scale segments stay contiguous
            feat_s = _gather_by_idx(feat_s, inv)
        return pos, feat_s


class MixResNeighbour(nn.Module):
    """Cascade stages >= 1 (mixres_neighbour.py:520-1005): STE token split,
    raw-image feature injection, mixed-scale cluster attention."""

    scale: int
    n_scales: int
    patch_sizes: Sequence[int]      # patch size per scale 0..scale
    min_patch_size: int
    d_model: int
    n_layers: int
    n_heads: int
    cluster_size: int = 8
    nbhd_size: int = 48
    mlp_ratio: float = 4.0
    split_ratio: int = 4
    upscale_ratio: float = 0.25
    dropout: float = 0.0
    attn_drop: float = 0.0
    drop_path: Sequence[float] = ()
    layer_scale: float = 0.0
    in_channels: int = 256
    keep_old_scale: bool = True
    first_layer: bool = False
    do_upsample: bool = True
    cross_attend_image: bool = False  # MixResNeighbourXAttn: newest-scale
    # tokens cross-attend to their image patch features before EVERY cluster
    # block (mixres_neighbour_xattn.py:317,366-374), memory built once per
    # stage (:767-792); consumed as xattn_ctx inside MixResLayer

    def _split_tokens(self, feat, pos, scores, k_split):
        """Top-k split selection with straight-through gradients
        (divide_tokens_to_split_and_keep, mixres_neighbour.py:699-733)."""
        b, n, c = feat.shape
        order = jnp.argsort(scores, axis=1)           # ascending
        bottom = order[:, : n - k_split]
        top = order[:, n - k_split:]

        soft = jax.nn.softmax(scores, axis=1)
        ste_split = soft - jax.lax.stop_gradient(soft)          # 0 + grads
        ste_keep = -ste_split
        feat_split = feat * (1.0 + ste_split)[..., None]
        feat_keep = feat * (1.0 + ste_keep)[..., None]

        tok_split = _gather_by_idx(feat_split, top)
        tok_keep = _gather_by_idx(feat_keep, bottom)
        pos_split = _gather_by_idx(pos, top)
        pos_keep = _gather_by_idx(pos, bottom)
        return tok_split, pos_split, tok_keep, pos_keep

    def _split_pos(self, pos_to_split):
        """4-way child positions (split_pos, mixres_neighbour.py:766-782)."""
        r = 2 ** (self.n_scales - self.scale - 1)
        x = pos_to_split[:, :, 1]
        y = pos_to_split[:, :, 2]
        children = jnp.stack(
            [
                jnp.stack([x, y], -1),
                jnp.stack([x + r, y], -1),
                jnp.stack([x, y + r], -1),
                jnp.stack([x + r, y + r], -1),
            ],
            axis=2,
        )                                              # (b, n, 4, 2)
        b, n = x.shape
        children = children.reshape(b, n * 4, 2)
        sc = jnp.full((b, n * 4, 1), float(self.scale), children.dtype)
        return jnp.concatenate([sc, children], axis=2)

    @nn.compact
    def __call__(self, im, features, features_pos, upsampling_mask,
                 tokens_per_scale, train: bool = False,
                 k_split: Optional[int] = None):
        b, H, W, _ = im.shape
        ps = self.patch_sizes[self.scale]
        min_patched = (H // self.min_patch_size, W // self.min_patch_size)
        xattn_ctx = None

        if self.first_layer:
            x = OverlapPatchEmbedding(ps, self.d_model, use_bn=True,
                                      name="patch_embed")(im, train)
            pos_np = get_2dpos_of_curr_ps_in_min_ps(
                H, W, ps, self.min_patch_size, self.scale
            )
            pos = jnp.broadcast_to(jnp.asarray(pos_np)[None], (b, pos_np.shape[0], 3))
            x = x + position_embedding_sine(pos[:, :, 1:], self.d_model // 2).astype(x.dtype)
            tokens_per_scale = (pos_np.shape[0],)
        elif self.do_upsample:
            old_scale = self.scale - 1
            # scale-ordered static segments: old scales | current scale
            n_curr = tokens_per_scale[-1]
            n_old = sum(tokens_per_scale[:-1])
            feat_old = features[:, :n_old]
            pos_old = features_pos[:, :n_old]
            feat_curr = features[:, n_old:]
            pos_curr = features_pos[:, n_old:]
            # the upsampling mask may cover the full stream (MaskFiner
            # cascade: decoder disagreement over all tokens) or only the
            # newest scale segment (UpDownBackbone: reference
            # mixres_up_down.py:176 scores all_feat[0] only)
            if upsampling_mask.shape[1] == n_curr:
                mask_curr = upsampling_mask
            else:
                mask_curr = upsampling_mask[:, n_old:]

            if k_split is None:
                k_split = max(1, int(n_curr * self.upscale_ratio))
            k_split = min(k_split, n_curr)
            tok_split, pos_split, tok_keep, pos_keep = self._split_tokens(
                feat_curr, pos_curr, mask_curr, k_split
            )

            up_feat = jnp.repeat(tok_split[:, :, None, :], self.split_ratio, axis=2)
            rel_emb = self.param(
                "rel_pos_emb", nn.initializers.normal(0.02),
                (1, 1, self.split_ratio, tok_split.shape[-1]),
            )
            scale_emb = self.param(
                "scale_emb", nn.initializers.normal(0.02),
                (1, 1, 1, tok_split.shape[-1]),
            )
            up_feat = (up_feat + rel_emb + scale_emb).reshape(
                b, k_split * self.split_ratio, -1
            )
            up_pos = self._split_pos(pos_split)

            up_feat = self._add_high_res_feat(up_feat, up_pos[:, :, 1:], im)

            if self.keep_old_scale:
                parts_f = [feat_old, tok_keep, tok_split, up_feat]
                parts_p = [pos_old, pos_keep, pos_split, up_pos]
                tps = tokens_per_scale[:-1] + (n_curr,) + (k_split * self.split_ratio,)
            else:
                parts_f = [feat_old, tok_keep, up_feat]
                parts_p = [pos_old, pos_keep, up_pos]
                tps = tokens_per_scale[:-1] + (n_curr - k_split,) + (
                    k_split * self.split_ratio,
                )
            x = jnp.concatenate(parts_f, axis=1)
            pos = jnp.concatenate(parts_p, axis=1)
            tokens_per_scale = tps

            x = nn.LayerNorm(name="token_norm")(x)
            if x.shape[-1] != self.d_model:
                x = nn.Dense(self.d_model, name="token_projection")(x)

            if self.cross_attend_image:
                # MixResNeighbourXAttn memory: per-new-token raw-pixel patch
                # features + sine pos emb (get_image_features,
                # mixres_neighbour_xattn.py:767-792); built once per stage
                # and cross-attended by the newest tokens in EVERY block
                # (xattn_ctx consumed inside MixResLayer)
                n_new = tokens_per_scale[-1]
                img_feat = self._image_patch_features(pos[:, -n_new:, 1:], im)
                img_feat = img_feat + position_embedding_sine(
                    pos[:, -n_new:, 1:], self.d_model // 2
                ).astype(img_feat.dtype)
                xattn_ctx = {"n_new": n_new, "img_feat": img_feat}
        else:
            x = nn.LayerNorm(name="token_norm")(features)
            if features.shape[-1] != self.d_model:
                x = nn.Dense(self.d_model, name="token_projection")(x)
            pos = features_pos

        pos, x = MixResLayer(
            dim=self.d_model,
            cluster_size=self.cluster_size,
            nbhd_size=self.nbhd_size,
            depth=self.n_layers,
            num_heads=self.n_heads,
            mlp_ratio=self.mlp_ratio,
            drop=self.dropout,
            attn_drop=self.attn_drop,
            drop_path=tuple(self.drop_path),
            layer_scale=self.layer_scale,
            name="layers",
        )(pos, x, min_patched[0], min_patched[1], deterministic=not train,
          xattn_ctx=xattn_ctx)

        x = nn.LayerNorm(name="norm_out")(x)

        # emit per-scale outputs from the static segments
        outs: Dict = {"min_spatial_shape": min_patched}
        start = 0
        for s, cnt in enumerate(tokens_per_scale):
            out_idx = self.n_scales - s + 1
            patched = (H // self.patch_sizes[s], W // self.patch_sizes[s])
            seg = slice(start, start + cnt)
            outs[f"res{out_idx}"] = x[:, seg]
            outs[f"res{out_idx}_pos"] = pos[:, seg, 1:]
            outs[f"res{out_idx}_scale"] = pos[:, seg, 0]
            outs[f"res{out_idx}_spatial_shape"] = patched
            start += cnt
        return outs, tokens_per_scale

    def _image_patch_features(self, pos_xy, im):
        """Patch-embedded image features at the given token positions
        (queries for the XAttn variant)."""
        b, n, _ = pos_xy.shape
        ps = self.patch_sizes[self.scale]
        patched = nn.Conv(
            self.d_model, (ps, ps), strides=(ps, ps), name="x_attn_patcher"
        )(im)
        hw = patched.shape[1:3]
        step = ps // self.min_patch_size
        cx = jnp.clip((pos_xy[..., 0] / step).astype(jnp.int32), 0, hw[1] - 1)
        cy = jnp.clip((pos_xy[..., 1] / step).astype(jnp.int32), 0, hw[0] - 1)
        flat = patched.reshape(b, hw[0] * hw[1], self.d_model)
        idx = cy * hw[1] + cx
        return jnp.take_along_axis(flat, idx[..., None], axis=1)

    def _add_high_res_feat(self, tokens, pos_xy, im):
        """Project the raw image patch under each new token into its feature
        (add_high_res_feat, mixres_neighbour.py:785-806)."""
        b, n, _ = pos_xy.shape
        ps = self.patch_sizes[self.scale]
        H, W = im.shape[1:3]
        pix = pos_xy * self.min_patch_size                    # pixel coords
        dy, dx = np.meshgrid(np.arange(ps), np.arange(ps), indexing="ij")
        offs = jnp.asarray(np.stack([dx.reshape(-1), dy.reshape(-1)], 1), pix.dtype)
        pp = pix[:, :, None, :] + offs[None, None]            # (b, n, ps*ps, 2)
        xg = jnp.clip(pp[..., 0].astype(jnp.int32), 0, W - 1)
        yg = jnp.clip(pp[..., 1].astype(jnp.int32), 0, H - 1)
        flat = im.reshape(b, H * W, 3)
        idx = (yg * W + xg).reshape(b, -1)
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1)
        vals = vals.reshape(b, n, ps * ps * 3)

        input_dim = max(self.in_channels, 3 * ps * ps)
        y = nn.Dense(input_dim, name="image_patch_projection")(vals)
        y = nn.gelu(y, approximate=False)
        y = nn.LayerNorm(name="high_res_norm1")(y)
        y = Mlp(self.in_channels, self.in_channels, name="high_res_mlp")(y)
        y = nn.LayerNorm(name="high_res_norm2")(y)
        return tokens + y

