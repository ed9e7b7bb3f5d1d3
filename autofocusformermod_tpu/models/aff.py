"""AutoFocusFormer backbone — point-cloud transformer with adaptive downsampling.

TPU-native rebuild of reference mask2former/modeling/backbone/aff.py.  Feature
maps are (feat: b x n x c, pos: b x n x 2) point clouds; every stage:

  1. balanced clustering along a space-filling curve (geometry/cluster.py)
  2. KNN of cluster centers -> fixed-width nbhd index tensor (b, n, nbhd)
  3. ``depth`` ClusterTransformerBlocks: local attention over the gathered
     neighborhood with a learned rel-pos bias and a learnable "blank" token
     acting as an attention sink (aff.py:53-163)
  4. ClusterMerging: adaptive downsampling — grid prior + learned importance,
     reserved coarse-grid tokens forced to survive, top-25% keep, PointConv
     merge (aff.py:245-365)

Static-shape design (the intellectual core of the TPU port; SURVEY.md section 7):
n, k=ceil(n/m), nbhd, keep_num=int(n*ds_rate) and reserve_num are all
compile-time constants derived from the crop size.  On-grid stage-1 clustering
is executed *eagerly at trace time* on the constant pixel grid, so the whole
stage-1 neighborhood assembly folds into compile-time constants — strictly
better than the reference's runtime caching (aff.py:461-467).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from ..geometry.cluster import space_filling_cluster
from ..geometry.knn import knn
from ..ops.clusten import cluster_av, cluster_qk, cluster_wf
from ..ops.dispatch import fused_attention_available
from .layers import DropPath, Mlp, rel_pos_features


def _gather_by_idx(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """x: (b, n, c); idx: (b, n_) -> (b, n_, c)."""
    from ..ops.gather import take_rows

    return take_rows(x, idx)


from ..geometry.cluster import nbhd_from_cluster_ids as _nbhd_from_clusters


def _nbhd_from_clusters_at(pos, query_pos, nc, span: int, n: int):
    """Neighborhoods centered at arbitrary query positions (the kept tokens
    after downsampling)."""
    return _nbhd_from_clusters(pos, nc, span, n, query_pos=query_pos)


class ClusterAttention(nn.Module):
    """Local attention over each token's gathered neighborhood with learned
    relative-position bias and a blank attention-sink token (aff.py:53-163)."""

    dim: int
    num_heads: int
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    use_pallas: bool = True

    @nn.compact
    def __call__(self, feat, ctx, global_attn, deterministic: bool = True):
        """
        feat - (b, n, c); ctx - neighborhood context dict:
          fused path : {'fused': True, 'pos', 'nc', 'cluster_size'}
          gather path: {'fused': False, 'member_idx', 'cluster_mask',
                        'rel_feat5'}
        global_attn - static bool
        """
        b, n, c = feat.shape
        h = self.num_heads
        assert c % h == 0, (
            f"dim {c} not divisible by num_heads {h} — check EMBED_DIM/NUM_HEADS"
        )
        c_ = c // h
        scale = c_**-0.5

        q = nn.Dense(self.dim, name="q")(feat) * scale
        kv = nn.Dense(2 * self.dim, name="kv")(feat)

        blank_k = self.param("blank_k", nn.initializers.normal(1.0), (self.dim,))
        blank_v = self.param("blank_v", nn.initializers.normal(1.0), (self.dim,))
        pos_embed = nn.Dense(h, name="pos_embed")

        q = q.reshape(b, n, h, c_).transpose(0, 2, 1, 3)      # (b, h, n, c_)
        # the fused kv projection interleaves k/v PER HEAD: columns are
        # (h, 2, c_)-ordered, not (2, h, c_) (ref aff.py:115 kv.view(b,n,h,2,c_))
        # — checkpoint parity depends on matching this split
        kv = kv.reshape(b, n, h, 2, c_).transpose(3, 0, 2, 1, 4)
        key, v = kv[0], kv[1]                                  # (b, h, n, c_)

        if not global_attn and ctx.get("fused", False):
            from ..ops.pallas.local_attn import sfc_cluster_attention

            # recover the Dense(5 -> h) weights through two tiny probes so the
            # parameter tree stays identical to the gather path
            b5 = pos_embed(jnp.zeros((1, 5)))[0]               # (h,)
            w5 = (pos_embed(jnp.eye(5)) - b5[None, :]).T       # (h, 5)
            # the kernel is fp32-in/fp32-out (dots run at bf16 MXU precision
            # internally); cast bf16 activations up at the boundary
            dt = q.dtype
            feat_out, blank_prob = sfc_cluster_attention(
                q.astype(jnp.float32), key.astype(jnp.float32),
                v.astype(jnp.float32), ctx["pos"], ctx["nc"],
                w5.astype(jnp.float32), b5.astype(jnp.float32),
                blank_k.reshape(h, c_).astype(jnp.float32),
                ctx["cluster_size"],
            )
            feat_out = feat_out.astype(dt)
            blank_prob = blank_prob.astype(dt)
            feat = feat_out.transpose(0, 2, 1, 3).reshape(b, n, c)
            feat = feat + (blank_prob * blank_v.reshape(1, h, 1, c_)).transpose(
                0, 2, 1, 3
            ).reshape(b, n, c)
        else:
            # learned rel-pos bias: Linear(5 -> heads) applied to the features
            # (replaces the reference's full-table forward + gather,
            # aff.py:126-132)
            # rel_feat5 is fp32 geometry; cast the bias down so it cannot
            # promote the bf16 attention path under mixed precision
            pos_bias = pos_embed(ctx["rel_feat5"]).astype(feat.dtype)  # (b, n, m, h)
            blank_attn = jnp.einsum(
                "bhnc,hc->bhn", q, blank_k.reshape(h, c_)
            )[..., None]  # (b, h, n, 1)

            member_idx = ctx.get("member_idx")
            cluster_mask = ctx.get("cluster_mask")
            if global_attn:
                attn = jnp.einsum("bhnc,bhmc->bhnm", q, key)
                mask = None
            else:
                attn = cluster_qk(q, key, member_idx)         # (b, h, n, m)
                mask = None if cluster_mask is None else cluster_mask.reshape(b, 1, n, -1)

            attn = attn + pos_bias.transpose(0, 3, 1, 2)
            if mask is not None:
                attn = attn + ((1 - mask) * (-100.0)).astype(attn.dtype)

            attn = jnp.concatenate([attn, blank_attn], axis=-1)
            attn = jax.nn.softmax(attn, axis=-1)
            attn = nn.Dropout(self.attn_drop, deterministic=deterministic)(attn)
            blank_prob = attn[..., -1:]
            attn = attn[..., :-1]

            if global_attn:
                feat = jnp.einsum("bhnm,bhmc->bhnc", attn, v)
            else:
                feat = cluster_av(attn, v, member_idx)
            feat = feat + blank_prob * blank_v.reshape(1, h, 1, c_)
            feat = feat.transpose(0, 2, 1, 3).reshape(b, n, c)

        feat = nn.Dense(self.dim, name="proj")(feat)
        feat = nn.Dropout(self.proj_drop, deterministic=deterministic)(feat)
        return feat


class ClusterTransformerBlock(nn.Module):
    """Pre-LN attention + FFN block with optional layer scale (aff.py:166-238)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 2.0
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    layer_scale: float = 0.0
    use_pallas: bool = True

    @nn.compact
    def __call__(self, feat, ctx, global_attn, deterministic: bool = True):
        shortcut = feat
        feat = nn.LayerNorm(name="norm1")(feat)
        feat = ClusterAttention(
            self.dim, self.num_heads, self.attn_drop, self.drop,
            use_pallas=self.use_pallas, name="attn",
        )(feat, ctx, global_attn, deterministic)

        dp = DropPath(self.drop_path)
        if self.layer_scale > 0.0:
            gamma1 = self.param(
                "gamma1", nn.initializers.constant(self.layer_scale), (self.dim,)
            )
            gamma2 = self.param(
                "gamma2", nn.initializers.constant(self.layer_scale), (self.dim,)
            )
            feat = shortcut + dp(gamma1 * feat, deterministic)
            feat_mlp = Mlp(int(self.dim * self.mlp_ratio), self.dim, self.drop, name="mlp")(
                nn.LayerNorm(name="norm2")(feat), deterministic
            )
            feat = feat + dp(gamma2 * feat_mlp, deterministic)
        else:
            feat = shortcut + dp(feat, deterministic)
            feat_mlp = Mlp(int(self.dim * self.mlp_ratio), self.dim, self.drop, name="mlp")(
                nn.LayerNorm(name="norm2")(feat), deterministic
            )
            feat = feat + dp(feat_mlp, deterministic)
        return feat


class ClusterMerging(nn.Module):
    """Adaptive downsampling (aff.py:245-365): grid prior (+adaptive stride via
    1-NN distance), learned importance, reserved coarse-grid tokens, static
    top-k keep, PointConv merge over the kept tokens' neighborhoods."""

    dim: int
    out_dim: int
    alpha: float = 4.0
    ds_rate: float = 0.25
    reserve_on: bool = True
    inner_ch: int = 4

    @nn.compact
    def __call__(self, pos, feat, nc, learned_prob, stride, reserve_num,
                 span: int):
        b, n, c = feat.shape
        d = pos.shape[2]
        m = nc.shape[-1] * span
        keep_num = int(n * self.ds_rate)

        pos_int = pos.astype(jnp.int32)

        # grid prior (aff.py:296-302)
        if stride == 2:
            grid_prob = jnp.all(pos_int % stride == 0, axis=-1).astype(jnp.float32)
        else:
            _, min_dist = knn(pos, pos, 2, return_dist=True)
            min_dist = min_dist[:, :, 1]
            ada_stride = 2.0 ** (jnp.ceil(jnp.log2(jnp.maximum(min_dist, 1e-6))) + 1)
            grid_prob = jnp.all(
                pos_int % ada_stride[..., None].astype(jnp.int32) == 0, axis=-1
            ).astype(jnp.float32)

        final_prob = grid_prob
        if learned_prob is not None:
            lp_flat = jax.lax.stop_gradient(learned_prob).reshape(b, n)
            final_prob = final_prob + lp_flat * self.alpha

        if self.reserve_on:
            reserve_mask = jnp.all(pos_int % (stride * 2) == 0, axis=-1).astype(jnp.float32)
            final_prob = final_prob + reserve_mask * (-100.0)
            sample_num = keep_num - reserve_num
        else:
            sample_num = keep_num

        _, sample_idx = jax.lax.top_k(final_prob, sample_num)  # (b, sample_num)

        if self.reserve_on:
            # top_k over the 0/1 mask returns the reserve tokens in ascending
            # index order — equivalent to the reference's nonzero() (aff.py:323),
            # assuming exactly reserve_num reserved tokens (invariant: the
            # coarse grid survives every previous downsample)
            _, reserve_idx = jax.lax.top_k(reserve_mask, reserve_num)
            idx = jnp.concatenate([sample_idx, reserve_idx], axis=1)
        else:
            idx = sample_idx
        idx = idx.astype(jnp.int32)  # (b, keep_num)

        from ..ops.gather import take_rows

        new_pos = _gather_by_idx(pos, idx)
        nc_k = take_rows(nc, idx)                                # (b, n', nnc)
        # rebuild the kept tokens' neighborhoods only (4x smaller than full-n)
        member_idx_k, mask_k, rel5_k = _nbhd_from_clusters_at(
            pos, new_pos, nc_k, span, n
        )

        from .layers import WeightNet

        weights = WeightNet(self.inner_ch, name="weight_net")(rel5_k)  # (b, n', m, ic)

        if mask_k is not None:
            weights = weights * mask_k[..., None]
        if learned_prob is not None:
            # fold the importance score into the features instead of gathering
            # it per (kept-token, neighbor): Σ_m w·mask·lp[member]·feat[member]
            # = Σ_m w·mask·(lp⊙feat)[member].  The elementwise (b, n, 1)x
            # (b, n, c) product fuses into the existing cluster_wf feature
            # gather, where the old width-1 row gather of lp was the single
            # most expensive gather in the forward (6.3 ms at stage 0,
            # 512x512 batch 4 — narrow 1-lane rows gather ~4x slower per row
            # than wide ones).  Gradient to prob_net flows through the feat
            # product with the same value.
            feat = feat * learned_prob.astype(feat.dtype)

        # weights carry fp32 geometry; cast down so the big gather-einsum and
        # everything after it stay in the compute dtype under mixed precision
        feat = cluster_wf(weights.astype(feat.dtype), feat, member_idx_k).reshape(
            b, keep_num, -1
        )
        feat = nn.LayerNorm(name="norm")(feat)
        feat = nn.Dense(self.out_dim, name="linear")(feat)
        return new_pos, feat


class BasicLayer(nn.Module):
    """One AFF stage: cluster -> neighborhood assembly -> blocks -> downsample
    (aff.py:368-507)."""

    dim: int
    out_dim: Optional[int]
    cluster_size: int
    nbhd_size: int
    depth: int
    num_heads: int
    mlp_ratio: float
    alpha: float = 4.0
    ds_rate: float = 0.25
    reserve_on: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: Sequence[float] = ()
    layer_scale: float = 0.0
    has_downsample: bool = True
    use_pallas: bool = True

    @nn.compact
    def __call__(self, pos, feat, h, w, on_grid, stride, deterministic: bool = True):
        """pos may be a *concrete* (trace-time constant) array when on_grid."""
        b = feat.shape[0]
        n = pos.shape[1]
        c = feat.shape[2]
        d = 2
        m = self.cluster_size

        global_attn = self.nbhd_size >= n
        if not global_attn:
            k = int(math.ceil(n / float(m)))
            nnc = min(int(round(self.nbhd_size / float(m))), k)
            span = m if k < n else 1  # k == n: every token is its own cluster
            nbhd_size = span * nnc

        if global_attn:
            nc = None
            rel = pos[:, None, :, :] - pos[:, :, None, :]  # (b, n, n, 2): pos_j - pos_i
            ctx = {"fused": False, "rel_feat5": rel_pos_features(rel)}
            pos = jnp.asarray(jnp.broadcast_to(pos, (b, n, d)))
        else:
            if k == n:
                cluster_mean_pos = pos
            else:
                pos, cluster_mean_pos, _, _, pos_ranking = space_filling_cluster(
                    pos, m, h, w, no_reorder=False
                )
                # reorder features along the curve; broadcast when the
                # clustering was computed on a single constant grid
                rank = pos_ranking[..., 0]
                if rank.shape[0] != b:
                    rank = jnp.broadcast_to(rank, (b, n))
                feat = _gather_by_idx(feat, rank)

            nc = knn(pos, cluster_mean_pos, nnc)  # (bp, n, nnc) cluster ids
            if nc.shape[0] != b:
                nc = jnp.broadcast_to(nc, (b, n, nnc))
                pos = jnp.broadcast_to(pos, (b, n, d))
            pos = jnp.asarray(pos)

            fused = (
                self.use_pallas
                and fused_attention_available()
                and n % 128 == 0
                and 128 % span == 0
            )
            if fused:
                ctx = {"fused": True, "pos": pos, "nc": nc, "cluster_size": span}
            else:
                member_idx, cluster_mask, rel_feat5 = _nbhd_from_clusters(
                    pos, nc, span, n
                )
                ctx = {
                    "fused": False,
                    "member_idx": member_idx,
                    "cluster_mask": cluster_mask,
                    "rel_feat5": rel_feat5,
                }

        for i in range(self.depth):
            feat = ClusterTransformerBlock(
                dim=self.dim,
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                drop=self.drop,
                attn_drop=self.attn_drop,
                drop_path=self.drop_path[i] if len(self.drop_path) else 0.0,
                layer_scale=self.layer_scale,
                use_pallas=self.use_pallas,
                name=f"blocks_{i}",
            )(feat, ctx, global_attn, deterministic)

        if self.has_downsample:
            if global_attn:
                # The reference hits the same wall: ClusterMerging requires
                # member_idx, which is None under global attention
                # (ref aff.py:442-444, 276-365). Configure larger inputs or
                # smaller nbhd_size instead.
                raise ValueError(
                    "AFF stage with downsampling needs n > nbhd_size "
                    f"(got n={n}, nbhd_size={self.nbhd_size})"
                )
            learned_prob = jax.nn.sigmoid(nn.Dense(1, name="prob_net")(feat))
            reserve_num = math.ceil(h / (stride * 2)) * math.ceil(w / (stride * 2))
            pos_down, feat_down = ClusterMerging(
                dim=self.dim,
                out_dim=self.out_dim,
                alpha=self.alpha,
                ds_rate=self.ds_rate,
                reserve_on=self.reserve_on,
                name="downsample",
            )(pos, feat, nc, learned_prob, stride, reserve_num, span)
            return pos, feat, pos_down, feat_down
        return pos, feat, pos, feat


class PatchEmbed(nn.Module):
    """Two stride-2 3x3 convs with BN+GELU between (aff.py:513-565).
    Input NHWC (TPU-native); output token features + integer grid positions."""

    embed_dim: int = 32
    patch_norm: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        # torch Conv2d(k=3, s=2, p=1) == explicit ((1,1),(1,1)) padding
        x = nn.Conv(
            self.embed_dim // 2, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
            name="proj1",
        )(x)
        x = nn.BatchNorm(use_running_average=not train, name="bn")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Conv(
            self.embed_dim, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
            name="proj2",
        )(x)
        b, h, w, c = x.shape
        x = x.reshape(b, h * w, c)
        if self.patch_norm:
            x = nn.LayerNorm(name="norm")(x)
        # constant integer grid positions, built in numpy so downstream
        # stage-1 clustering folds at trace time
        ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        pos = np.stack([xs, ys], axis=2).reshape(1, h * w, 2).astype(np.float32)
        return pos, x, h, w


class AFF(nn.Module):
    """The 4-stage AutoFocusFormer backbone (aff.py:568-686).

    Returns {"res2".."res5": feat, "res*_pos": pos, "res*_spatial_shape": (h,w)}.
    """

    embed_dim: Sequence[int] = (32, 128, 256, 512)
    cluster_size: int = 8
    nbhd_size: Sequence[int] = (48, 48, 48, 48)
    alpha: float = 4.0
    ds_rate: float = 0.25
    reserve_on: bool = True
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    mlp_ratio: float = 2.0
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    patch_norm: bool = True
    layer_scale: float = 0.0
    out_indices: Sequence[int] = (0, 1, 2, 3)
    use_pallas: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False,
                 _profile_upto: Optional[int] = None) -> Dict[str, Any]:
        """``_profile_upto`` truncates the forward after the given number of
        stages (0 = patch embed only) — tools/profile_backbone.py only."""
        num_layers = len(self.depths)
        pos_np, feat, h, w = PatchEmbed(
            self.embed_dim[0], self.patch_norm, name="patch_embed"
        )(x, train)
        if _profile_upto == 0:
            return {"feat": feat}
        feat = nn.Dropout(self.drop_rate, deterministic=not train)(feat)
        spatial_shape = (h, w)

        dpr = list(np.linspace(0, self.drop_path_rate, sum(self.depths)))

        outs: Dict[str, Any] = {}
        pos = pos_np  # concrete at stage 1 -> constant-folded clustering
        for i in range(num_layers):
            depth_lo = sum(self.depths[:i])
            layer = BasicLayer(
                dim=int(self.embed_dim[i]),
                out_dim=int(self.embed_dim[i + 1]) if i < num_layers - 1 else None,
                cluster_size=self.cluster_size,
                nbhd_size=self.nbhd_size[i],
                depth=self.depths[i],
                num_heads=self.num_heads[i],
                mlp_ratio=self.mlp_ratio,
                alpha=self.alpha,
                ds_rate=self.ds_rate,
                reserve_on=self.reserve_on,
                drop=self.drop_rate,
                attn_drop=self.attn_drop_rate,
                drop_path=tuple(dpr[depth_lo : depth_lo + self.depths[i]]),
                layer_scale=self.layer_scale,
                has_downsample=i < num_layers - 1,
                use_pallas=self.use_pallas,
                name=f"layers_{i}",
            )
            pos_out, x_out, pos, feat = layer(
                pos, feat, h=h, w=w, on_grid=i == 0, stride=2 ** (i + 1),
                deterministic=not train,
            )
            if i in self.out_indices:
                x_out = nn.LayerNorm(name=f"norm{i}")(x_out)
                outs[f"res{i + 2}"] = x_out
                outs[f"res{i + 2}_pos"] = pos_out
                outs[f"res{i + 2}_spatial_shape"] = spatial_shape
            if _profile_upto is not None and i + 1 >= _profile_upto:
                outs["feat"] = feat
                return outs
        return outs


def aff_from_config(cfg, use_pallas: Optional[bool] = None) -> AFF:
    """Build AFF from a CfgNode (mirrors AutoFocusFormer.from cfg, aff.py:689-743)."""
    a = cfg.MODEL.AFF
    return AFF(
        embed_dim=tuple(a.EMBED_DIM),
        cluster_size=a.CLUSTER_SIZE,
        nbhd_size=tuple(a.NBHD_SIZE),
        alpha=a.ALPHA,
        ds_rate=a.DS_RATE,
        reserve_on=a.RESERVE,
        depths=tuple(a.DEPTHS),
        num_heads=tuple(a.NUM_HEADS),
        mlp_ratio=a.MLP_RATIO,
        drop_rate=a.DROP_RATE,
        attn_drop_rate=a.ATTN_DROP_RATE,
        drop_path_rate=a.DROP_PATH_RATE,
        patch_norm=a.PATCH_NORM,
        layer_scale=a.LAYER_SCALE,
        use_pallas=cfg.TPU.USE_PALLAS if use_pallas is None else use_pallas,
    )
