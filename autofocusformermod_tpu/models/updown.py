"""UpDownBackbone — U-Net-style composition of per-stage MixRes backbones.

Rebuild of reference mask2former/modeling/backbone/mixres_up_down.py: a chain
of 2*n_scales-1 MixRes stages running scales 0..n-1..0.  The down side splits
tokens (MixResNeighbour upsampling); the up side re-processes progressively
coarser segment prefixes of the token stream with residual channel-concat
from the mirrored down stage (reference :154-160: for up stage t the residual
is ``outs[f][-((t - n + 1) * 2 + 2)]`` = down stage ``2n - 2 - t``; its input
channel count ``EMBED_DIM[t-1] + EMBED_DIM[2n-2-t]`` matches reference
convnextv2.py:254).  Per-resolution segments keep identical token sets across
stages because KEEP_OLD_SCALE leaves split parents in their scale segment, so
the mirrored residual concat is shape-correct *by construction* — enforced
with an assert, never silently skipped.

The backbone owns per-scale 3-layer ``MLPDeepNorm`` upsamplers producing the
upsampling scores over the NEWEST scale segment (reference :176:
``self.upsamplers[scale](all_feat[0])`` — all_feat[0] is the newest
resolution) and mixes in GT-edge oracle masks with probability
``oracle_ratio`` during training (:170-186).

OracleTeacherBackbone (mixres_oracle_teacher.py:188-) is the same composition
where the score prediction is trained against the oracle with MSE — the
supervision pairs are exposed as ``upsampling_mask_pred_*`` /
``upsampling_mask_oracle_*`` and consumed by
``models.oracle.upsampling_mse_loss``.

Up-side stage types follow MODEL.MR.NAME: "MixResNeighbour" stages run
cluster attention (MixResLayer), "MixResViT" stages run global attention
(same layer with nbhd >= n).  All shapes static.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
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
    features plus upsampling_mask_{pred,oracle,pos}_{s} supervision pairs.

    All per-stage sequences have length 2*n_scales-1 (the cfg.MODEL.MR lists
    of the reference updown configs, e.g. EMBED_DIM [512,256,128,64,128,256,
    512])."""

    n_scales: int = 4
    names: Sequence[str] = (
        "MixResViT", "MixResNeighbour", "MixResNeighbour", "MixResNeighbour",
        "MixResNeighbour", "MixResNeighbour", "MixResViT",
    )
    patch_sizes: Sequence[int] = (32, 16, 8, 4, 8, 16, 32)
    embed_dims: Sequence[int] = (512, 256, 128, 64, 128, 256, 512)
    depths: Sequence[int] = (1, 1, 1, 4, 4, 16, 4)
    num_heads: Sequence[int] = (16, 8, 4, 2, 4, 8, 16)
    mlp_ratios: Sequence[float] = (3.0,) * 7
    cluster_sizes: Sequence[int] = (8,) * 7
    nbhd_sizes: Sequence[int] = (48,) * 7
    upscale_ratios: Sequence[float] = (0.0, 0.85, 0.7, 0.6, 0.0, 0.0, 0.0)
    split_ratios: Sequence[int] = (4,) * 7
    drop_rates: Sequence[float] = (0.0,) * 7
    attn_drop_rates: Sequence[float] = (0.0,) * 7
    drop_path_rate: float = 0.0
    layer_scale: float = 0.0
    num_register_tokens: int = 0
    keep_old_scale: bool = True
    oracle_ratio: float = 0.0
    ignore_label: int = 255
    # OracleTeacherBackbone (mixres_oracle_teacher.py MROTB): the same
    # composition WITHOUT the up pass — n_scales down stages only, every
    # resolution read from the final stage's stream segments.
    down_only: bool = False

    def _stream(self, feats: Dict, tokens_per_scale, outs: Dict):
        """Flatten a stage's per-resolution segments into one token stream
        (scale-segment order), recording first-seen per-resolution metadata."""
        n = self.n_scales
        seg_feats, seg_pos, seg_scale = [], [], []
        for t in range(len(tokens_per_scale)):
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
        pos3 = jnp.concatenate([scl[..., None], pos2], axis=2)
        return features, pos3

    @nn.compact
    def __call__(self, im, sem_seg_gt=None, train: bool = False) -> Dict:
        n = self.n_scales
        n_stages = n if self.down_only else 2 * n - 1
        assert len(self.names) == n_stages, (
            f"{'OracleTeacherBackbone' if self.down_only else 'UpDownBackbone'}"
            f" needs {n_stages} per-stage entries, got {len(self.names)}"
        )
        assert self.keep_old_scale, (
            "UpDownBackbone requires KEEP_OLD_SCALE: the mirrored residual "
            "concat relies on per-scale segments keeping their token sets"
        )
        b, H, W, _ = im.shape
        min_ps = self.patch_sizes[n - 1]
        min_patched = (H // min_ps, W // min_ps)
        outs: Dict = {"min_spatial_shape": min_patched}

        edges = (
            gt_edge_map(sem_seg_gt, self.ignore_label)
            if sem_seg_gt is not None
            else None
        )
        dpr = list(np.linspace(0, self.drop_path_rate, sum(self.depths)))

        def stage_drop_path(t):
            lo = sum(self.depths[:t])
            return tuple(dpr[lo : lo + self.depths[t]])

        # ---------------- down pass: split scale by scale -----------------
        features = None
        pos3 = None
        upsampling_mask = None
        tokens_per_scale: Tuple[int, ...] = ()
        down_streams: List[jnp.ndarray] = []   # full token stream per stage
        down_tps: List[Tuple[int, ...]] = []
        for s in range(n):
            if s == 0:
                assert self.names[0] == "MixResViT", (
                    f"first UpDown stage must be MixResViT, got {self.names[0]}"
                )
                bb = MixResViT(
                    scale=0, n_scales=n, patch_size=self.patch_sizes[0],
                    min_patch_size=min_ps, d_model=self.embed_dims[0],
                    n_layers=self.depths[0], n_heads=self.num_heads[0],
                    mlp_ratio=self.mlp_ratios[0], dropout=self.drop_rates[0],
                    drop_path=stage_drop_path(0), layer_scale=self.layer_scale,
                    num_register_tokens=self.num_register_tokens,
                    first_layer=True, out_feature=f"res{n + 1}",
                    name="backbones_0",
                )
            else:
                bb = MixResNeighbour(
                    scale=s, n_scales=n,
                    patch_sizes=tuple(self.patch_sizes[: s + 1]),
                    min_patch_size=min_ps, d_model=self.embed_dims[s],
                    n_layers=self.depths[s], n_heads=self.num_heads[s],
                    cluster_size=self.cluster_sizes[s],
                    nbhd_size=self.nbhd_sizes[s],
                    mlp_ratio=self.mlp_ratios[s],
                    split_ratio=self.split_ratios[s],
                    upscale_ratio=self.upscale_ratios[s],
                    dropout=self.drop_rates[s],
                    attn_drop=self.attn_drop_rates[s],
                    drop_path=stage_drop_path(s), layer_scale=self.layer_scale,
                    in_channels=self.embed_dims[s - 1],
                    keep_old_scale=True, first_layer=False,
                    name=f"backbones_{s}",
                )
            feats, tokens_per_scale = bb(
                im, features, pos3, upsampling_mask, tokens_per_scale, train
            )
            features, pos3 = self._stream(feats, tokens_per_scale, outs)
            down_streams.append(features)
            down_tps.append(tuple(tokens_per_scale))

            if s < n - 1:
                # upsampling score over the NEWEST scale segment only
                # (reference mixres_up_down.py:176 upsamplers[scale](all_feat[0]))
                n_new = tokens_per_scale[-1]
                new_feat = features[:, -n_new:]
                pred = MLPDeepNorm(
                    self.embed_dims[s], 1, name=f"upsamplers_{s}"
                )(new_feat)[..., 0]
                outs[f"upsampling_mask_pred_{s}"] = pred
                outs[f"upsampling_mask_pos_{s}"] = pos3[:, -n_new:]
                if edges is not None:
                    oracle = oracle_upsampling_mask(
                        edges, pos3[:, -n_new:, 1:], pos3[:, -n_new:, 0],
                        self.patch_sizes[:n], min_ps,
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

        if self.down_only:
            # OracleTeacherBackbone: every resolution comes from the final
            # stage's stream segments
            start = 0
            for t, cnt in enumerate(tokens_per_scale):
                outs[f"res{n - t + 1}"] = features[:, start : start + cnt]
                start += cnt
            return outs

        # finest resolution (scale n-1) is final after the last down stage
        n_fine = tokens_per_scale[-1]
        outs["res2"] = features[:, -n_fine:]

        # ---------------- up pass: coarser prefixes w/ mirror residuals ---
        x = features
        p = pos3
        tps = list(tokens_per_scale)
        for j in range(n - 1):
            t = n + j                       # global stage index
            mirror = n - 2 - j              # mirrored down stage
            m_seg = n - 1 - j               # segments kept this stage
            keep_n = sum(tps[:m_seg])
            x = x[:, :keep_n]
            p = p[:, :keep_n]
            tps = tps[:m_seg]
            res = down_streams[mirror]
            assert down_tps[mirror] == tuple(tps), (
                f"up stage {t}: mirrored down stage {mirror} segment sizes "
                f"{down_tps[mirror]} != current {tuple(tps)} — residual "
                "concat would be misaligned"
            )
            x = jnp.concatenate([x, res], axis=2)
            x = nn.LayerNorm(name=f"up_token_norm_{j}")(x)
            x = nn.Dense(self.embed_dims[t], name=f"up_token_projection_{j}")(x)
            # MixResViT up stages = global attention; MixResNeighbour =
            # cluster attention (nbhd >= n triggers the global path)
            nbhd = (
                x.shape[1] if self.names[t] == "MixResViT"
                else self.nbhd_sizes[t]
            )
            p, x = MixResLayer(
                dim=self.embed_dims[t],
                cluster_size=self.cluster_sizes[t],
                nbhd_size=nbhd,
                depth=self.depths[t],
                num_heads=self.num_heads[t],
                mlp_ratio=self.mlp_ratios[t],
                drop=self.drop_rates[t],
                attn_drop=self.attn_drop_rates[t],
                drop_path=stage_drop_path(t),
                layer_scale=self.layer_scale,
                name=f"backbones_{t}",
            )(p, x, min_patched[0], min_patched[1], deterministic=not train)
            # the finest remaining segment is final after this stage
            n_last = tps[-1]
            outs[f"res{n - (m_seg - 1) + 1}"] = x[:, -n_last:]
        return outs


def updown_from_config(cfg, down_only: bool = False) -> UpDownBackbone:
    """Build UpDownBackbone from MODEL.MR.* (reference mixres_up_down.py
    :208-246 reads the same 2n-1-entry lists via build_backbone_indexed).
    ``down_only=True`` gives OracleTeacherBackbone (mixres_oracle_teacher.py
    :188-, n-entry lists, no up pass)."""
    mr = cfg.MODEL.MR
    n = cfg.MODEL.MASK_FINER.NUM_RESOLUTION_SCALES
    return UpDownBackbone(
        n_scales=n,
        down_only=down_only,
        names=tuple(mr.NAME),
        patch_sizes=tuple(mr.PATCH_SIZES),
        embed_dims=tuple(mr.EMBED_DIM),
        depths=tuple(mr.DEPTHS),
        num_heads=tuple(mr.NUM_HEADS),
        mlp_ratios=tuple(mr.MLP_RATIO),
        cluster_sizes=tuple(mr.CLUSTER_SIZE),
        nbhd_sizes=tuple(mr.NBHD_SIZE),
        upscale_ratios=tuple(mr.UPSCALE_RATIO),
        split_ratios=tuple(mr.SPLIT_RATIO),
        drop_rates=tuple(mr.DROP_RATE),
        attn_drop_rates=tuple(mr.ATTN_DROP_RATE),
        # list-valued DROP_PATH_RATE (see maskfiner.build_backbone_indexed):
        # UpDown has one global ramp, so take the max as the terminal rate
        drop_path_rate=(max(float(r) for r in mr.DROP_PATH_RATE)
                        if isinstance(mr.DROP_PATH_RATE, (list, tuple))
                        else float(mr.DROP_PATH_RATE)),
        layer_scale=mr.LAYER_SCALE,
        num_register_tokens=mr.NUM_REGISTER_TOKENS,
        keep_old_scale=mr.KEEP_OLD_SCALE,
        oracle_ratio=cfg.MODEL.MASK_FINER.ORACLE_TEACHER_RATIO,
        ignore_label=cfg.MODEL.MR_SEM_SEG_HEAD.IGNORE_VALUE,
    )
