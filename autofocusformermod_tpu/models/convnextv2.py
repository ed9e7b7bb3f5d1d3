"""ConvNeXtV2 backbone — grid convnet emitting pos-annotated outputs for the
MixRes pipelines (reference mask2former/modeling/backbone/convnextv2.py:
stages of depthwise-7x7 + GRN MLP blocks, stride-2 LayerNorm+conv
downsampling)."""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from .layers import DropPath


class GRN(nn.Module):
    """Global Response Normalization (ConvNeXtV2)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.zeros, (1, 1, 1, self.dim))
        beta = self.param("beta", nn.initializers.zeros, (1, 1, 1, self.dim))
        gx = jnp.sqrt(jnp.sum(x**2, axis=(1, 2), keepdims=True) + 1e-12)
        nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + 1e-6)
        return gamma * (x * nx) + beta + x


class ConvNeXtV2Block(nn.Module):
    dim: int
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        shortcut = x
        x = nn.Conv(
            self.dim, (7, 7), padding=((3, 3), (3, 3)),
            feature_group_count=self.dim, name="dwconv",
        )(x)
        x = nn.LayerNorm(name="norm")(x)
        x = nn.Dense(4 * self.dim, name="pwconv1")(x)
        x = nn.gelu(x, approximate=False)
        x = GRN(4 * self.dim, name="grn")(x)
        x = nn.Dense(self.dim, name="pwconv2")(x)
        return shortcut + DropPath(self.drop_path)(x, deterministic)


class ConvNeXtV2(nn.Module):
    """4-stage ConvNeXtV2 emitting the point-cloud feature dict."""

    depths: Sequence[int] = (3, 3, 9, 3)
    dims: Sequence[int] = (96, 192, 384, 768)
    drop_path_rate: float = 0.0
    out_indices: Sequence[int] = (0, 1, 2, 3)

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict:
        b = x.shape[0]
        x = nn.Conv(self.dims[0], (4, 4), strides=(4, 4), name="stem_conv")(x)
        x = nn.LayerNorm(name="stem_norm")(x)
        h0, w0 = x.shape[1:3]
        spatial_shape = (h0, w0)

        dpr = list(np.linspace(0, self.drop_path_rate, sum(self.depths)))
        outs: Dict = {}
        for i, depth in enumerate(self.depths):
            if i > 0:
                x = nn.LayerNorm(name=f"down_norm_{i}")(x)
                x = nn.Conv(
                    self.dims[i], (2, 2), strides=(2, 2), name=f"down_conv_{i}"
                )(x)
            for j in range(depth):
                x = ConvNeXtV2Block(
                    self.dims[i], dpr[sum(self.depths[:i]) + j],
                    name=f"stages_{i}_blocks_{j}",
                )(x, deterministic=not train)
            if i in self.out_indices:
                bb, h, w, c = x.shape
                stride = 2**i
                ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
                pos = np.stack([xs, ys], 2).reshape(1, -1, 2).astype(np.float32) * stride
                y = nn.LayerNorm(name=f"out_norm_{i}")(x.reshape(bb, h * w, c))
                outs[f"res{i + 2}"] = y
                outs[f"res{i + 2}_pos"] = jnp.broadcast_to(jnp.asarray(pos), (b, h * w, 2))
                outs[f"res{i + 2}_spatial_shape"] = spatial_shape
                # scale channel for MixRes consumers (convnextv2.py:238-239 emits
                # scale ids per token)
                outs[f"res{i + 2}_scale"] = jnp.full((b, h * w), float(i), jnp.float32)
        return outs


class ConvNeXtV2Stage(nn.Module):
    """MixRes cascade-stage ConvNeXt (reference convnextv2.py CNVNXT2
    :142-236): first layer stems the image with an overlap patch embed and
    adds a sine PE; later layers LayerNorm+project the incoming token stream
    and reshape it back to the full patch grid.  Blocks are plain ConvNeXtV2
    blocks over that grid.  Output protocol matches MixResViT:
    (outs dict, tokens_per_scale)."""

    scale: int
    n_scales: int
    patch_size: int
    min_patch_size: int
    d_model: int
    n_layers: int
    in_channels: int = 3
    first_layer: bool = True
    out_feature: str = "res5"

    @nn.compact
    def __call__(self, im, features, features_pos, upsampling_mask,
                 tokens_per_scale, train: bool = False, k_split=None):
        # k_split accepted for stage-interface uniformity (grid stage)
        from .mixres import (
            OverlapPatchEmbedding,
            get_2dpos_of_curr_ps_in_min_ps,
        )
        from .layers import position_embedding_sine

        b, H, W, _ = im.shape
        ps = self.patch_size
        patched = (H // ps, W // ps)
        min_patched = (H // self.min_patch_size, W // self.min_patch_size)

        if self.first_layer:
            x = OverlapPatchEmbedding(ps, self.d_model, name="stem")(im, train)
            pos_np = get_2dpos_of_curr_ps_in_min_ps(
                H, W, ps, self.min_patch_size, self.scale
            )
            pos = jnp.broadcast_to(
                jnp.asarray(pos_np)[None], (b, pos_np.shape[0], 3)
            )
            tokens_per_scale = (pos_np.shape[0],)
        else:
            x = nn.LayerNorm(name="token_norm")(features)
            if features.shape[-1] != self.d_model:
                x = nn.Dense(self.d_model, name="token_projection")(x)
            pos = features_pos
            # reference :216 views the token stream back to the patch grid —
            # only valid when the stream is the complete grid
            assert x.shape[1] == patched[0] * patched[1], (
                f"ConvNeXtV2Stage needs a full {patched} grid token stream, "
                f"got n={x.shape[1]}"
            )

        grid = x.reshape(b, patched[0], patched[1], self.d_model)
        for i in range(self.n_layers):
            grid = ConvNeXtV2Block(self.d_model, name=f"stage_{i}")(
                grid, deterministic=not train
            )
        x = grid.reshape(b, patched[0] * patched[1], self.d_model)
        if self.first_layer:
            x = x + position_embedding_sine(pos[:, :, 1:], self.d_model // 2).astype(x.dtype)
        x = nn.LayerNorm(name="norm")(x)

        outs = {
            self.out_feature: x,
            self.out_feature + "_pos": pos[:, :, 1:],
            self.out_feature + "_spatial_shape": patched,
            self.out_feature + "_scale": pos[:, :, 0],
            "min_spatial_shape": min_patched,
        }
        return outs, tokens_per_scale
