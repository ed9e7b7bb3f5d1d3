"""Grid multi-scale deformable-attention pixel decoder — the Swin baseline
path (reference mask2former/modeling/pixel_decoder/msdeformattn.py, backed by
the stock Deformable-DETR CUDA op `MultiScaleDeformableAttention`,
ops/src/*.cu).

On TPU the bilinear im2col kernel is unnecessary: deformable sampling is
4-tap bilinear interpolation at predicted locations, expressed directly as
gathers + lerps that XLA fuses (the ~1600-line CUDA extension reduces to
``bilinear_sample``)."""

from __future__ import annotations

import math
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from .layers import position_embedding_sine


def bilinear_sample(value: jnp.ndarray, loc: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sampling with zero padding (the grid MSDeformAttn semantics,
    align_corners=False on normalized coords).
    value: (b, h, w, c); loc: (b, p, 2) in [0, 1] (x, y) -> (b, p, c)."""
    b, h, w, c = value.shape
    x = loc[..., 0] * w - 0.5
    y = loc[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    flat = value.reshape(b, h * w, c)

    def tap(xi, yi):
        inb = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        v = jnp.take_along_axis(flat, (yi_c * w + xi_c)[..., None], axis=1)
        return jnp.where(inb[..., None], v, 0.0)

    v00 = tap(x0, y0)
    v01 = tap(x0 + 1, y0)
    v10 = tap(x0, y0 + 1)
    v11 = tap(x0 + 1, y0 + 1)
    top = v00 * (1 - wx[..., None]) + v01 * wx[..., None]
    bot = v10 * (1 - wx[..., None]) + v11 * wx[..., None]
    return top * (1 - wy[..., None]) + bot * wy[..., None]


class MSDeformAttnGrid(nn.Module):
    """Grid deformable attention (ops/modules/ms_deform_attn.py:34)."""

    d_model: int
    n_levels: int
    n_heads: int
    n_points: int

    def _offset_init(self, key, shape, dtype=jnp.float32):
        h, l, k = self.n_heads, self.n_levels, self.n_points
        thetas = np.arange(h, dtype=np.float32) * (2.0 * np.pi / h)
        grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)
        grid = grid / np.abs(grid).max(-1, keepdims=True)
        grid = np.tile(grid.reshape(h, 1, 1, 2), (1, l, k, 1))
        for i in range(k):
            grid[:, :, i, :] *= i + 1
        return jnp.asarray(grid.reshape(-1), dtype)

    @nn.compact
    def __call__(self, query, ref_points, values, spatial_shapes):
        """query: (b, nq, c); ref_points: (b, nq, l, 2) normalized;
        values: list of (b, h_l, w_l, c); spatial_shapes static."""
        b, nq, c = query.shape
        h, l, k = self.n_heads, self.n_levels, self.n_points
        c_ = c // h

        offs = nn.Dense(
            h * l * k * 2, name="sampling_offsets",
            kernel_init=nn.initializers.zeros, bias_init=self._offset_init,
        )(query).reshape(b, nq, h, l, k, 2)
        attn = jax.nn.softmax(
            nn.Dense(h * l * k, name="attention_weights",
                     kernel_init=nn.initializers.zeros,
                     bias_init=nn.initializers.zeros)(query).reshape(b, nq, h, l * k),
            axis=-1,
        ).reshape(b, nq, h, l, k)

        vproj = nn.Dense(self.d_model, name="value_proj")
        out = jnp.zeros((b, nq, h, c_), query.dtype)
        for j in range(l):
            hj, wj = spatial_shapes[j]
            vj = vproj(values[j]).reshape(b, hj, wj, h, c_)
            norm = jnp.asarray([wj, hj], query.dtype)
            loc = (
                ref_points[:, :, None, j, None, :]
                + offs[:, :, :, j] / norm
            )                                               # (b, nq, h, k, 2)
            for hi in range(h):
                sampled = bilinear_sample(
                    vj[..., hi, :], loc[:, :, hi].reshape(b, nq * k, 2)
                ).reshape(b, nq, k, c_)
                out = out.at[:, :, hi].add(
                    jnp.einsum("bqk,bqkc->bqc", attn[:, :, hi, j], sampled)
                )
        return nn.Dense(self.d_model, name="output_proj")(out.reshape(b, nq, c))


class MSDeformAttnPixelDecoderGrid(nn.Module):
    """Stock Mask2Former grid pixel decoder (msdeformattn.py:165-358):
    deformable encoder over res3-5 + lateral/output convs for res2."""

    in_features: Sequence[str] = ("res2", "res3", "res4", "res5")
    transformer_in_features: Sequence[str] = ("res3", "res4", "res5")
    conv_dim: int = 256
    mask_dim: int = 256
    transformer_nheads: int = 8
    transformer_dim_feedforward: int = 1024
    transformer_enc_layers: int = 6
    n_points: int = 4

    @nn.compact
    def __call__(self, features: Dict, deterministic: bool = True):
        """features: {res*: (b, n, c) grid-ordered point clouds with
        res*_spatial_shape}.  Assumes row-major token order (Swin path)."""
        nl = len(self.transformer_in_features)

        grids, shapes, pe = [], [], []
        for idx, f in enumerate(self.transformer_in_features[::-1]):
            x = features[f]
            ss_canvas = features[f + "_spatial_shape"]
            stride = 2 ** (3 - idx)  # res5 -> 8x coarser than res2 canvas
            hj, wj = ss_canvas[0] // stride, ss_canvas[1] // stride
            b, n, c = x.shape
            xg = nn.Conv(self.conv_dim, (1, 1), name=f"input_proj_{idx}_conv")(
                x.reshape(b, hj, wj, c)
            )
            xg = nn.GroupNorm(num_groups=32, name=f"input_proj_{idx}_norm")(xg)
            grids.append(xg)
            shapes.append((hj, wj))
            pos = features[f + "_pos"]
            pe.append(position_embedding_sine(pos, self.conv_dim // 2))

        level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0), (nl, self.conv_dim)
        )

        # flattened queries with normalized reference points
        srcs = [g.reshape(g.shape[0], -1, self.conv_dim) for g in grids]
        b = srcs[0].shape[0]
        refs = []
        for (hj, wj) in shapes:
            ys, xs = np.meshgrid(
                (np.arange(hj) + 0.5) / hj, (np.arange(wj) + 0.5) / wj,
                indexing="ij",
            )
            refs.append(np.stack([xs, ys], 2).reshape(-1, 2))
        ref_all = jnp.asarray(np.concatenate(refs, 0), jnp.float32)
        ref_all = jnp.broadcast_to(ref_all[None, :, None, :], (b, ref_all.shape[0], nl, 2))

        x = jnp.concatenate(
            [s + level_embed[i][None, None] + p for i, (s, p) in enumerate(zip(srcs, pe))],
            axis=1,
        )
        sizes = [s.shape[1] for s in srcs]
        bounds = np.cumsum([0] + sizes)

        for li in range(self.transformer_enc_layers):
            vals = [
                x[:, bounds[j]: bounds[j + 1]].reshape(b, *shapes[j], self.conv_dim)
                for j in range(nl)
            ]
            y = MSDeformAttnGrid(
                self.conv_dim, nl, self.transformer_nheads, self.n_points,
                name=f"encoder_layer_{li}_self_attn",
            )(x, ref_all, vals, shapes)
            x = nn.LayerNorm(name=f"encoder_layer_{li}_norm1")(x + y)
            ffn = nn.Dense(self.transformer_dim_feedforward,
                           name=f"encoder_layer_{li}_linear1")(x)
            ffn = nn.Dense(self.conv_dim, name=f"encoder_layer_{li}_linear2")(
                nn.relu(ffn)
            )
            x = nn.LayerNorm(name=f"encoder_layer_{li}_norm2")(x + ffn)

        outs = [
            x[:, bounds[j]: bounds[j + 1]].reshape(b, *shapes[j], self.conv_dim)
            for j in range(nl)
        ]

        # FPN on res2
        f2 = self.in_features[0]
        ss_canvas = features[f2 + "_spatial_shape"]
        h2, w2 = ss_canvas
        x2 = features[f2].reshape(b, h2, w2, -1)
        lat = nn.Conv(self.conv_dim, (1, 1), name="adapter_1_conv")(x2)
        lat = nn.GroupNorm(num_groups=32, name="adapter_1_norm")(lat)
        up = jax.image.resize(outs[-1], (b, h2, w2, self.conv_dim), "bilinear")
        y = lat + up
        y = nn.Conv(self.conv_dim, (3, 3), padding=((1, 1), (1, 1)),
                    name="layer_1_conv")(y)
        y = nn.GroupNorm(num_groups=32, name="layer_1_norm")(y)
        y = nn.relu(y)

        mask_features = nn.Conv(self.mask_dim, (1, 1), name="mask_features")(y)

        # point-cloud-compatible returns (grid = on-grid point cloud)
        def flat(g):
            return g.reshape(b, -1, g.shape[-1])

        def grid_pos(hj, wj, stride):
            ys, xs = np.meshgrid(np.arange(hj), np.arange(wj), indexing="ij")
            p = np.stack([xs, ys], 2).reshape(1, -1, 2).astype(np.float32) * stride
            return jnp.broadcast_to(jnp.asarray(p), (b, hj * wj, 2))

        ms_feats = [flat(o) for o in outs[: 3]]
        ms_poss = [
            grid_pos(*shapes[j], 2 ** (3 - j)) for j in range(min(3, nl))
        ]
        mf_pos = grid_pos(h2, w2, 1)
        ms_shapes = [tuple(shapes[j]) for j in range(min(3, nl))]
        return flat(mask_features), mf_pos, flat(outs[0]), ms_feats, ms_poss, ms_shapes
