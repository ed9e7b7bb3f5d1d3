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
