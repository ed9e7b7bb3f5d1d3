"""Shared model layers: relative-position features, MLPs, DropPath, sine PE,
PointConv.

TPU-first redesign note (vs reference aff.py:17-31): the reference materializes
a 2047 x 2047 x 5 lookup table of (dx, dy, dist, sin, cos), pushes the whole
table through a small Linear every block, and gathers rows by a precomputed
``pe_idx``.  That is ~84 MB of HBM traffic per use.  Here the 5 features are
computed directly from the gathered relative positions (a handful of VPU ops
on a (b, n, m, 2) tensor) and the small Linear is applied to them — the same
function values, zero table traffic.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

# the reference clamps relative coordinates to a canvas of 2048/4 - 1 = 511...
# precisely: rel_pos_width = 2048//4 - 1 = 511? No: aff.py:18 uses 2048//4-1=511
# per *stride-4* canvas; the table is (2*511+1)^2. We keep the same clamp.
REL_POS_WIDTH = 2048 // 4 - 1  # 511


def rel_pos_features(rel_pos: jnp.ndarray) -> jnp.ndarray:
    """(..., 2) integer-valued relative offsets -> (..., 5) features
    (dx, dy, dist, sin, cos); (0,0) maps to all-zeros like the reference's
    nan-scrubbed table (aff.py:26-30)."""
    rel = jnp.clip(rel_pos, -REL_POS_WIDTH, REL_POS_WIDTH).astype(jnp.float32)
    dx, dy = rel[..., 0], rel[..., 1]
    dist = jnp.sqrt(dx * dx + dy * dy)
    safe = jnp.where(dist > 0, dist, 1.0)
    sin = jnp.where(dist > 0, dy / safe, 0.0)
    cos = jnp.where(dist > 0, dx / safe, 0.0)
    return jnp.stack([dx, dy, dist, sin, cos], axis=-1)


class Mlp(nn.Module):
    """Linear -> GELU -> Linear feed-forward (aff.py:34-50)."""

    hidden_features: int
    out_features: int
    drop: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.hidden_features, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.drop, deterministic=deterministic)(x)
        x = nn.Dense(self.out_features, name="fc2")(x)
        x = nn.Dropout(self.drop, deterministic=deterministic)(x)
        return x


class DropPath(nn.Module):
    """Stochastic depth — drop the residual branch per sample."""

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


class MLP(nn.Module):
    """DETR-style n-layer perceptron with ReLU (mask2former_transformer_decoder.py:217-229)."""

    hidden_dim: int
    output_dim: int
    num_layers: int

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            out = self.output_dim if i == self.num_layers - 1 else self.hidden_dim
            x = nn.Dense(out, name=f"layers_{i}")(x)
            if i < self.num_layers - 1:
                x = nn.relu(x)
        return x


def position_embedding_sine(
    pos: jnp.ndarray, num_pos_feats: int, temperature: float = 10000.0,
    normalize: bool = True, scale: Optional[float] = None,
) -> jnp.ndarray:
    """Sine/cosine positional encoding taking point positions directly.
    Port of PositionEmbeddingSine (position_encoding.py:14-55): normalizes by
    the max coordinate over the whole batch.
    pos: (b, n, 2) -> (b, n, 2*num_pos_feats)."""
    if scale is None:
        scale = 2 * jnp.pi
    y_embed = pos[:, :, 1].astype(jnp.float32)
    x_embed = pos[:, :, 0].astype(jnp.float32)
    if normalize:
        eps = 1e-6
        y_embed = y_embed / (jnp.max(y_embed) + eps) * scale
        x_embed = x_embed / (jnp.max(x_embed) + eps) * scale
    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)
    pos_x = x_embed[:, :, None] / dim_t
    pos_y = y_embed[:, :, None] / dim_t
    pos_x = jnp.concatenate([jnp.sin(pos_x[:, :, 0::2]), jnp.cos(pos_x[:, :, 1::2])], axis=2)
    pos_y = jnp.concatenate([jnp.sin(pos_y[:, :, 0::2]), jnp.cos(pos_y[:, :, 1::2])], axis=2)
    return jnp.concatenate([pos_x, pos_y], axis=2)


class WeightNet(nn.Module):
    """Linear(5 -> inner_ch) + LN + GELU applied to rel-pos features, used by
    PointConv-style mixing (aff.py:267-271, msdeformattn_pc.py:276-280)."""

    inner_ch: int = 4

    @nn.compact
    def __call__(self, rel_feat5):
        w = nn.Dense(self.inner_ch, name="linear")(rel_feat5)
        w = nn.LayerNorm(name="norm")(w)
        return nn.gelu(w, approximate=False)
