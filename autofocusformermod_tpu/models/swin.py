"""Swin Transformer backbone — the reference's grid baseline
(mask2former/modeling/backbone/swin.py D2SwinTransformer; stock Swin used
only for comparison runs, SURVEY.md section 2.2).

TPU notes: windows are static reshapes (no gathers); the shifted-window mask
is a compile-time constant per (h, w); relative-position-bias tables are tiny
and indexed by a constant (2*ws-1)^2 lookup.  Outputs the AFF-compatible
point-cloud dict {res*: feat, res*_pos, res*_spatial_shape} so the same
pixel/mask decoders consume it (grid = trivially on-grid point cloud).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from .layers import DropPath, Mlp


def window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """(b, h, w, c) -> (b*nw, ws*ws, c)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def window_reverse(x: jnp.ndarray, ws: int, h: int, w: int, b: int) -> jnp.ndarray:
    x = x.reshape(b, h // ws, w // ws, ws, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


def _rel_pos_index(ws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


class WindowAttention(nn.Module):
    dim: int
    window_size: int
    num_heads: int
    qkv_bias: bool = True

    @nn.compact
    def __call__(self, x, mask=None):
        bn, n, c = x.shape
        h = self.num_heads
        c_ = c // h
        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, name="qkv")(x)
        qkv = qkv.reshape(bn, n, 3, h, c_).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * (c_**-0.5), qkv[1], qkv[2]

        attn = jnp.einsum("bhic,bhjc->bhij", q, k)
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.normal(0.02),
            ((2 * self.window_size - 1) ** 2, h),
        )
        idx = jnp.asarray(_rel_pos_index(self.window_size))
        bias = table[idx.reshape(-1)].reshape(n, n, h).transpose(2, 0, 1)
        attn = attn + bias[None]
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(bn // nw, nw, h, n, n) + mask[None, :, None]
            attn = attn.reshape(bn, h, n, n)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhij,bhjc->bhic", attn, v).transpose(0, 2, 1, 3).reshape(bn, n, c)
        return nn.Dense(c, name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7
    shift: int = 0
    mlp_ratio: float = 4.0
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x, h, w, deterministic: bool = True):
        b, n, c = x.shape
        ws = self.window_size
        shortcut = x
        x = nn.LayerNorm(name="norm1")(x).reshape(b, h, w, c)

        pad_b = (ws - h % ws) % ws
        pad_r = (ws - w % ws) % ws
        if pad_b or pad_r:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        hp, wp = h + pad_b, w + pad_r

        shift = self.shift if min(hp, wp) > ws else 0
        if shift:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
            # compile-time shifted-window attention mask
            img_mask = np.zeros((1, hp, wp, 1), np.float32)
            cnt = 0
            for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
                for wss in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
                    img_mask[:, hs, wss] = cnt
                    cnt += 1
            mw = window_partition(jnp.asarray(img_mask), ws)[..., 0]  # (nw, ws*ws)
            attn_mask = jnp.where(mw[:, None, :] != mw[:, :, None], -100.0, 0.0)
        else:
            attn_mask = None

        xw = window_partition(x, ws)
        xw = WindowAttention(self.dim, ws, self.num_heads, name="attn")(xw, attn_mask)
        x = window_reverse(xw, ws, hp, wp, b)
        if shift:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        x = x[:, :h, :w].reshape(b, n, c)

        dp = DropPath(self.drop_path)
        x = shortcut + dp(x, deterministic)
        x = x + dp(
            Mlp(int(c * self.mlp_ratio), c, name="mlp")(
                nn.LayerNorm(name="norm2")(x), deterministic
            ),
            deterministic,
        )
        return x


class PatchMerging(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x, h, w):
        b, n, c = x.shape
        x = x.reshape(b, h, w, c)
        if h % 2 or w % 2:
            x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
        x = jnp.concatenate(
            [x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2], x[:, 1::2, 1::2]],
            axis=-1,
        )
        x = x.reshape(b, -1, 4 * c)
        x = nn.LayerNorm(name="norm")(x)
        return nn.Dense(2 * c, use_bias=False, name="reduction")(x)


class SwinTransformer(nn.Module):
    """D2SwinTransformer-compatible backbone."""

    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.3
    patch_size: int = 4
    out_indices: Sequence[int] = (0, 1, 2, 3)

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict:
        b = x.shape[0]
        x = nn.Conv(
            self.embed_dim, (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size), name="patch_embed_proj",
        )(x)
        b, h, w, c = x.shape
        x = nn.LayerNorm(name="patch_embed_norm")(x.reshape(b, h * w, c))
        spatial_shape = (h, w)

        dpr = list(np.linspace(0, self.drop_path_rate, sum(self.depths)))
        outs: Dict = {}
        dim = self.embed_dim
        for i, depth in enumerate(self.depths):
            for j in range(depth):
                x = SwinBlock(
                    dim=dim,
                    num_heads=self.num_heads[i],
                    window_size=self.window_size,
                    shift=0 if j % 2 == 0 else self.window_size // 2,
                    mlp_ratio=self.mlp_ratio,
                    drop_path=dpr[sum(self.depths[:i]) + j],
                    name=f"layers_{i}_blocks_{j}",
                )(x, h, w, deterministic=not train)
            if i in self.out_indices:
                y = nn.LayerNorm(name=f"norm{i}")(x)
                stride = 2**i
                ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
                # positions on the stride-4 canvas, matching AFF conventions
                pos = np.stack([xs, ys], 2).reshape(1, -1, 2).astype(np.float32) * stride
                outs[f"res{i + 2}"] = y
                outs[f"res{i + 2}_pos"] = jnp.broadcast_to(
                    jnp.asarray(pos), (b, h * w, 2)
                )
                outs[f"res{i + 2}_spatial_shape"] = spatial_shape
            if i < len(self.depths) - 1:
                x = PatchMerging(dim, name=f"layers_{i}_downsample")(x, h, w)
                h, w = (h + 1) // 2, (w + 1) // 2
                dim *= 2
        return outs


def swin_from_config(cfg) -> SwinTransformer:
    s = cfg.MODEL.SWIN
    return SwinTransformer(
        embed_dim=s.EMBED_DIM,
        depths=tuple(s.DEPTHS),
        num_heads=tuple(s.NUM_HEADS),
        window_size=s.WINDOW_SIZE,
        mlp_ratio=s.MLP_RATIO,
        drop_path_rate=s.DROP_PATH_RATE,
        patch_size=s.PATCH_SIZE,
    )
