"""Point-cloud multi-scale deformable-attention pixel decoder.

TPU-native rebuild of reference mask2former/modeling/pixel_decoder/msdeformattn_pc.py:
per-level Linear+LN input projections, 6 encoder layers whose MSDeformAttnPc
predicts per-head/level/point sampling offsets, snaps each sampled location to
a precomputed 4-NN lookup on the finest grid, Shepard-weights the 4 neighbors
(learnable power), and aggregates through the ``msdetrpc`` gather kernel; then
FPN levels via Shepard upsampling + PointConv output convs.

All neighbor tensors are fixed-width and static-shape.  The 4-NN lookup table
(`nb_idx`) is one KNN per level per forward over the finest grid — queries are
the full canvas, so on TPU this is a batched distance+top-k sweep that XLA
pipelines; sampled locations then just do cheap gathers into the table
(msdeformattn_pc.py:186-194).
"""

from __future__ import annotations

import math
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from ..geometry.knn import knn
from ..geometry.gridnn import grid_neighbors9, pos_index_lut
from ..geometry.shepard import shepard_decay_weights, upsample_feature_shepard
from ..ops.clusten import cluster_wf, msdetrpc
from ..ops.gather import take_rows
from .layers import WeightNet, position_embedding_sine, rel_pos_features


# Profiling ablation switches (tools/profile; never set in production code):
# zero out a stage to measure its in-context cost by difference.
ABLATE_MSDETRPC = False
ABLATE_PACK = False
ABLATE_KNN = False
ABLATE_SHEPARD = False

# Channel-major fused sampling prep (r3): run the offsets/attention
# projections, packed-table lookup, and Shepard weighting with queries on the
# MINOR axis so the sampling kernel consumes its operands natively (no XLA
# relayouts) and the table lookup becomes a windowed lane-gather over
# Morton-ordered tables instead of an XLA row gather.
#
# MEASURED DEAD END (r3), kept off: end-to-end it regressed AFF-Mini 512x512
# batch-4 inference 27.4 -> 4.0 im/s.  Root cause isolated with
# tools/bench_fused_gather.py on real-model index statistics (128-sample
# tiles covering ~31x31 cells of the 128x128 grid, Morton-ranked): the
# per-tile Morton rank spread is too wide for a narrow window — fit rate is
# 6% at k_sub=16 (7.47 ms) and even at k_sub=64 (91% fit) the windowed
# gather only ties XLA's row gather (3.17 vs 3.02 ms / 524288 rows), because
# its cost is linear in the window width: 64 band-reads+selects per tile vs
# the full-table sweep's 128.  Locality buys at most 2x over the fallback,
# and the fallback is ~2.5x WORSE than take_rows — so the whole lane-gather
# framing loses unless spread fits in <=8 bands, which deformable offsets
# never satisfy.  The relayout savings the path also buys (~0.6 ms/level)
# cannot pay for that.  Correctness of the path is pinned by
# tests/test_fused_prep.py so the experiment stays reproducible.
USE_FUSED_PREP = False


class DualLayoutDense(nn.Module):
    """nn.Dense-compatible projection (same param names, shapes, init) that
    can emit its output CHANNEL-MAJOR: ``transposed=True`` computes
    (b, features, n) from (b, n, c) as one dot_general — the (features, b, n)
    -> (b, features, n) fixup moves only MAJOR dims (n stays minor), a free
    tile remap on TPU, whereas transposing a row-major Dense output is a
    measured ~0.5-1 ms minor-dim relayout per level."""

    features: int
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros

    @nn.compact
    def __call__(self, x, transposed: bool = False, input_bhcn: bool = False):
        in_features = (x.shape[1] * x.shape[2] if input_bhcn
                       else x.shape[-1])
        kernel = self.param("kernel", self.kernel_init,
                            (in_features, self.features))
        bias = self.param("bias", self.bias_init, (self.features,))
        dtype = jnp.result_type(x.dtype, kernel.dtype, bias.dtype)
        x = x.astype(dtype)
        kernel = kernel.astype(dtype)
        bias = bias.astype(dtype)
        if input_bhcn:
            # x: (b, h, c_, n) channel-major — contract (h, c_) against the
            # row-major kernel reshaped (h, c_, features); the head merge
            # and query untranspose ride the MXU operand load instead of
            # standing XLA relayouts
            b, h, c_, n = x.shape
            y = jax.lax.dot_general(
                x, kernel.reshape(h, c_, self.features),
                (((1, 2), (0, 1)), ((), ())),
            )                                               # (b, n, features)
            return y + bias
        if not transposed:
            return jax.lax.dot_general(
                x, kernel, (((x.ndim - 1,), (0,)), ((), ()))
            ) + bias
        y = jax.lax.dot_general(
            kernel, x, (((0,), (2,)), ((), ()))
        )                                                   # (features, b, n)
        return y.transpose(1, 0, 2) + bias[None, :, None]

# Measured dead end (r3): head-natural kernel layout — see MSDeformAttnPc.
USE_BH_LAYOUT = False

# Stacked-glue fast path (r3): concatenate the three value-levels' idx/w on
# the pair axis so the wrapper pays ONE (bh, n, 3P) -> (bh, 3P, n) relayout
# per operand instead of three, and consume the kernel's channel-major
# (bh, c_, n) output directly in the output projection's dot_general
# (untranspose + head merge ride the MXU operand load instead of standing
# relayouts).  Toggle for A/B: MSDETRPC_STACKED=0.
USE_STACKED_GLUE = __import__("os").environ.get(
    "MSDETRPC_STACKED", "1").strip().lower() not in ("0", "false", "no")


def _pallas_levels_ok(level_sizes, values_all) -> bool:
    """Shape gate for the fused per-level Pallas sampling kernels, shared by
    both dispatchers so the fallback conditions cannot drift apart."""
    from ..ops.dispatch import fused_attention_available

    return (
        fused_attention_available()
        and sum(level_sizes) == values_all.shape[1]
        and all(nj % 128 == 0 for nj in level_sizes)
    )


def _msdetrpc_dispatch_t(idxs_local, ws_shepard, attn_perm, values_all,
                         level_sizes):
    """Stacked/channel-major dispatch: returns (bh, c_, n_i) from the v14
    kernel, or None when the fused path is unavailable (caller falls back to
    _msdetrpc_dispatch)."""
    from ..ops.pallas.msdetrpc_kernel import msdetrpc_pallas_levels_s

    if not USE_STACKED_GLUE or ABLATE_MSDETRPC:
        return None
    bh, n_i, kpts, kk = idxs_local[0].shape
    if not _pallas_levels_ok(level_sizes, values_all):
        return None
    dt = values_all.dtype
    idx_s = jnp.concatenate(
        [i.reshape(bh, n_i, kpts * kk) for i in idxs_local], axis=2
    )
    w_s = jnp.concatenate(
        [(w.astype(jnp.float32)
          * attn_perm[:, :, j, :, None].astype(jnp.float32))
         .reshape(bh, n_i, kpts * kk)
         for j, w in enumerate(ws_shepard)], axis=2,
    )
    return msdetrpc_pallas_levels_s(
        idx_s, w_s, values_all.astype(jnp.float32), tuple(level_sizes)
    ).astype(dt)


def _msdetrpc_dispatch(idxs_local, ws_shepard, attn_perm, values_all,
                       level_sizes):
    """Route the deformable-sampling contraction to the fused Pallas kernel
    (ops/pallas/msdetrpc_kernel.py — one-hot x MXU, no row gathers) on TPU,
    falling back to the XLA gather composition elsewhere or when shapes are
    unsupported.  The Pallas path computes at bf16 matmul precision
    (~0.5% rel); the XLA path stays the exact semantic reference.

    idxs_local: per level j, (bh, n_i, k, 4) LOCAL indices into level j's
    value rows; ws_shepard: matching Shepard weights; attn_perm:
    (bh, n_i, l, k) softmaxed attention.  Per-level inputs keep the kernel
    operands in their producers' natural layout — the old interleaved
    (bh, n, k*l, 4) form forced two XLA relayout copies per call."""
    from ..ops.pallas.msdetrpc_kernel import msdetrpc_pallas_levels

    bh, n_i, kpts, kk = idxs_local[0].shape
    n_levels = len(level_sizes)
    if ABLATE_MSDETRPC:
        return jnp.zeros((bh, n_i, values_all.shape[-1]),
                         values_all.dtype) + attn_perm.sum() * 0.0
    dt = values_all.dtype
    if _pallas_levels_ok(level_sizes, values_all):
        idxs = tuple(i.reshape(bh, n_i, kpts * kk) for i in idxs_local)
        ws = tuple(
            (w.astype(jnp.float32)
             * attn_perm[:, :, j, :, None].astype(jnp.float32))
            .reshape(bh, n_i, kpts * kk)
            for j, w in enumerate(ws_shepard)
        )
        # kernel contract is fp32 refs (dots run at bf16 MXU precision inside)
        return msdetrpc_pallas_levels(
            idxs, ws, values_all.astype(jnp.float32), level_sizes
        ).astype(dt)
    # XLA path: assemble the interleaved reference layout (levels fastest in
    # the slot axis); shepard weights arrive fp32 (geometry) — cast down so
    # the contraction and its output stay in the compute dtype
    offs = np.cumsum([0] + list(level_sizes))[:-1]
    nn_idxs = jnp.stack(
        [i + int(o) for i, o in zip(idxs_local, offs)], axis=3
    ).reshape(bh, n_i, kpts * n_levels, kk)
    nn_weights = jnp.stack(ws_shepard, axis=3).reshape(
        bh, n_i, kpts * n_levels, kk
    )
    attn_i = attn_perm.transpose(0, 1, 3, 2).reshape(bh, n_i, kpts * n_levels)
    return msdetrpc(nn_idxs, nn_weights.astype(dt), attn_i.astype(dt),
                    values_all)


def scale_pos(pos: jnp.ndarray, last_ss, cur_ss, no_bias: bool = False) -> jnp.ndarray:
    """Rescale 2-D positions between canvases (msdeformattn_pc.py:28-52)."""
    if tuple(last_ss) == tuple(cur_ss):
        return pos
    h_ratio = cur_ss[0] / last_ss[0]
    w_ratio = cur_ss[1] / last_ss[1]
    ret = pos
    if no_bias:
        ret = ret + 0.5
    ret = ret * jnp.asarray([w_ratio, h_ratio], dtype=ret.dtype)
    if no_bias:
        ret = ret - 0.5
    return ret


DENSE_GRID_POINTCONV = True

# static per-(h, w) 9-NN geometry for the dense full-grid PointConv path:
# (border cell ids, their 9-NN cell ids, their rel offsets) as numpy constants
_GRID9_STATIC_CACHE: Dict[Tuple[int, int], Tuple[np.ndarray, np.ndarray, np.ndarray]] = {}


def _grid9_static(h: int, w: int):
    """Trace-time constants for the dense-grid PointConv's border ring.

    Interior cells' 9-NN are exactly their 3x3 neighborhood (max d2 = 2 vs
    next candidate d2 = 4 — no ties).  Border cells clip the window and ties
    at d2 >= 2 decide membership BY LOWEST TOKEN INDEX (gridnn._window_knn
    lut semantics), which depends on the runtime token order — so for them we
    precompute only the static 6x6 candidate window (cells + d2, oob pushed
    to +inf) and resolve the lexicographic (d2, token) top-9 at runtime."""
    key = (h, w)
    if key not in _GRID9_STATIC_CACHE:
        ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        flat_y = ys.reshape(-1)
        flat_x = xs.reshape(-1)
        border = np.nonzero(
            (flat_y == 0) | (flat_y == h - 1) | (flat_x == 0) | (flat_x == w - 1)
        )[0].astype(np.int32)
        bx = flat_x[border].astype(np.float32)
        by = flat_y[border].astype(np.float32)
        offs = np.arange(-2, 4, dtype=np.float32)        # 6-wide window
        gx = bx[:, None, None] + offs[None, :, None]     # (nb, 6, 1)
        gy = by[:, None, None] + offs[None, None, :]     # (nb, 1, 6)
        d2 = (gx - bx[:, None, None]) ** 2 + (gy - by[:, None, None]) ** 2
        oob = (gx < 0) | (gx > w - 1) | (gy < 0) | (gy > h - 1)
        d2 = np.where(np.broadcast_to(oob, d2.shape), 1e10, d2)
        cells = (
            np.clip(gy, 0, h - 1) * w + np.clip(gx, 0, w - 1)
        ).astype(np.int32)
        cells = np.broadcast_to(cells, d2.shape).reshape(len(border), 36)
        _GRID9_STATIC_CACHE[key] = (
            border, cells.copy(), d2.reshape(len(border), 36).astype(np.float32)
        )
    return _GRID9_STATIC_CACHE[key]


class PointConv(nn.Module):
    """3x3-conv analogue on point clouds: 9-NN gather, rel-pos-conditioned
    mixing weights, channel mix (msdeformattn_pc.py:272-314)."""

    out_dim: int
    inner_ch: int = 4

    @nn.compact
    def __call__(self, x, pos, spatial_shape=None):
        b, n, c = x.shape
        if (
            DENSE_GRID_POINTCONV
            and spatial_shape is not None
            and n == spatial_shape[0] * spatial_shape[1]
            and spatial_shape[0] >= 3
            and spatial_shape[1] >= 3
        ):
            return self._dense_grid(x, pos, spatial_shape)
        if spatial_shape is not None and n == spatial_shape[0] * spatial_shape[1]:
            # full-grid token set: 3x3 neighborhoods are analytic (gridnn.py)
            nn_idx = grid_neighbors9(pos, spatial_shape[0], spatial_shape[1])
        else:
            nn_idx = knn(pos, pos, min(9, n))
        kk = nn_idx.shape[-1]
        nn_pos = take_rows(pos, nn_idx)                      # (b, n, kk, 2)
        rel = pos[:, :, None, :] - nn_pos
        # the reference looks rel up in the integer table; positions here can be
        # fractional after rescaling — it truncates via .long(); match that
        rel = jnp.trunc(rel)
        weights = WeightNet(self.inner_ch, name="weight_net")(rel_pos_features(rel))
        feat = cluster_wf(weights.astype(x.dtype), x, nn_idx).reshape(b, n, -1)
        feat = nn.LayerNorm(name="norm")(feat)
        return nn.Dense(self.out_dim, name="linear")(feat)

    def _dense_grid(self, x, pos, spatial_shape):
        """Full-grid fast path: raster-space 3x3 mixing instead of 9-NN row
        gathers.

        For every interior cell the 9 nearest grid tokens are exactly the 3x3
        neighborhood and rel-pos is constant per slot, so WeightNet reduces to
        NINE constant inner_ch-vectors and the mixing to 9 shifted adds (a
        3x3 conv).  Border cells (outer ring, where the window clips and ties
        at distance >= 2 pick members) use trace-time-static 9-NN sets from
        the exact ``grid_neighbors9``.  Replaces 2x b*n*9 row gathers + a
        per-token WeightNet with two b*n-row permutations (measured 16.8 ms
        -> ~1 ms for the FPN PointConv at 512x512 batch 4).  The sum over
        slots is order-free, so slot order vs. the gather path is
        irrelevant."""
        b, n, c = x.shape
        h_, w_ = int(spatial_shape[0]), int(spatial_shape[1])
        ic = self.inner_ch
        border, cand_cells, cand_d2 = _grid9_static(h_, w_)
        nb = len(border)

        weight_net = WeightNet(ic, name="weight_net")
        # token order -> raster order (gathers pipeline better than scatters)
        lut = pos_index_lut(pos, h_, w_)                  # (b, hw) cell->token
        img = take_rows(x, lut)                           # (b, hw, c) raster
        img2 = img.reshape(b, h_, w_, c)

        # interior: 9 constant weight vectors (rel = -offset, trunc = id)
        offs = np.asarray(
            [(dx, dy) for dy in (-1, 0, 1) for dx in (-1, 0, 1)], np.float32
        )
        w_int = weight_net(rel_pos_features(jnp.asarray(-offs))).astype(x.dtype)
        pad = jnp.pad(img2, ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc = None
        for s, (dx, dy) in enumerate(offs.astype(np.int32)):
            shifted = pad[:, 1 + dy : 1 + dy + h_, 1 + dx : 1 + dx + w_, :]
            term = shifted[..., None, :] * w_int[s][:, None]
            acc = term if acc is None else acc + term     # (b, h, w, ic, c)
        acc = acc.reshape(b, n, ic, c)

        # border ring: resolve (d2, token)-lexicographic top-9 at runtime —
        # the same tie semantics as _window_knn(lut=...)
        from ..ops.gather import take_scalars

        cellb = jnp.broadcast_to(jnp.asarray(cand_cells), (b, nb, 36))
        d2b = jnp.broadcast_to(jnp.asarray(cand_d2), (b, nb, 36))
        tokb = take_scalars(lut, cellb.reshape(b, -1)).reshape(b, nb, 36)
        _, tok9, cell9 = jax.lax.sort(
            (d2b, tokb, cellb), dimension=-1, num_keys=2
        )
        tok9, cell9 = tok9[..., :9], cell9[..., :9]
        nb_pos = jnp.stack(
            [(cell9 % w_).astype(jnp.float32), (cell9 // w_).astype(jnp.float32)],
            axis=-1,
        )                                                 # (b, nb, 9, 2)
        bpos = jnp.stack(
            [jnp.asarray(border % w_, jnp.float32),
             jnp.asarray(border // w_, jnp.float32)], axis=-1,
        )                                                 # (nb, 2)
        rel_b = jnp.trunc(bpos[None, :, None, :] - nb_pos)
        w_b = weight_net(rel_pos_features(rel_b)).astype(x.dtype)
        bfeat = take_rows(x, tok9)                        # (b, nb, 9, c)
        bacc = jnp.einsum("bnsi,bnsc->bnic", w_b, bfeat)
        acc = acc.at[:, jnp.asarray(border)].set(bacc)

        # raster -> token order
        cell = (
            pos[..., 1].astype(jnp.int32) * w_ + pos[..., 0].astype(jnp.int32)
        )
        feat = take_rows(acc.reshape(b, n, ic * c), cell)
        feat = nn.LayerNorm(name="norm")(feat)
        return nn.Dense(self.out_dim, name="linear")(feat)


class MSDeformAttnPc(nn.Module):
    """Deformable attention over point clouds (msdeformattn_pc.py:107-205).

    TPU optimization: XLA row-gathers cost ~the same per row regardless of
    width, so the per-sample lookups (neighbor indices from the grid table,
    then neighbor positions for Shepard weights) are PACKED into one 12-wide
    float row per grid cell ([idx x4, pos_x x4, pos_y x4], exact for idx <
    2^24), gathered once per sample — halving the gather rows of the hot loop
    (measured 981 ms -> the pixel decoder's dominant cost at 512x512).
    ``nb_packed`` is built once per forward in the pixel decoder and reused by
    every encoder layer.
    """

    d_model: int
    n_levels: int
    n_heads: int
    n_points: int
    shepard_power: float
    shepard_power_learnable: bool

    def _offset_init(self, key, shape, dtype=jnp.float32):
        """Bias init: points fan out along per-head directions with growing
        radius (msdeformattn_pc.py:127-135)."""
        h, l, k = self.n_heads, self.n_levels, self.n_points
        thetas = np.arange(h, dtype=np.float32) * (2.0 * np.pi / h)
        grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)
        grid = grid / np.abs(grid).max(-1, keepdims=True)
        grid = np.tile(grid.reshape(h, 1, 1, 2), (1, l, k, 1))
        for i in range(k):
            grid[:, :, i, :] *= i + 1
        return jnp.asarray(grid.reshape(-1), dtype)

    @nn.compact
    def __call__(self, querys, poss, values, spatial_shapes, nb_packed,
                 nb_packed_t=None):
        """
        querys/values - lists of (b, n_l, c); poss - list of (b, n_l, 2)
        spatial_shapes - list of (h, w) per level + finest grid last (static)
        nb_packed - list of (b, grid_h*grid_w, 12) packed per-cell tables
        nb_packed_t - optional Morton-ordered CHANNEL-MAJOR tables
            (b, 12, grid_h*grid_w) enabling the fused prep path
        """
        b, _, c = querys[0].shape
        h, l, k = self.n_heads, self.n_levels, self.n_points
        c_ = c // h
        grid_hw = spatial_shapes[-1]

        if self.shepard_power_learnable:
            power = self.param(
                "shepard_power", nn.initializers.constant(self.shepard_power), (1,)
            )[0]
        else:
            power = self.shepard_power

        value_proj = nn.Dense(self.d_model, name="value_proj")
        values_cat = value_proj(jnp.concatenate(values, axis=1))  # (b, ntot, c)
        ntot = values_cat.shape[1]

        offsets_net = DualLayoutDense(
            h * l * k * 2, name="sampling_offsets",
            kernel_init=nn.initializers.zeros, bias_init=self._offset_init,
        )
        attn_net = DualLayoutDense(
            h * l * k, name="attention_weights",
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
        )
        # DualLayoutDense is nn.Dense-compatible (same param names/shapes);
        # input_bhcn consumes the v14 kernel's channel-major output directly
        out_proj = DualLayoutDense(self.d_model, name="output_proj")

        level_sizes = [q.shape[1] for q in querys]
        from ..ops.dispatch import fused_attention_available

        # Head-natural path (measured DEAD END, r3): keeping tensors
        # (b, n, h, ...) and looping heads in-kernel removes the ~31 ms of
        # XLA head transposes but costs 290 vs 197 ms/fwd in context — the
        # in-kernel strided [0, :, h_i, :] head slices (h on the
        # second-minor dim) relayout worse than the transposes they avoid.
        # Kept behind this flag with its kernels + parity tests
        # (ops/pallas/msdetrpc_kernel.py _kernel_v12/_bwd_kernel_v12) so the
        # next round doesn't retry it blind.
        if USE_BH_LAYOUT and (
            fused_attention_available()
            and sum(level_sizes) == ntot
            and all(nj % 128 == 0 for nj in level_sizes)
            and not (ABLATE_MSDETRPC or ABLATE_PACK or ABLATE_KNN
                     or ABLATE_SHEPARD)
        ):
            return self._forward_bh(
                querys, poss, values_cat, spatial_shapes, nb_packed,
                offsets_net, attn_net, out_proj, power, level_sizes,
            )

        values_all = (
            values_cat.reshape(b, ntot, h, c_).transpose(0, 2, 1, 3).reshape(b * h, ntot, c_)
        )

        ncells = int(grid_hw[0]) * int(grid_hw[1])
        fused_levels_ok = (
            nb_packed_t is not None
            and sum(level_sizes) == ntot
            and all(nj % 128 == 0 for nj in level_sizes)
        )
        outputs = []
        for i in range(l):
            n_i = level_sizes[i]
            # fused channel-major prep pays when the per-128-query Morton
            # window is narrow (fine query levels); coarse levels would trip
            # the gather's full-table fallback, so they keep the legacy path
            if fused_levels_ok and n_i % 128 == 0 and n_i * 8 >= ncells:
                outputs.append(self._level_fused_t(
                    i, querys, poss, values_all, spatial_shapes, nb_packed_t,
                    offsets_net, attn_net, out_proj, power, level_sizes,
                ))
                continue
            offs = offsets_net(querys[i]).reshape(b, n_i, h, l, k, 2)
            attn = jax.nn.softmax(
                attn_net(querys[i]).reshape(b, n_i, h, l * k), axis=-1
            ).reshape(b, n_i, h, l, k)

            idxs_local = []
            ws_shepard = []
            for j in range(l):
                # query positions of level i in level j's canvas
                s_pos = scale_pos(poss[i], spatial_shapes[i], spatial_shapes[j], no_bias=True)
                loc = s_pos[:, :, None, None, :] + offs[:, :, :, j]  # (b, n_i, h, k, 2)
                loc = loc.transpose(0, 2, 1, 3, 4).reshape(b * h, n_i * k, 2)

                # snap to the finest grid; one packed gather yields neighbor
                # indices AND neighbor positions
                sl = scale_pos(loc, spatial_shapes[j], grid_hw, no_bias=True)
                sl = jnp.round(sl).astype(jnp.int32)
                gx = jnp.clip(sl[..., 0], 0, grid_hw[1] - 1)
                gy = jnp.clip(sl[..., 1], 0, grid_hw[0] - 1) * grid_hw[1]
                gather_idx = (gx + gy).reshape(b, h * n_i * k)  # (b, h*n_i*k)
                if ABLATE_PACK:
                    packed = jnp.broadcast_to(
                        nb_packed[j][:, :1] + gather_idx[..., None].astype(jnp.float32) * 0.0,
                        (b, h * n_i * k, 12),
                    ).reshape(b * h, n_i * k, 12)
                else:
                    # geometry is constant wrt params (positions are
                    # integer-selected grid coords, models/aff.py:250-265, and
                    # the gather indices pass through an int cast) — stop the
                    # cotangent here or the backward pays 54 dead scatter-adds
                    # into the (b, hw, 12) tables and onward into the position
                    # arrays (measured: the pixel-decoder backward dominated
                    # the train step at 280 ms before this)
                    packed = jax.lax.stop_gradient(
                        take_rows(nb_packed[j], gather_idx)
                    ).reshape(b * h, n_i * k, 12)
                nb_real = packed[..., 0:4].astype(jnp.int32)
                nb_x = packed[..., 4:8]
                nb_y = packed[..., 8:12]

                d2 = (loc[..., 0:1] - nb_x) ** 2 + (loc[..., 1:2] - nb_y) ** 2
                if ABLATE_SHEPARD:
                    w = jnp.full_like(d2, 0.25) + d2 * 0.0 + power * 0.0
                else:
                    w = shepard_decay_weights(d2, power=power)  # (b*h, n_i*k, 4)

                idxs_local.append(nb_real.reshape(b * h, n_i, k, 4))
                ws_shepard.append(w.reshape(b * h, n_i, k, 4))

            attn_perm = attn.transpose(0, 2, 1, 3, 4).reshape(b * h, n_i, l, k)
            sampled_t = _msdetrpc_dispatch_t(
                idxs_local, ws_shepard, attn_perm, values_all,
                tuple(level_sizes)
            )
            if sampled_t is not None:
                outputs.append(out_proj(
                    sampled_t.reshape(b, h, c_, n_i), input_bhcn=True
                ))
                continue
            sampled = _msdetrpc_dispatch(
                idxs_local, ws_shepard, attn_perm, values_all,
                tuple(level_sizes)
            )
            sampled = sampled.reshape(b, h, n_i, c_).transpose(0, 2, 1, 3).reshape(b, n_i, c)
            outputs.append(out_proj(sampled))
        return outputs

    def _level_fused_t(self, i, querys, poss, values_all, spatial_shapes,
                       nb_packed_t, offsets_net, attn_net, out_proj, power,
                       level_sizes):
        """Channel-major fused sampling prep for one query level (TPU).

        Everything from the offset/attention projections to the sampling
        kernel runs with queries on the MINOR axis: DualLayoutDense emits
        (b, F, n) directly, the packed-table lookup is a windowed lane-gather
        over MORTON-ordered tables (ops/pallas/window_gather.py +
        geometry/morton.py) instead of an XLA row gather (ref
        msdeformattn_pc.py:186-194), and the sampling kernel consumes the
        (bh, pairs, n) operands natively (msdetrpc_pallas_levels_t) — no
        (bh, n, P) -> (bh, P, n) relayouts (~0.6 ms each at n=4096).

        Same math as the legacy loop below (gathers exact; Shepard identical);
        geometry is stop_gradient — positions are integer-selected constants
        (models/aff.py:240,265), so the legacy take_rows VJP also carries no
        parameter gradient through the tables."""
        from ..geometry.morton import morton_rank
        from ..ops.pallas.msdetrpc_kernel import msdetrpc_pallas_levels_t
        from ..ops.pallas.window_gather import windowed_row_gather

        b = querys[i].shape[0]
        h, l, k = self.n_heads, self.n_levels, self.n_points
        c = self.d_model
        c_ = c // h
        n_i = level_sizes[i]
        grid_hw = spatial_shapes[-1]
        gh, gw = int(grid_hw[0]), int(grid_hw[1])
        log2w = gw.bit_length() - 1
        log2h = gh.bit_length() - 1
        dt = values_all.dtype

        offsT = offsets_net(querys[i], transposed=True)      # (b, hlk2, n)
        attnT = attn_net(querys[i], transposed=True)         # (b, hlk, n)
        attnT = jax.nn.softmax(
            attnT.reshape(b, h, l * k, n_i), axis=2
        ).reshape(b, h, l, k, n_i)
        offsT = offsT.reshape(b, h, l, k, 2, n_i)
        s_posT = poss[i].transpose(0, 2, 1)                  # (b, 2, n_i)

        idx_ts, w_ts = [], []
        for j in range(l):
            # scale_pos(poss[i], shapes[i] -> shapes[j]) channel-major,
            # including its equal-shape identity shortcut
            if tuple(spatial_shapes[i]) == tuple(spatial_shapes[j]):
                sp = s_posT
            else:
                r = jnp.asarray(
                    [spatial_shapes[j][1] / spatial_shapes[i][1],
                     spatial_shapes[j][0] / spatial_shapes[i][0]],
                    s_posT.dtype,
                )[None, :, None]
                sp = (s_posT + 0.5) * r - 0.5
            locT = sp[:, None, None] + offsT[:, :, j]        # (b, h, k, 2, n)

            # snap to the finest grid (scale_pos j -> grid, round, clip)
            if (int(spatial_shapes[j][0]), int(spatial_shapes[j][1])) == (gh, gw):
                sl = locT
            else:
                rg = jnp.asarray(
                    [gw / spatial_shapes[j][1], gh / spatial_shapes[j][0]],
                    locT.dtype,
                )[None, None, None, :, None]
                sl = (locT + 0.5) * rg - 0.5
            sl = jnp.round(sl).astype(jnp.int32)
            gx = jnp.clip(sl[:, :, :, 0], 0, gw - 1)         # (b, h, k, n)
            gy = jnp.clip(sl[:, :, :, 1], 0, gh - 1)
            rank = morton_rank(gx, gy, log2w, log2h)
            packed = windowed_row_gather(
                nb_packed_t[j], rank.reshape(b, h * k * n_i), k_sub=16,
            )                                                # (b, 12, hkn)
            packed = jax.lax.stop_gradient(packed)
            packed = (packed.reshape(b, 12, h, k, n_i)
                      .transpose(0, 2, 1, 3, 4)              # major-dim swap
                      .reshape(b * h, 12, k, n_i))
            nbi = packed[:, 0:4]
            nbx = packed[:, 4:8]
            nby = packed[:, 8:12]                            # (bh, 4, k, n)
            lx = locT[:, :, :, 0].reshape(b * h, 1, k, n_i)
            ly = locT[:, :, :, 1].reshape(b * h, 1, k, n_i)
            d2 = (lx - nbx) ** 2 + (ly - nby) ** 2
            # shepard_decay_weights, normalized over the 4-NN axis (axis=1)
            dist = jnp.maximum(d2, 1e-2)
            ipd = 1.0 / (dist ** power + 1e-6)
            w = ipd / (jnp.sum(ipd, axis=1, keepdims=True) + 1e-6)
            w = w * attnT[:, :, j].reshape(b * h, 1, k, n_i).astype(w.dtype)
            idx_ts.append(
                nbi.astype(jnp.int32).transpose(0, 2, 1, 3)
                .reshape(b * h, k * 4, n_i)
            )
            w_ts.append(
                w.astype(jnp.float32).transpose(0, 2, 1, 3)
                .reshape(b * h, k * 4, n_i)
            )
        sampled = msdetrpc_pallas_levels_t(
            tuple(idx_ts), tuple(w_ts), values_all.astype(jnp.float32),
            tuple(level_sizes),
        ).astype(dt)                                         # (bh, n, c_)
        sampled = (sampled.reshape(b, h, n_i, c_)
                   .transpose(0, 2, 1, 3).reshape(b, n_i, c))
        return out_proj(sampled)

    def _forward_bh(self, querys, poss, values_cat, spatial_shapes,
                    nb_packed, offsets_net, attn_net, out_proj, power,
                    level_sizes):
        """Head-natural fused path: see __call__.  Semantics identical to
        the transposed path (kernel fwd is bit-identical to v8 on permuted
        inputs, tests/test_msdetrpc_pallas.py)."""
        from ..ops.gather import take_rows
        from ..ops.pallas.msdetrpc_kernel import msdetrpc_pallas_bh

        b, ntot, c = values_cat.shape
        h, l, k = self.n_heads, self.n_levels, self.n_points
        c_ = c // h
        grid_hw = spatial_shapes[-1]
        dt = values_cat.dtype
        values_bh = values_cat.reshape(b, ntot, h, c_)      # free reshape

        outputs = []
        for i in range(l):
            n_i = level_sizes[i]
            offs = offsets_net(querys[i]).reshape(b, n_i, h, l, k, 2)
            attn = jax.nn.softmax(
                attn_net(querys[i]).reshape(b, n_i, h, l * k), axis=-1
            ).reshape(b, n_i, h, l, k)

            idxs_bh = []
            ws_bh = []
            for j in range(l):
                s_pos = scale_pos(poss[i], spatial_shapes[i],
                                  spatial_shapes[j], no_bias=True)
                # (b, n_i, h, k, 2) — h stays where the Dense put it
                loc = s_pos[:, :, None, None, :] + offs[:, :, :, j]
                loc = loc.reshape(b, n_i * h * k, 2)

                sl = scale_pos(loc, spatial_shapes[j], grid_hw, no_bias=True)
                sl = jnp.round(sl).astype(jnp.int32)
                gx = jnp.clip(sl[..., 0], 0, grid_hw[1] - 1)
                gy = jnp.clip(sl[..., 1], 0, grid_hw[0] - 1) * grid_hw[1]
                packed = jax.lax.stop_gradient(
                    take_rows(nb_packed[j], gx + gy)        # (b, nhk, 12)
                )
                nb_real = packed[..., 0:4].astype(jnp.int32)
                nb_x = packed[..., 4:8]
                nb_y = packed[..., 8:12]

                d2 = (loc[..., 0:1] - nb_x) ** 2 + (loc[..., 1:2] - nb_y) ** 2
                w = shepard_decay_weights(d2, power=power)  # (b, nhk, 4)
                w = (w.reshape(b, n_i, h, k, 4)
                     * attn[:, :, :, j, :, None].astype(w.dtype))
                idxs_bh.append(nb_real.reshape(b, n_i, h, k * 4))
                ws_bh.append(w.reshape(b, n_i, h, k * 4))

            sampled = msdetrpc_pallas_bh(
                tuple(idxs_bh), tuple(ws_bh),
                values_bh.astype(jnp.float32), tuple(level_sizes),
            ).astype(dt)
            outputs.append(out_proj(sampled.reshape(b, n_i, c)))
        return outputs


def pack_neighbor_table(nb_idx: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
    """Pack per-cell neighbor indices + their positions into one float row.
    nb_idx: (b, hw, 4) into level tokens; pos: (b, n_l, 2) level positions
    -> (b, hw, 12) [idx x4 | x x4 | y x4] (idx exact in f32 below 2^24)."""
    b, hw, _ = nb_idx.shape
    nb_pos = take_rows(pos, nb_idx)                          # (b, hw, 4, 2)
    return jnp.concatenate(
        [nb_idx.astype(jnp.float32), nb_pos[..., 0], nb_pos[..., 1]], axis=-1
    )


class MSDeformAttnEncoderLayerPc(nn.Module):
    """Self-attention (deformable) + FFN encoder layer (msdeformattn_pc.py:208-257)."""

    d_model: int
    d_ffn: int
    dropout: float
    n_levels: int
    n_heads: int
    n_points: int
    shepard_power: float
    shepard_power_learnable: bool
    activation: str = "relu"    # OT variant uses lrelu (…oracle_teacher.py)

    @nn.compact
    def __call__(self, srcs, poss, spatial_shapes, pos_embeds, nb_packed,
                 deterministic: bool = True, nb_packed_t=None):
        with_pe = [s + p for s, p in zip(srcs, pos_embeds)]
        src2s = MSDeformAttnPc(
            self.d_model, self.n_levels, self.n_heads, self.n_points,
            self.shepard_power, self.shepard_power_learnable, name="self_attn",
        )(with_pe, poss, srcs, spatial_shapes, nb_packed, nb_packed_t)

        norm1 = nn.LayerNorm(name="norm1")
        norm2 = nn.LayerNorm(name="norm2")
        lin1 = nn.Dense(self.d_ffn, name="linear1")
        lin2 = nn.Dense(self.d_model, name="linear2")
        drop = lambda x: nn.Dropout(self.dropout, deterministic=deterministic)(x)
        act = nn.leaky_relu if self.activation == "lrelu" else nn.relu

        outs = []
        for src, src2 in zip(srcs, src2s):
            src = norm1(src + drop(src2))
            ffn = lin2(drop(act(lin1(src))))
            outs.append(norm2(src + drop(ffn)))
        return outs


class MSDeformAttnPixelDecoder(nn.Module):
    """The full point-cloud pixel decoder (msdeformattn_pc.py:317-540).

    forward_features(features) ->
      (mask_features, mf_pos, transformer_out[0], multi_scale_features, poss[:3])
    """

    in_features: Sequence[str] = ("res2", "res3", "res4", "res5")
    transformer_in_features: Sequence[str] = ("res3", "res4", "res5")
    feature_strides: Sequence[int] = (4, 8, 16, 32)
    conv_dim: int = 256
    mask_dim: int = 256
    transformer_nheads: int = 8
    transformer_dim_feedforward: int = 1024
    transformer_enc_layers: int = 6
    transformer_dropout: float = 0.0
    common_stride: int = 4
    n_points: int = 4
    shepard_power: float = 3.0
    shepard_power_learnable: bool = True
    maskformer_num_feature_levels: int = 3
    # MSDeformAttnPixelDecoderUp (msdeformattn_up_pc.py:528-547): mask
    # features come from ALL levels Shepard-upsampled onto the full finest
    # grid instead of the finest level's tokens alone.
    mask_on_full_grid: bool = False

    @nn.compact
    def __call__(self, features: Dict, deterministic: bool = True):
        num_levels = len(self.transformer_in_features)
        finest = self.in_features[0]
        grid_hw = features[finest + "_spatial_shape"]
        b = features[finest].shape[0]

        ys, xs = np.meshgrid(np.arange(grid_hw[0]), np.arange(grid_hw[1]), indexing="ij")
        grid_pos = jnp.asarray(
            np.stack([xs, ys], 2).reshape(1, -1, 2), jnp.float32
        )
        grid_pos = jnp.broadcast_to(grid_pos, (b, grid_pos.shape[1], 2))

        srcs, poss, pos_embed, spatial_shapes, nb_idx = [], [], [], [], []
        # low -> high resolution (res5, res4, res3)
        for idx, f in enumerate(self.transformer_in_features[::-1]):
            x = features[f]                       # compute dtype (bf16 under AMP)
            # positions are non-differentiable geometry (integer grid coords
            # picked by top-k in the backbone); cut the cotangent chain so
            # the backward does not drag dead scatter-adds through the sine
            # embeddings, KNN pack tables, and Shepard weights
            pos = jax.lax.stop_gradient(features[f + "_pos"]).astype(jnp.float32)
            ss = features[f + "_spatial_shape"]
            xp = nn.Dense(self.conv_dim, name=f"input_proj_{idx}_dense")(x)
            xp = nn.LayerNorm(name=f"input_proj_{idx}_norm")(xp)
            srcs.append(xp)
            poss.append(pos)
            # sine embedding is fp32 geometry; cast down so with_pe cannot
            # promote the compute path under mixed precision
            pos_embed.append(
                position_embedding_sine(pos, self.conv_dim // 2).astype(xp.dtype)
            )
            spatial_shapes.append(ss)
            scaled = scale_pos(pos, ss, grid_hw, no_bias=True)
            if ABLATE_KNN:
                nb_idx.append(
                    jnp.zeros((b, grid_pos.shape[1], 12), jnp.float32)
                    + jnp.sum(scaled) * 0.0
                )
            else:
                nb_idx.append(pack_neighbor_table(knn(grid_pos, scaled, 4), pos))

        level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0), (num_levels, self.conv_dim)
        )
        lvl_pos = [pe + level_embed[i][None, None] for i, pe in enumerate(pos_embed)]

        last_pos = poss[-1]
        last_ss = spatial_shapes[-1]
        lvl_shapes = list(spatial_shapes)
        spatial_shapes = list(spatial_shapes) + [grid_hw]

        # Morton-ordered channel-major tables for the fused prep path (one
        # static row permutation + one small transpose per forward, shared
        # by all encoder layers); legacy row-major tables stay alongside for
        # the coarse query levels / non-TPU / ablation paths.
        from ..geometry.morton import is_pow2, morton_perm
        from ..ops.dispatch import fused_attention_available

        nb_idx_t = None
        gh, gw = int(grid_hw[0]), int(grid_hw[1])
        if (USE_FUSED_PREP and fused_attention_available()
                and is_pow2(gh) and is_pow2(gw) and (gh * gw) % 128 == 0
                and not (ABLATE_MSDETRPC or ABLATE_PACK or ABLATE_KNN
                         or ABLATE_SHEPARD)):
            perm = jnp.asarray(morton_perm(gh, gw))
            nb_idx_t = [t[:, perm, :].transpose(0, 2, 1) for t in nb_idx]

        out = srcs
        for li in range(self.transformer_enc_layers):
            out = MSDeformAttnEncoderLayerPc(
                d_model=self.conv_dim,
                d_ffn=self.transformer_dim_feedforward,
                dropout=self.transformer_dropout,
                n_levels=num_levels,
                n_heads=self.transformer_nheads,
                n_points=self.n_points,
                shepard_power=self.shepard_power,
                shepard_power_learnable=self.shepard_power_learnable,
                name=f"encoder_layer_{li}",
            )(out, poss, spatial_shapes, lvl_pos, nb_idx, deterministic,
              nb_idx_t)
        transformer_out = out[0]

        # extra FPN levels (just res2 for the standard config)
        num_fpn_levels = int(
            math.log2(min(self.feature_strides[self.in_features.index(f)]
                          for f in self.transformer_in_features))
            - math.log2(self.common_stride)
        )
        out = list(out)
        fpn_poss = []
        for idx, f in enumerate(self.in_features[:num_fpn_levels][::-1]):
            x = features[f]
            pos = jax.lax.stop_gradient(features[f + "_pos"]).astype(jnp.float32)
            ss = features[f + "_spatial_shape"]
            cur_fpn = nn.Dense(self.conv_dim, name=f"adapter_{idx + 1}_dense")(x)
            cur_fpn = nn.LayerNorm(name=f"adapter_{idx + 1}_norm")(cur_fpn)
            last_pos = scale_pos(last_pos, last_ss, ss, no_bias=True)
            y = cur_fpn + upsample_feature_shepard(pos, last_pos, out[-1]).astype(
                cur_fpn.dtype
            )
            y = PointConv(self.conv_dim, name=f"layer_{idx + 1}_pointconv")(y, pos, ss)
            y = nn.LayerNorm(name=f"layer_{idx + 1}_norm")(y)
            y = nn.relu(y)
            last_pos, last_ss = pos, ss
            fpn_poss.append((pos, ss))
            out.append(y)

        multi_scale_features = out[: self.maskformer_num_feature_levels]
        if self.mask_on_full_grid:
            # Up variant: Shepard all levels onto the full finest grid and
            # read mask features off the dense canvas (msdeformattn_up_pc.py)
            scaled = [
                scale_pos(p, s, grid_hw, no_bias=True)
                for p, s in list(zip(poss, lvl_shapes)) + fpn_poss
            ]
            all_pos = jnp.concatenate(scaled, axis=1)
            all_feat = jnp.concatenate(out, axis=1)
            full_feat = upsample_feature_shepard(grid_pos, all_pos, all_feat)
            mask_features = nn.Dense(self.mask_dim, name="mask_features")(full_feat)
            mf_pos = grid_pos
        else:
            mask_features = nn.Dense(self.mask_dim, name="mask_features")(out[-1])
            mf_pos = last_pos
        return (
            mask_features,
            mf_pos,
            transformer_out,
            multi_scale_features,
            poss[: self.maskformer_num_feature_levels],
        )


def pixel_decoder_from_config(cfg, feature_channels: Dict[str, int]) -> MSDeformAttnPixelDecoder:
    """Mirror of MSDeformAttnPixelDecoder.from_config (msdeformattn_pc.py:443-462)."""
    return MSDeformAttnPixelDecoder(
        in_features=tuple(cfg.MODEL.SEM_SEG_HEAD.IN_FEATURES),
        transformer_in_features=tuple(
            cfg.MODEL.SEM_SEG_HEAD.DEFORMABLE_TRANSFORMER_ENCODER_IN_FEATURES
        ),
        conv_dim=cfg.MODEL.SEM_SEG_HEAD.CONVS_DIM,
        mask_dim=cfg.MODEL.SEM_SEG_HEAD.MASK_DIM,
        transformer_nheads=cfg.MODEL.MASK_FORMER.NHEADS,
        transformer_dim_feedforward=1024,
        transformer_enc_layers=cfg.MODEL.SEM_SEG_HEAD.TRANSFORMER_ENC_LAYERS,
        transformer_dropout=cfg.MODEL.MASK_FORMER.DROPOUT,
        common_stride=cfg.MODEL.SEM_SEG_HEAD.COMMON_STRIDE,
        # distances are squared, so halve the configured power
        shepard_power=cfg.MODEL.AFF.SHEPARD_POWER / 2.0,
        shepard_power_learnable=cfg.MODEL.AFF.SHEPARD_POWER_LEARNABLE,
    )
