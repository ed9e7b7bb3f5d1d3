"""Fused Pallas kernel for deformable point-cloud sampling (msdetrpc).

The XLA composition (ops/clusten.msdetrpc) gathers 4 value rows per sampled
point — b*h x n x 48 row-gathers per encoder layer, the pixel decoder's
dominant cost (~90 ms/layer at 512x512 batch 4; XLA row-gathers run at only
~115M rows/s regardless of row width, and neither bf16 rows, pre-sorted
indices, nor Mosaic's tpu.dynamic_gather (single-vreg tables only) beat it).

Reformulation as DENSE one-hot x matmul, blocked per level:

    out[q] = sum_j  W_j @ V_j,     W_j[q, t] = sum_p w'[q,p] * (idx[q,p] == t)

Duplicate indices accumulate in W, matching the gather-sum exactly
(msdetrpc_cuda_kernel.cu semantics); w' carries the attention weights folded
in (w * attn).  NOTE (r3): the one-hot x MXU formulation below is no longer
the default forward — _kernel_v13 (windowed per-(band, pair) lane gathers,
pure VPU, exact fp32) measures 2x faster and is FWD_VERSION; the backward
default is _bwd_kernel_v8/v9 (dense-score d_w via lane gather).  The MXU
history below is kept because its measurements explain why.  Two
generations of the W build:

  v1 (_kernel): pairs_per_level statically-unrolled compare-select sweeps
      over the full (128, n_j) W — pure VPU, measured ~100 ms for the
      4096-query level at batch 4 (and pathologically variable).
  v2 (_kernel_v2, default): decompose t = hi*128 + lo; then
      W[q, hi, lo] = sum_p 1[hi_p=hi] * (w_p * 1[lo_p=lo]) is a batched dot
      of two SMALL one-hots (P x n_j/128 and P x 128 per query) — the W
      construction runs on the MXU and the VPU work drops by ~n_j/128x.
      Measured 96 ms -> 74+15+7 ms per encoder layer's three levels at
      512x512 batch 4 vs ~740 ms for the XLA row-gather composition
      in-context (pixel decoder 952 -> 317 ms).

Precision: the in-kernel dots run at default (bf16-input) MXU precision —
~0.5% relative on the Shepard weights and value rows, measured max abs err
~5e-2 on randn-scale inputs.  The XLA composition (fp32 HIGHEST) remains the
semantic reference and the training default on non-TPU backends; parity
tests budget the Pallas path at 2% relative.

The round-1 version of this kernel used dynamic [lo, hi] tile windows with a
fori_loop and was 7x SLOWER than XLA: dynamic trip counts defeat Mosaic's
pipelining and the per-tile 128x128 dots serialized on MXU latency.  Fully
dense per-level blocks with static shapes are the fix — "dense + static"
beats "sparse + dynamic" on TPU even at 1/5 the arithmetic.

Dead ends measured on v5e so future rounds need not retry them (the
per-program cost is MXU op-ISSUE bound at ~40 us for the 4096-query level,
not FLOP bound, and none of these changed that):
  - _kernel_v3 (kept, non-default): wide bands — decompose t = hi*w + lo
    with w up to 1024, cutting the per-band val dots 42 -> ~11.  Measured
    -19% on the 4096-query level but +15-30% on the 1024/256-query levels
    (the wider l_oh build wins only when amortized over many programs);
    net ~zero across a full encoder layer.
  - BLOCK_Q 256/512 (fewer, deeper programs): flat at the 4096-query level
    (14.5 ms regardless) — per-program cost scales with work, not count.
  - 8-query block-diagonal packing (ch = hi*8 + qq) to deepen the batched
    dot's contraction from P=16 to 128: the grouped (G, 8, c) final dots
    unroll per leading dim in Mosaic — 60 ms vs v2's 40 ms.
  - fusing all three levels' batched W dots into one via per-column hi-band
    offsets: compiles (iota-compare offsets; in-kernel jnp.concatenate of
    lane-offset slices does NOT lower) but ties v2 exactly — the unrolled
    batch dim, not the dot count, is the limit.
  - one double-contraction final dot against val (42, 128, c):
    'tpu.matmul lhs contracting dims must be of size 1'.
  - Mosaic also rejects in-kernel shape-casts that move lanes to sublanes
    ((128, 16) -> (16, 128)); any regrouping must happen in XLA outside.

Backward is a second Pallas kernel (_bwd_kernel) reusing the same hi/lo
one-hot decomposition — measured 865 ms per train step (batch 2, 512x512)
for the XLA scatter-add composition it replaces, which was the single
largest term in the whole training step:

    d_val = W^T @ g            per level, per hi-band: a (128q x 128t)^T
                               x (128q x c) MXU dot, accumulated in the
                               output block across query-grid steps;
    d_w[q,p] = g[q] . val[idx[q,p]]
             = sum_hi 1[hi_p=hi] * (l1_oh @ (g @ val_hi^T)^T)[q,p]
                               — M_hi = g @ val_hi^T is dense on MXU and the
                               P-wide extraction is the same batched one-hot
                               dot as the forward W build (no row gathers).

d_attn / d_nn_weight then split off the folded weight gradient in XLA
(w = nn_weight * attn is elementwise).

Requires every level size (and the query count after padding) to be a
multiple of 128; the pixel decoder guarantees this for standard crops, and
the wrapper falls back to the XLA composition otherwise.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..clusten import msdetrpc as msdetrpc_xla

BLOCK_Q = 128


def _kernel_v2(idx_ref, w_ref, val_ref, out_ref, *, level_sizes,
               pairs_per_level):
    """hi/lo-decomposed one-hot build: the (BQ, nj) scatter matrix W is the
    contraction over pairs of two SMALL one-hots — W[q, hi*128+lo] =
    sum_p 1[hi_p=hi] * (w_p * 1[lo_p=lo]) — so its construction runs on the
    MXU as a batched dot instead of pairs_per_level full-width VPU sweeps
    (v1 _kernel below): per 128-query block the VPU work drops from
    P*BQ*nj compare-selects to P*BQ*(nj/128 + 128)."""
    bq = idx_ref.shape[1]
    c_ = val_ref.shape[2]
    p = pairs_per_level

    acc = jnp.zeros((bq, c_), jnp.float32)
    off = 0
    for j, nj in enumerate(level_sizes):
        hi_n = nj // 128
        idx_j = idx_ref[0, :, j, :] - off                  # (BQ, P) local
        w_j = w_ref[0, :, j, :]
        hi = idx_j // 128
        lo = idx_j - hi * 128
        h_oh = (
            hi[:, :, None]
            == jax.lax.broadcasted_iota(jnp.int32, (bq, p, hi_n), 2)
        ).astype(jnp.float32)                              # (BQ, P, HI)
        l_oh = jnp.where(
            lo[:, :, None]
            == jax.lax.broadcasted_iota(jnp.int32, (bq, p, 128), 2),
            w_j[:, :, None], 0.0,
        )                                                  # (BQ, P, 128)
        w_mat = jax.lax.dot_general(
            h_oh, l_oh, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                                  # (BQ, HI, 128)
        for hi_idx in range(hi_n):
            acc = acc + jax.lax.dot_general(
                w_mat[:, hi_idx, :],
                val_ref[0, off + hi_idx * 128 : off + (hi_idx + 1) * 128, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        off += nj
    out_ref[0] = acc


def _level_band_width(nj: int) -> int:
    """Widest lo-decomposition band (multiple of 128, <= 1024) dividing the
    level: wider bands mean fewer, deeper per-band dots — the kernel is MXU
    op-ISSUE bound, not FLOP bound, so k bands of width w at one issue each
    beat 4k bands of width w/4."""
    for w in (1024, 512, 256, 128):
        if nj % w == 0 and nj >= w:
            return w
    return 128


def _kernel_v3(idx_ref, w_ref, val_ref, out_ref, *, level_sizes,
               pairs_per_level):
    """v2 with wide bands: decompose t = hi*w + lo with w up to 1024 per
    level (v2 fixed w=128).  The W construction stays two small one-hot
    batched dots; the per-band val contraction becomes ~4-8x fewer issues
    (42 -> ~11 for the (4096, 1024, 256) pixel-decoder levels)."""
    bq = idx_ref.shape[1]
    c_ = val_ref.shape[2]
    p = pairs_per_level

    acc = jnp.zeros((bq, c_), jnp.float32)
    off = 0
    for j, nj in enumerate(level_sizes):
        width = _level_band_width(nj)
        hi_n = nj // width
        idx_j = idx_ref[0, :, j, :] - off                  # (BQ, P) local
        w_j = w_ref[0, :, j, :]
        hi = idx_j // width
        lo = idx_j - hi * width
        h_oh = (
            hi[:, :, None]
            == jax.lax.broadcasted_iota(jnp.int32, (bq, p, hi_n), 2)
        ).astype(jnp.float32)                              # (BQ, P, HI)
        l_oh = jnp.where(
            lo[:, :, None]
            == jax.lax.broadcasted_iota(jnp.int32, (bq, p, width), 2),
            w_j[:, :, None], 0.0,
        )                                                  # (BQ, P, W)
        w_mat = jax.lax.dot_general(
            h_oh, l_oh, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                                  # (BQ, HI, W)
        for hi_idx in range(hi_n):
            acc = acc + jax.lax.dot_general(
                w_mat[:, hi_idx, :],
                val_ref[0, off + hi_idx * width : off + (hi_idx + 1) * width, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        off += nj
    out_ref[0] = acc


def _kernel_v4(idx_ref, w_ref, val_ref, out_ref, *, level_sizes,
               pairs_per_level):
    """v2/v3 with bf16 one-hot operands.

    The unrolled per-query batched dot is operand-TRAFFIC bound, not
    MXU-issue bound (measured: fusing the 3 levels into one dot per query
    cuts issues 3x and ties v2 exactly; block-diagonal packing inflates
    operands with zeros and is 1.5x slower) — so halving the operand bytes
    with bf16 one-hots is the lever the issue-count experiments missed.
    Weights fold into the lo one-hot in bf16 (<=0.4% rel, inside the 2%
    Pallas parity budget); accumulation stays fp32 via
    preferred_element_type.  Band width follows _level_band_width (v3)."""
    bq = idx_ref.shape[1]
    c_ = val_ref.shape[2]
    p = pairs_per_level

    acc = jnp.zeros((bq, c_), jnp.float32)
    off = 0
    for j, nj in enumerate(level_sizes):
        width = _level_band_width(nj)
        hi_n = nj // width
        idx_j = idx_ref[0, :, j, :] - off                  # (BQ, P) local
        w_j = w_ref[0, :, j, :]
        hi = idx_j // width
        lo = idx_j - hi * width
        h_oh = (
            hi[:, :, None]
            == jax.lax.broadcasted_iota(jnp.int32, (bq, p, hi_n), 2)
        ).astype(jnp.bfloat16)                             # (BQ, P, HI)
        l_oh = (
            lo[:, :, None]
            == jax.lax.broadcasted_iota(jnp.int32, (bq, p, width), 2)
        ).astype(jnp.bfloat16) * w_j[:, :, None].astype(jnp.bfloat16)
        w_mat = jax.lax.dot_general(
            h_oh, l_oh, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,            # Mosaic: acc is 32-bit
        ).astype(jnp.bfloat16)                             # (BQ, HI, W)
        for hi_idx in range(hi_n):
            acc = acc + jax.lax.dot_general(
                w_mat[:, hi_idx, :],
                val_ref[0, off + hi_idx * width : off + (hi_idx + 1) * width, :]
                .astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        off += nj
    out_ref[0] = acc


_WINDOW_BANDS = 8
# Extra bands beyond the expected per-block spread (ceil(BQ*nj/n_pad/128)).
# The expected spread is usually 1 band, so slack dominates the windowed
# iteration count; overridable for microbench sweeps (tools/bench_msdetrpc).
_WINDOW_SLACK = int(__import__("os").environ.get("MSDETRPC_WINDOW_SLACK", 8))


def _kernel_v5(idx_ref, w_ref, val_ref, out_ref, acc_ref, *, level_sizes,
               pairs_per_level):
    """v2 with per-block band WINDOWING (exact, data-dependent speed).

    The 128 queries of one block are spatially contiguous (levels keep the
    backbone's space-filling order), their sampled locations cluster around
    them, and the 4-NN targets of nearby grid cells are nearby token indices
    — so per (query block, value level) the hit hi-bands concentrate in a
    narrow window.  Rebase to base=min(hi): when the spread fits in
    _WINDOW_BANDS bands, build W only that wide and run the per-band val
    dots against a dynamic val slice; otherwise fall back to the full-width
    v2 path in-kernel (bit-identical semantics either way — locality only
    buys speed, never changes results).  At init the sampling offsets are
    bias-only (radius <= n_points cells), so the window almost always fits;
    trained offsets stay small in practice (deformable-attention prior).

    Accumulates in a VMEM scratch because the branch arms are effectful."""
    bq = idx_ref.shape[1]
    c_ = val_ref.shape[2]
    p = pairs_per_level
    kw = _WINDOW_BANDS

    acc_ref[...] = jnp.zeros_like(acc_ref)
    off = 0
    for j, nj in enumerate(level_sizes):
        hi_n = nj // 128
        idx_j = idx_ref[0, :, j, :] - off                  # (BQ, P) local
        w_j = w_ref[0, :, j, :]
        hi = idx_j // 128
        lo = idx_j - hi * 128
        l_oh = jnp.where(
            lo[:, :, None]
            == jax.lax.broadcasted_iota(jnp.int32, (bq, p, 128), 2),
            w_j[:, :, None], 0.0,
        )                                                  # (BQ, P, 128)

        if hi_n <= kw:
            # level fits the window statically: plain v2
            h_oh = (
                hi[:, :, None]
                == jax.lax.broadcasted_iota(jnp.int32, (bq, p, hi_n), 2)
            ).astype(jnp.float32)
            w_mat = jax.lax.dot_general(
                h_oh, l_oh, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            for hi_idx in range(hi_n):
                acc_ref[...] += jax.lax.dot_general(
                    w_mat[:, hi_idx, :],
                    val_ref[0, off + hi_idx * 128 : off + (hi_idx + 1) * 128, :],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            off += nj
            continue

        base = jnp.min(hi)
        spread = jnp.max(hi) - base
        fits = jnp.logical_and(spread < kw, base >= 0)

        @pl.when(fits)
        def _fast(hi=hi, l_oh=l_oh, base=base, off=off):
            hiw = hi - base
            h_oh = (
                hiw[:, :, None]
                == jax.lax.broadcasted_iota(jnp.int32, (bq, p, kw), 2)
            ).astype(jnp.float32)                          # (BQ, P, KW)
            w_mat = jax.lax.dot_general(
                h_oh, l_oh, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )                                              # (BQ, KW, 128)
            for i in range(kw):
                start = off + (base + i) * 128
                acc_ref[...] += jax.lax.dot_general(
                    w_mat[:, i, :],
                    val_ref[0, pl.dslice(start, 128), :],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

        @pl.when(jnp.logical_not(fits))
        def _full(hi=hi, l_oh=l_oh, off=off, hi_n=hi_n):
            h_oh = (
                hi[:, :, None]
                == jax.lax.broadcasted_iota(jnp.int32, (bq, p, hi_n), 2)
            ).astype(jnp.float32)
            w_mat = jax.lax.dot_general(
                h_oh, l_oh, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            for hi_idx in range(hi_n):
                acc_ref[...] += jax.lax.dot_general(
                    w_mat[:, hi_idx, :],
                    val_ref[0, off + hi_idx * 128 : off + (hi_idx + 1) * 128, :],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

        off += nj
    out_ref[0] = acc_ref[...]


_V6_GROUP = 8       # queries packed block-diagonally into one MXU issue


def _kernel_v6(idxr_ref, wr_ref, val_ref, out_ref, s_ref, *, level_sizes,
               pairs_per_level):
    """Block-diagonal group packing: one FULL-DEPTH MXU issue per 8 queries.

    v2 is MXU op-ISSUE bound: its batched W dot unrolls into one tiny
    (P x hi_n)x(P x 128) matmul PER QUERY (~90 ns each regardless of size —
    measured: FLOP cuts, bf16, wide bands, and level fusion all tie).  v6
    restructures the same contraction so the MXU issue count drops ~4.7x:

      pack g = 8 queries; rows r = qhat*P + p (on SUBLANES — the wrapper
      supplies idx/w as (bh, L, n*P, 1) so no in-kernel relayout is needed);
      H[r, hi*8 + qhat] = 1[hi_r = hi and r//P = qhat]      (block-diagonal)
      L[r, lo]          = w_r * 1[lo_r = lo]
      R_g = H^T @ L     -> one 128-deep issue per group; rows hi*8 + qhat.

    R_g rows are copied band-contiguously into a VMEM scratch laid out
    [hi*128 + q, lo] so the per-band val dots afterwards are the same
    (128q x 128lo) x (128lo x c) issues as v2's.  Per 4096-query-level
    program: 16 + 32 issues vs v2's 128 + 32.  H/L build in bf16 (exact for
    one-hots; weights round at ~4e-3 rel, inside the 2% Pallas budget) so
    every dot runs single-pass on the MXU."""
    bq = out_ref.shape[1]
    c_ = val_ref.shape[2]
    p = pairs_per_level
    rows = _V6_GROUP * p                       # rows per group (= 128)
    n_groups = bq // _V6_GROUP

    acc = jnp.zeros((bq, c_), jnp.float32)
    off = 0
    for j, nj in enumerate(level_sizes):
        hi_n = nj // 128
        cw = hi_n * _V6_GROUP                  # columns: c = hi*8 + qhat
        c_hi = jax.lax.broadcasted_iota(jnp.int32, (rows, cw), 1) // _V6_GROUP
        c_q = jax.lax.broadcasted_iota(jnp.int32, (rows, cw), 1) % _V6_GROUP
        r_q = jax.lax.broadcasted_iota(jnp.int32, (rows, cw), 0) // p
        lo_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)

        for g in range(n_groups):
            sl = pl.dslice(g * rows, rows)
            idx_g = idxr_ref[0, j, sl, :]      # (rows, 1) level-local
            w_g = wr_ref[0, j, sl, :]
            hi_g = idx_g // 128
            lo_g = idx_g - hi_g * 128
            h_blk = jnp.logical_and(hi_g == c_hi, r_q == c_q).astype(
                jnp.bfloat16
            )                                  # (rows, cw)
            l_blk = jnp.where(lo_g == lo_iota, w_g, 0.0).astype(jnp.bfloat16)
            r_g = jax.lax.dot_general(
                h_blk, l_blk, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                  # (cw, 128): rows hi*8 + qhat
            for hi_idx in range(hi_n):
                s_ref[
                    hi_idx * bq + g * _V6_GROUP
                    : hi_idx * bq + (g + 1) * _V6_GROUP, :
                ] = r_g[hi_idx * _V6_GROUP : (hi_idx + 1) * _V6_GROUP, :]

        for hi_idx in range(hi_n):
            acc = acc + jax.lax.dot_general(
                s_ref[hi_idx * bq : (hi_idx + 1) * bq, :].astype(jnp.bfloat16),
                val_ref[0, off + hi_idx * 128 : off + (hi_idx + 1) * 128, :]
                .astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        off += nj
    out_ref[0] = acc


def _kernel_v7(idx_ref, w_ref, val_ref, out_ref, *, level_sizes,
               pairs_per_level):
    """v2 with 5-D (bh, n, L, P, 1) inputs: P arrives on SUBLANES.

    v2's one-hot builds broadcast idx_j[:, :, None] — a lanes->sublanes
    relayout of the P axis that Mosaic lowers through a slow copy path,
    measured at ~4.7 ms of the 11.2 ms call (vs ~0.3 ms of arithmetic).
    Supplying the trailing singleton from XLA keeps P on sublanes end to
    end, so the iota compares broadcast along lanes with no relayout."""
    bq = idx_ref.shape[1]
    c_ = val_ref.shape[2]
    p = pairs_per_level

    acc = jnp.zeros((bq, c_), jnp.float32)
    off = 0
    for j, nj in enumerate(level_sizes):
        hi_n = nj // 128
        idx_j = idx_ref[0, :, j, :, :] - off               # (BQ, P, 1) local
        w_j = w_ref[0, :, j, :, :]
        hi = idx_j // 128
        lo = idx_j - hi * 128
        h_oh = (
            hi == jax.lax.broadcasted_iota(jnp.int32, (bq, p, hi_n), 2)
        ).astype(jnp.float32)                              # (BQ, P, HI)
        l_oh = jnp.where(
            lo == jax.lax.broadcasted_iota(jnp.int32, (bq, p, 128), 2),
            w_j, 0.0,
        )                                                  # (BQ, P, 128)
        w_mat = jax.lax.dot_general(
            h_oh, l_oh, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                                  # (BQ, HI, 128)
        for hi_idx in range(hi_n):
            acc = acc + jax.lax.dot_general(
                w_mat[:, hi_idx, :],
                val_ref[0, off + hi_idx * 128 : off + (hi_idx + 1) * 128, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        off += nj
    out_ref[0] = acc


def _kernel(idx_ref, w_ref, val_ref, out_ref, *, level_sizes, pairs_per_level):
    """idx_ref/w_ref: (1, BQ, L, P) — value-table indices (global) and
    attn-folded weights, regrouped per level; val_ref: (1, ntot, c_)."""
    bq = idx_ref.shape[1]
    c_ = val_ref.shape[2]

    acc = jnp.zeros((bq, c_), jnp.float32)
    off = 0
    for j, nj in enumerate(level_sizes):
        idx_j = idx_ref[0, :, j, :]                       # (BQ, P)
        w_j = w_ref[0, :, j, :]
        col = jax.lax.broadcasted_iota(jnp.int32, (bq, nj), 1) + off
        wmat = jnp.zeros((bq, nj), jnp.float32)
        for p in range(pairs_per_level):
            wmat = wmat + jnp.where(
                idx_j[:, p : p + 1] == col, w_j[:, p : p + 1], 0.0
            )
        vblk = val_ref[0, off : off + nj, :]              # (nj, c_)
        acc = acc + jax.lax.dot_general(
            wmat, vblk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        off += nj
    out_ref[0] = acc


def _bwd_kernel(idx_ref, w_ref, val_ref, g_ref, dval_ref, dw_ref, *,
                level_sizes, pairs_per_level):
    """Gradient of _kernel_v2 wrt (folded weights, val) — see module
    docstring.  dval_ref is revisited across the query grid dimension and
    accumulated in place; dw_ref is per-query-block."""
    q_step = pl.program_id(1)
    bq = idx_ref.shape[1]
    p = pairs_per_level
    g = g_ref[0]                                           # (BQ, c_)

    @pl.when(q_step == 0)
    def _():
        dval_ref[0] = jnp.zeros_like(dval_ref[0])

    off = 0
    for j, nj in enumerate(level_sizes):
        hi_n = nj // 128
        idx_j = idx_ref[0, :, j, :] - off                  # (BQ, P) local
        w_j = w_ref[0, :, j, :]
        hi = idx_j // 128
        lo = idx_j - hi * 128
        lo_match = (
            lo[:, :, None]
            == jax.lax.broadcasted_iota(jnp.int32, (bq, p, 128), 2)
        )                                                  # (BQ, P, 128)
        h_oh = (
            hi[:, :, None]
            == jax.lax.broadcasted_iota(jnp.int32, (bq, p, hi_n), 2)
        ).astype(jnp.float32)                              # (BQ, P, HI)
        l_oh_w = jnp.where(lo_match, w_j[:, :, None], 0.0)
        l_oh_1 = lo_match.astype(jnp.float32)
        w_mat = jax.lax.dot_general(
            h_oh, l_oh_w, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                                  # (BQ, HI, 128)
        dw_j = jnp.zeros((bq, p), jnp.float32)
        for hi_idx in range(hi_n):
            lo_sl = slice(off + hi_idx * 128, off + (hi_idx + 1) * 128)
            # d_val[band] += W_band^T @ g  (contract the query dim)
            dval_ref[0, lo_sl, :] += jax.lax.dot_general(
                w_mat[:, hi_idx, :], g, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                              # (128, c_)
            # M_band[q, t] = g[q] . val[band t]
            m_hi = jax.lax.dot_general(
                g, val_ref[0, lo_sl, :], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                              # (BQ, 128)
            tmp = jax.lax.dot_general(
                l_oh_1, m_hi, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )                                              # (BQ, P)
            dw_j = dw_j + jnp.where(hi == hi_idx, tmp, 0.0)
        dw_ref[0, :, j, :] = dw_j
        off += nj


def _bwd_kernel_v2(idx_ref, w_ref, val_ref, g_ref, dval_ref, dw_ref, *,
                   level_sizes, pairs_per_level, bf16_dots=False):
    """Backward rebuilt with REGULAR matmuls only.

    v1 (_bwd_kernel) issues per level a q-batched w_mat dot plus, per
    128-band, a q-batched mat-vec for the dw extraction — Mosaic unrolls
    batched dots per leading dim (see module dead-ends), so the 4096-token
    level costs ~33 unrolled-by-128 dot sweeps.  Here each band instead
    masks the lo one-hot by its hi membership and feeds two well-shaped
    regular dots:

        w_band[q,lo] = sum_p w[q,p] 1[sel]          (VPU select+reduce)
        dval[band]  += w_band^T @ g                 ((128,BQ) @ (BQ,c))
        U[q,p,:]    += sel_f @ val_band             ((BQ*P,128) @ (128,c))
        dw[q,p]      = U[q,p,:] . g[q,:]            (VPU)

    bf16_dots additionally casts dot inputs to bf16 (fp32 accumulate) —
    one MXU pass instead of three; gradients under AMP arrive bf16-rounded
    anyway and the parity budget is the criterion's 2% relative."""
    q_step = pl.program_id(1)
    bq = idx_ref.shape[1]
    p = pairs_per_level
    g = g_ref[0]                                           # (BQ, c_)
    dt = jnp.bfloat16 if bf16_dots else jnp.float32
    g_d = g.astype(dt)

    @pl.when(q_step == 0)
    def _():
        dval_ref[0] = jnp.zeros_like(dval_ref[0])

    off = 0
    for j, nj in enumerate(level_sizes):
        hi_n = nj // 128
        idx_j = idx_ref[0, :, j, :] - off                  # (BQ, P) local
        w_j = w_ref[0, :, j, :]
        hi = idx_j // 128
        lo = idx_j - hi * 128
        lo_match = (
            lo[:, :, None]
            == jax.lax.broadcasted_iota(jnp.int32, (bq, p, 128), 2)
        )                                                  # (BQ, P, 128)
        hi_b = hi[:, :, None]        # int32: minor-dim insert is supported
        u_acc = jnp.zeros((bq, p, val_ref.shape[2]), jnp.float32)
        for hi_idx in range(hi_n):
            sel = lo_match & (hi_b == hi_idx)
            sel_f = sel.astype(dt)
            w_band = jnp.sum(
                jnp.where(sel, w_j[:, :, None], 0.0), axis=1
            )                                              # (BQ, 128)
            sl = slice(off + hi_idx * 128, off + (hi_idx + 1) * 128)
            dval_ref[0, sl, :] += jax.lax.dot_general(
                w_band.astype(dt), g_d, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                              # (128, c_)
            u_acc = u_acc + jax.lax.dot_general(
                sel_f, val_ref[0, sl, :].astype(dt),
                (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                              # (BQ, P, c_)
        dw_ref[0, :, j, :] = jnp.sum(u_acc * g[:, None, :], axis=-1)
        off += nj


def _bwd_kernel_v4(idx_ref, w_ref, val_ref, g_ref, dval_ref, dw_ref, *,
                   level_sizes, pairs_per_level, window=None, n_pad=None):
    """v2 backward with per-(block, level) band WINDOWING (exact).

    Unlike the forward (where windowing bought ~1% because the one-hot
    build is hoisted out of the band loop), the v2 backward does its
    select/reduce VPU work AND its two dots inside the band loop — so
    skipping the empty bands of a spatially-local query block cuts both.
    Window = _WINDOW_BANDS bands rebased at min(hi); full-width fallback
    when the spread doesn't fit (bit-identical numerics either way)."""
    q_step = pl.program_id(1)
    bq = idx_ref.shape[1]
    p = pairs_per_level
    g = g_ref[0]                                           # (BQ, c_)
    c_ = val_ref.shape[2]

    @pl.when(q_step == 0)
    def _():
        dval_ref[0] = jnp.zeros_like(dval_ref[0])

    off = 0
    for j, nj in enumerate(level_sizes):
        hi_n = nj // 128
        if window is None and n_pad is not None:
            # expected band footprint of one spatially-contiguous 128-query
            # block in level j, plus measured jitter slack: real spreads at
            # 512x512 are p95 = expected+6..8 bands (learned offsets +
            # Shepard 4-NN in adaptive token order + cluster-boundary
            # blocks; /tmp spread probe r2) — slack 8 keeps ~95% of blocks
            # on the fast path; the full-width fallback keeps misses exact
            kw = -(-bq * nj // n_pad) // 128 + _WINDOW_SLACK
            # dynamic (dslice) bands cost ~1.5-3x a static band, so window
            # only when it skips at least half the level
            if kw > hi_n // 2:
                kw = hi_n
        else:
            kw = _WINDOW_BANDS if window is None else window
        idx_j = idx_ref[0, :, j, :] - off                  # (BQ, P) local
        w_j = w_ref[0, :, j, :]
        hi = idx_j // 128
        lo = idx_j - hi * 128
        lo_match = (
            lo[:, :, None]
            == jax.lax.broadcasted_iota(jnp.int32, (bq, p, 128), 2)
        )
        hi_b = hi[:, :, None]

        def _bands(band_starts, hi_vals, u0):
            """band_starts[i]: dynamic row offset; hi_vals[i]: hi id."""
            u_acc = u0
            for start, hval in zip(band_starts, hi_vals):
                sel = lo_match & (hi_b == hval)
                sel_f = sel.astype(jnp.float32)
                w_band = jnp.sum(
                    jnp.where(sel, w_j[:, :, None], 0.0), axis=1
                )
                dval_ref[0, pl.dslice(start, 128), :] += jax.lax.dot_general(
                    w_band, g, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                u_acc = u_acc + jax.lax.dot_general(
                    sel_f, val_ref[0, pl.dslice(start, 128), :],
                    (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            return u_acc

        if hi_n <= kw:
            u_acc = _bands(
                [off + i * 128 for i in range(hi_n)], list(range(hi_n)),
                jnp.zeros((bq, p, c_), jnp.float32),
            )
            dw_ref[0, :, j, :] = jnp.sum(u_acc * g[:, None, :], axis=-1)
            off += nj
            continue

        base = jnp.min(hi)
        fits = (jnp.max(hi) - base) < kw
        # branch arms are effectful (dval writes); route dw through a ref
        dw_ref[0, :, j, :] = jnp.zeros((bq, p), jnp.float32)

        @pl.when(fits)
        def _fast(base=base, off=off):
            u_acc = _bands(
                [off + (base + i) * 128 for i in range(kw)],
                [base + i for i in range(kw)],
                jnp.zeros((bq, p, c_), jnp.float32),
            )
            dw_ref[0, :, j, :] = jnp.sum(u_acc * g[:, None, :], axis=-1)

        @pl.when(jnp.logical_not(fits))
        def _full(off=off, hi_n=hi_n):
            u_acc = _bands(
                [off + i * 128 for i in range(hi_n)], list(range(hi_n)),
                jnp.zeros((bq, p, c_), jnp.float32),
            )
            dw_ref[0, :, j, :] = jnp.sum(u_acc * g[:, None, :], axis=-1)

        off += nj


def _bwd_kernel_v7(idx_ref, w_ref, val_ref, g_ref, dvalt_ref, dw_ref, *,
                   level_sizes, pairs_per_level, n_pad):
    """v4 with the two MXU whales restructured (r3):

    1. d_w via dense score matrix instead of row extraction.  v2/v4 extract
       U[q,p,:] = val[idx[q,p],:] per band with a (BQ*P, 128) x (128, c_)
       dot — 2048 streamed rows at 32/128 output lanes per band, the
       backward's dominant MXU term — then reduce U.g at the end.  But
       d_w[q,p] = g[q].val[idx[q,p]] = M[q, idx[q,p]] for the dense score
       matrix M = g @ val^T, so per band ONE (BQ, c_) x (c_, 128) dot
       (128 streamed rows, full lanes) + a VPU masked lane-reduce replaces
       it: ~16x fewer streamed MXU rows.  Also kills the fp32 (BQ, P, c_)
       u_acc that v2/v4 hold live across the whole band loop (64 vregs).
    2. dval accumulated TRANSPOSED.  v2/v4's dval update (128t, BQ)@(BQ, c_)
       writes c_=32 of 128 output lanes; contracting BQ the other way —
       (c_, BQ')@(BQ', 128t) via dot_general on (g, w_band), no operand
       transposes — fills all 128 lanes.  dval lives banded-transposed
       (n_bands, c_, 128) in-kernel; the wrapper untransposes once in XLA.

    Same adaptive band windowing + full-width fallback as v4
    (bit-identical numerics on either path)."""
    q_step = pl.program_id(1)
    bq = idx_ref.shape[1]
    p = pairs_per_level
    g = g_ref[0]                                           # (BQ, c_)

    @pl.when(q_step == 0)
    def _():
        dvalt_ref[0] = jnp.zeros_like(dvalt_ref[0])

    off = 0
    for j, nj in enumerate(level_sizes):
        hi_n = nj // 128
        kw = -(-bq * nj // n_pad) // 128 + _WINDOW_SLACK
        if kw > hi_n // 2:       # dynamic bands cost more; see _bwd_kernel_v4
            kw = hi_n
        idx_j = idx_ref[0, :, j, :] - off                  # (BQ, P) local
        w_j = w_ref[0, :, j, :]
        hi = idx_j // 128
        lo = idx_j - hi * 128
        lo_match = (
            lo[:, :, None]
            == jax.lax.broadcasted_iota(jnp.int32, (bq, p, 128), 2)
        )
        hi_b = hi[:, :, None]
        band0 = off // 128

        def _bands(tok_starts, band_idxs, hi_vals):
            dwa = jnp.zeros((bq, p), jnp.float32)
            for start, band, hval in zip(tok_starts, band_idxs, hi_vals):
                sel = lo_match & (hi_b == hval)
                w_band = jnp.sum(
                    jnp.where(sel, w_j[:, :, None], 0.0), axis=1
                )                                          # (BQ, 128)
                dvalt_ref[0, pl.dslice(band, 1), :, :] += jax.lax.dot_general(
                    g, w_band, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )[None]                                    # (1, c_, 128)
                m = jax.lax.dot_general(
                    g, val_ref[0, pl.dslice(start, 128), :],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )                                          # (BQ, 128)
                dwa = dwa + jnp.sum(
                    jnp.where(sel, m[:, None, :], 0.0), axis=2
                )
            return dwa

        if hi_n <= kw:
            dw_ref[0, :, j, :] = _bands(
                [off + i * 128 for i in range(hi_n)],
                [band0 + i for i in range(hi_n)],
                list(range(hi_n)),
            )
            off += nj
            continue

        base = jnp.min(hi)
        fits = (jnp.max(hi) - base) < kw
        dw_ref[0, :, j, :] = jnp.zeros((bq, p), jnp.float32)

        @pl.when(fits)
        def _fast(base=base, off=off, band0=band0):
            dw_ref[0, :, j, :] = _bands(
                [off + (base + i) * 128 for i in range(kw)],
                [band0 + base + i for i in range(kw)],
                [base + i for i in range(kw)],
            )

        @pl.when(jnp.logical_not(fits))
        def _full(off=off, band0=band0, hi_n=hi_n):
            dw_ref[0, :, j, :] = _bands(
                [off + i * 128 for i in range(hi_n)],
                [band0 + i for i in range(hi_n)],
                list(range(hi_n)),
            )

        off += nj


def _bwd_kernel_v8(idx_ref, w_ref, val_ref, g_ref, dval_ref, dw_ref, *,
                   level_sizes, pairs_per_level, n_pad, dval_t):
    """v7's dense-score d_w with the masked lane-REDUCE replaced by a lane
    GATHER: d_w[q,p] = M_band[q, lo[q,p]] when hi[q,p]==band, where
    M_band = g @ val_band^T.  take_along_axis lowers to tpu.dynamic_gather
    (same primitive as the criterion's row-stratified nearest kernel,
    point_sample_kernel.py:314) — per band one (BQ, P) gather + a tiny mask
    instead of v7's (BQ, P, 128) where+sum or v4/v6's 2048-row extraction
    dot.  dval_t selects v7's transposed accumulation (full 128 output
    lanes) vs v4's (128t, c_) orientation, so the two changes measure
    independently."""
    q_step = pl.program_id(1)
    bq = idx_ref.shape[1]
    p = pairs_per_level
    g = g_ref[0]                                           # (BQ, c_)

    @pl.when(q_step == 0)
    def _():
        dval_ref[0] = jnp.zeros_like(dval_ref[0])

    off = 0
    for j, nj in enumerate(level_sizes):
        hi_n = nj // 128
        kw = -(-bq * nj // n_pad) // 128 + _WINDOW_SLACK
        if kw > hi_n // 2:
            kw = hi_n
        idx_j = idx_ref[0, :, j, :] - off                  # (BQ, P) local
        w_j = w_ref[0, :, j, :]
        hi = idx_j // 128
        lo = idx_j - hi * 128
        lo_match = (
            lo[:, :, None]
            == jax.lax.broadcasted_iota(jnp.int32, (bq, p, 128), 2)
        )
        hi_b = hi[:, :, None]
        band0 = off // 128
        # Mosaic's dynamic_gather lowering needs indices shaped like the
        # input (full 128 lanes); gathering 128 costs the same as P — it is
        # one per-vreg op — so pad lo out and slice the first P lanes back.
        lo_pad = jnp.pad(lo, ((0, 0), (0, 128 - p)))       # (BQ, 128)

        def _bands(tok_starts, band_idxs, hi_vals):
            dwa = jnp.zeros((bq, p), jnp.float32)
            for start, band, hval in zip(tok_starts, band_idxs, hi_vals):
                sel = lo_match & (hi_b == hval)
                w_band = jnp.sum(
                    jnp.where(sel, w_j[:, :, None], 0.0), axis=1
                )                                          # (BQ, 128)
                if dval_t:
                    dval_ref[0, pl.dslice(band, 1), :, :] += (
                        jax.lax.dot_general(
                            g, w_band, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )[None]
                    )                                      # (1, c_, 128)
                else:
                    dval_ref[0, pl.dslice(start, 128), :] += (
                        jax.lax.dot_general(
                            w_band, g, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                    )                                      # (128, c_)
                m = jax.lax.dot_general(
                    g, val_ref[0, pl.dslice(start, 128), :],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )                                          # (BQ, 128)
                got = jnp.take_along_axis(m, lo_pad, axis=1)[:, :p]
                dwa = dwa + jnp.where(hi == hval, got, 0.0)
            return dwa

        if hi_n <= kw:
            dw_ref[0, :, j, :] = _bands(
                [off + i * 128 for i in range(hi_n)],
                [band0 + i for i in range(hi_n)],
                list(range(hi_n)),
            )
            off += nj
            continue

        base = jnp.min(hi)
        fits = (jnp.max(hi) - base) < kw
        dw_ref[0, :, j, :] = jnp.zeros((bq, p), jnp.float32)

        @pl.when(fits)
        def _fast(base=base, off=off, band0=band0):
            dw_ref[0, :, j, :] = _bands(
                [off + (base + i) * 128 for i in range(kw)],
                [band0 + base + i for i in range(kw)],
                [base + i for i in range(kw)],
            )

        @pl.when(jnp.logical_not(fits))
        def _full(off=off, band0=band0, hi_n=hi_n):
            dw_ref[0, :, j, :] = _bands(
                [off + i * 128 for i in range(hi_n)],
                [band0 + i for i in range(hi_n)],
                list(range(hi_n)),
            )

        off += nj


def _bwd_kernel_v10(idx_ref, w_ref, val_ref, g_ref, dval_ref, dw_ref, *,
                    level_sizes, pairs_per_level, n_pad, two_tier=False,
                    bf16_dots=True):
    """v9 with the band loop's MXU dots on explicit bf16 operands: a single
    MXU pass instead of the f32 multi-pass decomposition, accumulating in
    f32 via preferred_element_type (w_band entries are shepard*attn products
    in [0, 1] — bf16 rounding is ~2^-8 relative, inside the kernel's
    budgeted-parity bounds).  The (BQ, P, 128) select+reduce stays f32:
    Mosaic rejects both bf16 minor-dim insertion and broadcasting a narrowed
    (BQ, P, 1) bf16 against the i1 mask.

    ``two_tier`` adds a narrow first window (expected spread + 2 bands)
    before the standard slack-8 window and the exact full-width fallback —
    blocks with tight spread (the common case in the microbench's jitter
    model) skip ~7 dynamic bands; real-model spread decides end to end.
    """
    q_step = pl.program_id(1)
    bq = idx_ref.shape[1]
    p = pairs_per_level
    g = g_ref[0]                                           # (BQ, c_)
    g16 = g.astype(jnp.bfloat16) if bf16_dots else g

    @pl.when(q_step == 0)
    def _():
        dval_ref[0] = jnp.zeros_like(dval_ref[0])

    off = 0
    for j, nj in enumerate(level_sizes):
        hi_n = nj // 128
        kw_exp = -(-bq * nj // n_pad) // 128
        kw = kw_exp + _WINDOW_SLACK
        if kw > hi_n // 2:
            kw = hi_n
        kw1 = min(kw_exp + 2, kw)
        idx_j = idx_ref[0, :, j, :] - off                  # (BQ, P) local
        w_j = w_ref[0, :, j, :]
        hi = idx_j // 128
        lo = idx_j - hi * 128
        lo_match = (
            lo[:, :, None]
            == jax.lax.broadcasted_iota(jnp.int32, (bq, p, 128), 2)
        )
        hi_b = hi[:, :, None]
        band0 = off // 128
        lo_pad = jnp.pad(lo, ((0, 0), (0, 128 - p)))       # (BQ, 128)

        def _bands(tok_starts, band_idxs, hi_vals):
            dwa = jnp.zeros((bq, p), jnp.float32)
            for start, band, hval in zip(tok_starts, band_idxs, hi_vals):
                sel = lo_match & (hi_b == hval)
                # the select+reduce stays f32 (Mosaic cannot broadcast a
                # narrowed (BQ, P, 1) bf16 against the i1 mask — measured
                # compile failures, see git history)
                w_band = jnp.sum(
                    jnp.where(sel, w_j[:, :, None], 0.0), axis=1
                )                                          # (BQ, 128)
                if bf16_dots:
                    w_band = w_band.astype(jnp.bfloat16)
                dval_ref[0, pl.dslice(start, 128), :] += (
                    jax.lax.dot_general(
                        w_band, g16, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                )                                          # (128, c_)
                vb = val_ref[0, pl.dslice(start, 128), :]
                if bf16_dots:
                    vb = vb.astype(jnp.bfloat16)
                m = jax.lax.dot_general(
                    g16, vb, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )                                          # (BQ, 128)
                got = jnp.take_along_axis(m, lo_pad, axis=1)[:, :p]
                dwa = dwa + jnp.where(hi == hval, got, 0.0)
            return dwa

        if hi_n <= kw:
            dw_ref[0, :, j, :] = _bands(
                [off + i * 128 for i in range(hi_n)],
                [band0 + i for i in range(hi_n)],
                list(range(hi_n)),
            )
            off += nj
            continue

        base = jnp.min(hi)
        spread = jnp.max(hi) - base
        dw_ref[0, :, j, :] = jnp.zeros((bq, p), jnp.float32)

        def _tier(width, base=base, off=off, band0=band0):
            dw_ref[0, :, j, :] = _bands(
                [off + (base + i) * 128 for i in range(width)],
                [band0 + base + i for i in range(width)],
                [base + i for i in range(width)],
            )

        if two_tier and kw1 < kw:
            @pl.when(spread < kw1)
            def _t1():
                _tier(kw1)

            @pl.when((spread >= kw1) & (spread < kw))
            def _t2():
                _tier(kw)

            @pl.when(spread >= kw)
            def _full(off=off, band0=band0, hi_n=hi_n):
                dw_ref[0, :, j, :] = _bands(
                    [off + i * 128 for i in range(hi_n)],
                    [band0 + i for i in range(hi_n)],
                    list(range(hi_n)),
                )
        else:
            @pl.when(spread < kw)
            def _fast():
                _tier(kw)

            @pl.when(spread >= kw)
            def _full2(off=off, band0=band0, hi_n=hi_n):
                dw_ref[0, :, j, :] = _bands(
                    [off + i * 128 for i in range(hi_n)],
                    [band0 + i for i in range(hi_n)],
                    list(range(hi_n)),
                )

        off += nj


def _pad_to(x, mult, axis, value=0):
    pad = (-x.shape[axis]) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def msdetrpc_pallas_supported(nn_idx, val, n_levels: int,
                              level_sizes: Sequence[int]) -> bool:
    ntot = val.shape[1]
    return (
        sum(level_sizes) == ntot
        and all(nj % 128 == 0 for nj in level_sizes)
        and nn_idx.shape[2] % n_levels == 0
    )


def _regroup(nn_idx, nn_weight, attn, n_levels: int):
    """Fold attn into the Shepard weights and regroup slots (k, l) into
    per-level pair blocks, padded to BLOCK_Q queries.  Slot s = ki*n_levels+j
    (levels interleave fastest in the stacked m axis — pixel_decoder.py:221).
    Returns (idx, wr): (bh, n_pad, n_levels, pairs)."""
    bh, n, m, kk = nn_idx.shape
    kpts = m // n_levels
    pairs = kpts * kk
    w = nn_weight * attn[..., None]
    idx = nn_idx.reshape(bh, n, kpts, n_levels, kk).transpose(0, 1, 3, 2, 4)
    idx = idx.reshape(bh, n, n_levels, pairs)
    wr = w.reshape(bh, n, kpts, n_levels, kk).transpose(0, 1, 3, 2, 4)
    wr = wr.reshape(bh, n, n_levels, pairs).astype(jnp.float32)
    idx = _pad_to(idx, BLOCK_Q, 1, value=0)
    wr = _pad_to(wr, BLOCK_Q, 1, value=0.0)     # zero weights: pad rows inert
    return idx, wr


def msdetrpc_pallas_impl(nn_idx, nn_weight, attn, val,
                         level_sizes: Tuple[int, ...], version: int = 2,
                         interpret: bool = False):
    bh, n, m, kk = nn_idx.shape
    ntot, c_ = val.shape[1:]
    n_levels = len(level_sizes)
    assert m % n_levels == 0
    pairs = (m // n_levels) * kk

    idx, wr = _regroup(nn_idx, nn_weight, attn, n_levels)
    n_pad = idx.shape[1]
    val_f = val.astype(jnp.float32)
    nqb = n_pad // BLOCK_Q

    if version == 6:
        # r-major (sublane) layout with level-local indices — see _kernel_v6
        offs = np.cumsum([0] + list(level_sizes))[:-1]
        idx_l = idx - jnp.asarray(offs, jnp.int32)[None, None, :, None]
        idxr = idx_l.transpose(0, 2, 1, 3).reshape(
            bh, n_levels, n_pad * pairs, 1
        )
        wrr = wr.transpose(0, 2, 1, 3).reshape(bh, n_levels, n_pad * pairs, 1)
        out = pl.pallas_call(
            functools.partial(
                _kernel_v6, level_sizes=tuple(level_sizes),
                pairs_per_level=pairs,
            ),
            grid=(bh, nqb),
            in_specs=[
                pl.BlockSpec((1, n_levels, BLOCK_Q * pairs, 1),
                             lambda b, q: (b, 0, q, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n_levels, BLOCK_Q * pairs, 1),
                             lambda b, q: (b, 0, q, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ntot, c_), lambda b, q: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, BLOCK_Q, c_), lambda b, q: (b, q, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bh, n_pad, c_), jnp.float32),
            scratch_shapes=[pltpu.VMEM((max(level_sizes), 128), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(idxr, wrr, val_f)
        return out[:, :n]

    if version == 7:
        out = pl.pallas_call(
            functools.partial(
                _kernel_v7, level_sizes=tuple(level_sizes),
                pairs_per_level=pairs,
            ),
            grid=(bh, nqb),
            in_specs=[
                pl.BlockSpec((1, BLOCK_Q, n_levels, pairs, 1),
                             lambda b, q: (b, q, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BLOCK_Q, n_levels, pairs, 1),
                             lambda b, q: (b, q, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ntot, c_), lambda b, q: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, BLOCK_Q, c_), lambda b, q: (b, q, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bh, n_pad, c_), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(idx[..., None], wr[..., None], val_f)
        return out[:, :n]

    kernel = functools.partial(
        {1: _kernel, 2: _kernel_v2, 3: _kernel_v3, 4: _kernel_v4,
         5: _kernel_v5}[version],
        level_sizes=tuple(level_sizes), pairs_per_level=pairs,
    )
    common = dict(
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * bh * nqb * BLOCK_Q * ntot * (pairs + c_),
            bytes_accessed=bh * (ntot * c_ * 4 + n_pad * n_levels * pairs * 8),
            transcendentals=0,
        ),
        interpret=interpret,
    )
    if version == 5:
        common["scratch_shapes"] = [pltpu.VMEM((BLOCK_Q, c_), jnp.float32)]
    out = pl.pallas_call(
        kernel,
        grid=(bh, nqb),
        in_specs=[
            pl.BlockSpec((1, BLOCK_Q, n_levels, pairs), lambda b, q: (b, q, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_Q, n_levels, pairs), lambda b, q: (b, q, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ntot, c_), lambda b, q: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BLOCK_Q, c_), lambda b, q: (b, q, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, n_pad, c_), jnp.float32),
        **common,
    )(idx, wr, val_f)
    return out[:, :n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def msdetrpc_pallas(nn_idx, nn_weight, attn, val, level_sizes):
    """Fused deformable point-cloud sampling (see module docstring).

    level_sizes: static tuple of per-level token counts; their segments
    partition the value table in order (all multiples of 128)."""
    return msdetrpc_pallas_impl(nn_idx, nn_weight, attn, val, level_sizes)


def _fwd(nn_idx, nn_weight, attn, val, level_sizes):
    return msdetrpc_pallas_impl(nn_idx, nn_weight, attn, val, level_sizes), (
        nn_idx, nn_weight, attn, val,
    )


def _bwd_kernel_by_version(version: int, level_sizes, pairs: int,
                           n_pad: int | None = None):
    if version == 1:
        return functools.partial(
            _bwd_kernel, level_sizes=tuple(level_sizes), pairs_per_level=pairs,
        )
    if version in (4, 5, 6):
        return functools.partial(
            _bwd_kernel_v4, level_sizes=tuple(level_sizes),
            pairs_per_level=pairs,
            window={4: 8, 5: 4, 6: None}[version], n_pad=n_pad,
        )
    if version == 7:
        return functools.partial(
            _bwd_kernel_v7, level_sizes=tuple(level_sizes),
            pairs_per_level=pairs, n_pad=n_pad,
        )
    if version in (8, 9):
        return functools.partial(
            _bwd_kernel_v8, level_sizes=tuple(level_sizes),
            pairs_per_level=pairs, n_pad=n_pad, dval_t=(version == 8),
        )
    # NOTE: bwd version 12 is the head-natural-layout kernel
    # (_bwd_kernel_v12, bh path only) — not reachable from here.
    if version in (10, 11, 13):
        return functools.partial(
            _bwd_kernel_v10, level_sizes=tuple(level_sizes),
            pairs_per_level=pairs, n_pad=n_pad, two_tier=(version != 10),
            bf16_dots=(version != 13),
        )
    return functools.partial(
        _bwd_kernel_v2, level_sizes=tuple(level_sizes), pairs_per_level=pairs,
        bf16_dots=(version == 3),
    )


# r3 backward campaign (bench_msdetrpc_bwd, batch-4 512x512 shapes, ms per
# encoder layer = sum of the three level calls):
#   v6 (windowed select+reduce + 2048-row extraction dot)   34.1
#   v7 (dense-score d_w, masked lane-REDUCE extraction,
#       transposed dval)                                    35.2  — the
#       (BQ,P,128) where+sum costs more VPU than the extraction dot cost MXU
#   v8 (dense-score d_w via lane GATHER, transposed dval)   23.0
#   v9 (= v8 with v4's dval orientation)                    22.0  — DEFAULT
# The win is replacing the per-band (BQ*P,128)x(128,c_) extraction dot with
# M_band = g @ val_band^T (one 128-row dot) + a per-vreg tpu.dynamic_gather
# (take_along_axis) at lo — same primitive as the criterion's
# row-stratified nearest kernel.  Transposing the dval accumulation to fill
# all 128 output lanes (v8 vs v9) measures slightly NEGATIVE — the
# (c_,128) banded writes relayout worse than the narrow dot they fix.
#   v10 (bf16 band dots)                                    23.6  — REGRESSION:
#       with --xla_allow_excess_precision the f32 dots were already single
#       MXU passes; the casts are pure overhead.  Kept for the record.
#   v11 (two-tier window + bf16 dots)                       19.6
#   v13 (two-tier window, f32 dots)                         18.9  — DEFAULT
# Two-tier windowing: a narrow first window (expected spread + 2 bands)
# handles tight blocks, v9's slack-8 window is the middle rung, full width
# stays the exact fallback — so unlike the r3 slack sweep (which removed the
# middle rung and regressed end to end on real spreads) the worst case per
# block is one extra scalar branch.
BWD_VERSION = 13


def _run_bwd_kernel(idx, wr, val_f, g_f, level_sizes, pairs, n_pad,
                    interpret=False, version=None):
    """Shared pallas_call for the regrouped-layout backward kernels.
    Returns (dval (bh, ntot, c_), dwr (bh, n_pad, L, P)).  v7 accumulates
    dval banded-transposed in-kernel (see _bwd_kernel_v7) and untransposes
    here in XLA."""
    version = BWD_VERSION if version is None else version
    bh = idx.shape[0]
    ntot, c_ = val_f.shape[1:]
    n_levels = len(level_sizes)
    nqb = n_pad // BLOCK_Q
    kernel = _bwd_kernel_by_version(version, level_sizes, pairs, n_pad)
    in_specs = [
        pl.BlockSpec((1, BLOCK_Q, n_levels, pairs), lambda b, q: (b, q, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, BLOCK_Q, n_levels, pairs), lambda b, q: (b, q, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ntot, c_), lambda b, q: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, BLOCK_Q, c_), lambda b, q: (b, q, 0),
                     memory_space=pltpu.VMEM),
    ]
    dw_spec = pl.BlockSpec((1, BLOCK_Q, n_levels, pairs),
                           lambda b, q: (b, q, 0, 0),
                           memory_space=pltpu.VMEM)
    dw_shape = jax.ShapeDtypeStruct((bh, n_pad, n_levels, pairs), jnp.float32)
    cost = pl.CostEstimate(
        flops=2 * bh * nqb * BLOCK_Q * ntot * (2 * pairs + 2 * c_),
        bytes_accessed=bh * (2 * ntot * c_ * 4
                             + n_pad * (n_levels * pairs * 3 + c_) * 4),
        transcendentals=0,
    )
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    if version in (7, 8):
        n_bands = ntot // 128
        dvalt, dwr = pl.pallas_call(
            kernel,
            grid=(bh, nqb),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((1, n_bands, c_, 128), lambda b, q: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                dw_spec,
            ],
            out_shape=[
                jax.ShapeDtypeStruct((bh, n_bands, c_, 128), jnp.float32),
                dw_shape,
            ],
            compiler_params=params,
            cost_estimate=cost,
            interpret=interpret,
        )(idx, wr, val_f, g_f)
        dval = dvalt.transpose(0, 1, 3, 2).reshape(bh, ntot, c_)
        return dval, dwr
    dval, dwr = pl.pallas_call(
        kernel,
        grid=(bh, nqb),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, ntot, c_), lambda b, q: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            dw_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, ntot, c_), jnp.float32),
            dw_shape,
        ],
        compiler_params=params,
        cost_estimate=cost,
        interpret=interpret,
    )(idx, wr, val_f, g_f)
    return dval, dwr


def msdetrpc_pallas_bwd_impl(nn_idx, nn_weight, attn, val, g,
                             level_sizes: Tuple[int, ...],
                             interpret: bool = False,
                             version: int | None = None):
    """Pallas VJP: returns (d_nn_weight, d_attn, d_val)."""
    bh, n, m, kk = nn_idx.shape
    ntot, c_ = val.shape[1:]
    n_levels = len(level_sizes)
    kpts = m // n_levels
    pairs = kpts * kk

    idx, wr = _regroup(nn_idx, nn_weight, attn, n_levels)
    n_pad = idx.shape[1]
    nqb = n_pad // BLOCK_Q
    val_f = val.astype(jnp.float32)
    g_f = _pad_to(g.astype(jnp.float32), BLOCK_Q, 1, value=0.0)

    dval, dwr = _run_bwd_kernel(idx, wr, val_f, g_f, level_sizes, pairs,
                                n_pad, interpret=interpret, version=version)

    # un-regroup the folded-weight gradient back to (bh, n, m, kk)
    d_wfold = dwr[:, :n].reshape(bh, n, n_levels, kpts, kk)
    d_wfold = d_wfold.transpose(0, 1, 3, 2, 4).reshape(bh, n, m, kk)
    d_nn_weight = (d_wfold * attn[..., None]).astype(nn_weight.dtype)
    d_attn = jnp.sum(d_wfold * nn_weight, axis=-1).astype(attn.dtype)
    return d_nn_weight, d_attn, dval.astype(val.dtype)


def _bwd(level_sizes, res, g):
    nn_idx, nn_weight, attn, val = res
    dw, da, dv = msdetrpc_pallas_bwd_impl(
        nn_idx, nn_weight, attn, val, g, level_sizes
    )
    return None, dw, da, dv


msdetrpc_pallas.defvjp(_fwd, _bwd)


def _kernel_v8(*args, level_sizes, pairs_per_level):
    """v2 body on PER-LEVEL refs with level-local indices.

    The interleaved (bh, n, k*l, m) layout forced two relayouts per call:
    the stack+transpose in XLA emitted {1,0,3,2}->{3,2,1,0} copies on both
    kernel operands (~0.6 ms each at the 4096-query level, x2 operands x6
    layers).  Feeding each level's (bh, n, pairs) block straight from its
    producer keeps everything in the natural row-major layout end to end."""
    n_levels = len(level_sizes)
    idx_refs = args[:n_levels]
    w_refs = args[n_levels : 2 * n_levels]
    val_ref = args[2 * n_levels]
    out_ref = args[2 * n_levels + 1]
    bq = out_ref.shape[1]
    c_ = val_ref.shape[2]
    p = pairs_per_level

    acc = jnp.zeros((bq, c_), jnp.float32)
    off = 0
    for j, nj in enumerate(level_sizes):
        hi_n = nj // 128
        idx_j = idx_refs[j][0]                             # (BQ, P) local
        w_j = w_refs[j][0]
        hi = idx_j // 128
        lo = idx_j - hi * 128
        h_oh = (
            hi[:, :, None]
            == jax.lax.broadcasted_iota(jnp.int32, (bq, p, hi_n), 2)
        ).astype(jnp.float32)
        l_oh = jnp.where(
            lo[:, :, None]
            == jax.lax.broadcasted_iota(jnp.int32, (bq, p, 128), 2),
            w_j[:, :, None], 0.0,
        )
        w_mat = jax.lax.dot_general(
            h_oh, l_oh, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        for hi_idx in range(hi_n):
            acc = acc + jax.lax.dot_general(
                w_mat[:, hi_idx, :],
                val_ref[0, off + hi_idx * 128 : off + (hi_idx + 1) * 128, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        off += nj
    out_ref[0] = acc


def _kernel_v10(*args, level_sizes, pairs_per_level):
    """v8 with bf16 MXU operands (fp32 accumulate).

    v8 feeds fp32 one-hots to every dot; fp32 matmuls on the MXU run as
    multiple bf16 passes, so the 128-unrolled batched W dot — the measured
    per-program cost center — pays the multi-pass price on every issue.
    One-hots are EXACT in bf16; the folded weights round at ~4e-3 relative
    (inside the 2% Pallas parity budget); accumulation stays fp32 via
    preferred_element_type.  Same structure as v8 otherwise."""
    n_levels = len(level_sizes)
    idx_refs = args[:n_levels]
    w_refs = args[n_levels : 2 * n_levels]
    val_ref = args[2 * n_levels]
    out_ref = args[2 * n_levels + 1]
    bq = out_ref.shape[1]
    c_ = val_ref.shape[2]
    p = pairs_per_level

    acc = jnp.zeros((bq, c_), jnp.float32)
    off = 0
    for j, nj in enumerate(level_sizes):
        hi_n = nj // 128
        idx_j = idx_refs[j][0]                             # (BQ, P) local
        w_j = w_refs[j][0]
        hi = idx_j // 128
        lo = idx_j - hi * 128
        h_oh = (
            hi[:, :, None]
            == jax.lax.broadcasted_iota(jnp.int32, (bq, p, hi_n), 2)
        ).astype(jnp.bfloat16)
        l_oh = (
            lo[:, :, None]
            == jax.lax.broadcasted_iota(jnp.int32, (bq, p, 128), 2)
        ).astype(jnp.bfloat16) * w_j[:, :, None].astype(jnp.bfloat16)
        w_mat = jax.lax.dot_general(
            h_oh, l_oh, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
        for hi_idx in range(hi_n):
            acc = acc + jax.lax.dot_general(
                w_mat[:, hi_idx, :],
                val_ref[0, off + hi_idx * 128 : off + (hi_idx + 1) * 128, :]
                .astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        off += nj
    out_ref[0] = acc


def _kernel_v11(*args, level_sizes, pairs_per_level):
    """v8 with v7's SUBLANE pair layout: per-level refs arrive (1, BQ, P, 1).

    v8 broadcasts idx_j[:, :, None] in-kernel — a lanes->sublanes relayout
    of the P axis that Mosaic lowers through a slow copy path (v7 measured
    it at ~4.7 ms of an 11.2 ms interleaved call).  The trailing singleton
    supplied from XLA keeps P on sublanes end to end; the iota compares then
    broadcast along lanes with no relayout.  Otherwise identical to v8."""
    n_levels = len(level_sizes)
    idx_refs = args[:n_levels]
    w_refs = args[n_levels : 2 * n_levels]
    val_ref = args[2 * n_levels]
    out_ref = args[2 * n_levels + 1]
    bq = out_ref.shape[1]
    c_ = val_ref.shape[2]
    p = pairs_per_level

    acc = jnp.zeros((bq, c_), jnp.float32)
    off = 0
    for j, nj in enumerate(level_sizes):
        hi_n = nj // 128
        idx_j = idx_refs[j][0]                             # (BQ, P, 1) local
        w_j = w_refs[j][0]
        hi = idx_j // 128
        lo = idx_j - hi * 128
        h_oh = (
            hi == jax.lax.broadcasted_iota(jnp.int32, (bq, p, hi_n), 2)
        ).astype(jnp.float32)                              # (BQ, P, HI)
        l_oh = jnp.where(
            lo == jax.lax.broadcasted_iota(jnp.int32, (bq, p, 128), 2),
            w_j, 0.0,
        )                                                  # (BQ, P, 128)
        w_mat = jax.lax.dot_general(
            h_oh, l_oh, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        for hi_idx in range(hi_n):
            acc = acc + jax.lax.dot_general(
                w_mat[:, hi_idx, :],
                val_ref[0, off + hi_idx * 128 : off + (hi_idx + 1) * 128, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        off += nj
    out_ref[0] = acc


def _kernel_v9(*args, level_sizes, pairs_per_level, n_pad):
    """v8 with per-band masked reduce + adaptive band WINDOWING (exact).

    Replaces v8's q-batched w_mat dot (Mosaic unrolls batched dots per
    leading dim) with a per-band VPU select+reduce, and — the real win —
    skips the hi-bands a spatially-contiguous query block never touches:
    window = ceil(BQ*nj/n/128)+3 bands rebased at min(hi), full-width
    fallback when the spread doesn't fit (bit-identical either way).  Same
    restructure as _bwd_kernel_v4, measured there at -54% per layer."""
    n_levels = len(level_sizes)
    idx_refs = args[:n_levels]
    w_refs = args[n_levels : 2 * n_levels]
    val_ref = args[2 * n_levels]
    out_ref = args[2 * n_levels + 1]
    acc_ref = args[2 * n_levels + 2]
    bq = out_ref.shape[1]
    p = pairs_per_level

    acc_ref[...] = jnp.zeros_like(acc_ref)
    off = 0
    for j, nj in enumerate(level_sizes):
        hi_n = nj // 128
        kw = -(-bq * nj // n_pad) // 128 + _WINDOW_SLACK
        if kw > hi_n // 2:       # see _bwd_kernel_v4: dynamic bands cost more
            kw = hi_n
        idx_j = idx_refs[j][0]                             # (BQ, P) local
        w_j = w_refs[j][0]
        hi = idx_j // 128
        lo = idx_j - hi * 128
        lo_match = (
            lo[:, :, None]
            == jax.lax.broadcasted_iota(jnp.int32, (bq, p, 128), 2)
        )
        hi_b = hi[:, :, None]

        def _bands(band_starts, hi_vals):
            for start, hval in zip(band_starts, hi_vals):
                sel = lo_match & (hi_b == hval)
                w_band = jnp.sum(
                    jnp.where(sel, w_j[:, :, None], 0.0), axis=1
                )                                          # (BQ, 128)
                acc_ref[...] += jax.lax.dot_general(
                    w_band, val_ref[0, pl.dslice(start, 128), :],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

        if hi_n <= kw:
            _bands([off + i * 128 for i in range(hi_n)], list(range(hi_n)))
            off += nj
            continue

        base = jnp.min(hi)
        fits = (jnp.max(hi) - base) < kw

        @pl.when(fits)
        def _fast(base=base, off=off):
            _bands(
                [off + (base + i) * 128 for i in range(kw)],
                [base + i for i in range(kw)],
            )

        @pl.when(jnp.logical_not(fits))
        def _full(off=off, hi_n=hi_n):
            _bands([off + i * 128 for i in range(hi_n)], list(range(hi_n)))

        off += nj
    out_ref[0] = acc_ref[...]


def _kernel_v13(*args, level_sizes, pairs_per_level, n_pad):
    """No-MXU forward: per-(band, pair) lane GATHERS from a transposed
    value table (the backward-v9 insight applied to the forward).

        out^T[ch, q] = sum_p w[q,p] * valT_band[ch, lo[q,p]]   when hi==band

    Everything arrives pre-transposed from XLA so no in-kernel relayouts:
    idx/w per level as (P, BQ) with queries on LANES, val banded-transposed
    (n_bands, c_, 128) with tokens on lanes, out written (c_, BQ) and
    untransposed once outside.  Per (band, pair): one (1,BQ) where, one
    (c_,128) tpu.dynamic_gather (take_along_axis — per-vreg, same primitive
    as _bwd_kernel_v8), one fma into a register accumulator.  Exact fp32
    (no bf16 MXU passes), and band-windowed like v9 with the full-width
    fallback (bit-identical on either path)."""
    n_levels = len(level_sizes)
    idx_refs = args[:n_levels]                             # (1, P, BQ)
    w_refs = args[n_levels : 2 * n_levels]
    val_ref = args[2 * n_levels]                           # (1, nb, c_, 128)
    out_ref = args[2 * n_levels + 1]                       # (1, c_, BQ)
    acc_ref = args[2 * n_levels + 2]                       # scratch (c_, BQ)
    c_ = out_ref.shape[1]
    bq = out_ref.shape[2]
    p = pairs_per_level

    acc_ref[...] = jnp.zeros_like(acc_ref)
    off = 0
    for j, nj in enumerate(level_sizes):
        hi_n = nj // 128
        kw = -(-bq * nj // n_pad) // 128 + _WINDOW_SLACK
        if kw > hi_n // 2:       # see _bwd_kernel_v4: dynamic bands cost more
            kw = hi_n
        idx_j = idx_refs[j][0]                             # (P, BQ) local
        w_j = w_refs[j][0]
        hi = idx_j // 128
        lo = idx_j - hi * 128
        band0 = off // 128

        def _bands(band_idxs, hi_vals, hi=hi, lo=lo, w_j=w_j, band0=band0):
            acc = jnp.zeros((c_, bq), jnp.float32)
            for band, hval in zip(band_idxs, hi_vals):
                vt = val_ref[0, pl.dslice(band0 + band, 1)][0]  # (c_, 128)
                for p_i in range(p):
                    wsel = jnp.where(
                        hi[p_i : p_i + 1, :] == hval,
                        w_j[p_i : p_i + 1, :], 0.0,
                    )                                      # (1, BQ)
                    g = jnp.take_along_axis(
                        vt,
                        jnp.broadcast_to(lo[p_i : p_i + 1, :], (c_, bq)),
                        axis=1,
                    )                                      # (c_, BQ)
                    acc = acc + g * wsel
            acc_ref[...] += acc

        if hi_n <= kw:
            _bands(list(range(hi_n)), list(range(hi_n)))
            off += nj
            continue

        base = jnp.min(hi)
        fits = (jnp.max(hi) - base) < kw

        @pl.when(fits)
        def _fast(base=base, _bands=_bands):
            _bands([base + i for i in range(kw)],
                   [base + i for i in range(kw)])

        @pl.when(jnp.logical_not(fits))
        def _full(hi_n=hi_n, _bands=_bands):
            _bands(list(range(hi_n)), list(range(hi_n)))

        off += nj
    out_ref[0] = acc_ref[...]


# r3 forward campaign (bench_msdetrpc_bwd-style methodology; BENCH_LEVELS=1
# BENCH_LOCAL=1 tools/bench_msdetrpc.py, batch-4 512x512 shapes, ms per
# encoder layer = sum of the three level calls):
#   v8  (one-hot x MXU W build + band dots)                 14.00
#   v9  (windowed, masked select+reduce W build)            ~14    — at the
#       measured spread (+8 bands slack) the dynamic-slice bands cost back
#       what the skipping saves (18.49 vs 18.76 im/s end to end)
#   v13 (windowed lane-GATHER, no MXU at all)                7.31  — DEFAULT
# v13 is also EXACT fp32 (v8's dots run at bf16 MXU precision), so the
# Pallas/XLA parity gap on the inference path shrinks with the speedup.
#
# _WINDOW_SLACK sweep (measured dead end): the microbench (jitter +-64
# ranks) says slack 2/4 cut v13 to 4.33/5.54 ms/layer, but END TO END the
# real model REGRESSES (27.39 -> 23.89 im/s at slack 2): real 128-query
# blocks span more hi-bands than the synthetic jitter models (SFC rank
# spread of a deformed 2-D neighborhood), so tight windows trip the exact
# full-width fallback often enough to lose more than the window saves.
# Slack 8 stands; don't re-tighten without measuring the fallback rate on
# the real model first.
FWD_VERSION = 13


def _run_fwd_v13(idx_t, w_t, val_f, level_sizes, pairs, n_pad,
                 interpret=False):
    """Shared pallas_call for the v13 lane-gather forward.  idx_t/w_t:
    per-level (bh, pairs, n_pad) with queries MINOR; val_f: (bh, ntot, c_)
    fp32.  Returns (bh, c_, n_pad) — callers untranspose (or consume
    channel-major directly)."""
    bh = idx_t[0].shape[0]
    ntot, c_ = val_f.shape[1:]
    n_levels = len(level_sizes)
    nqb = n_pad // BLOCK_Q
    n_bands = ntot // 128
    val_t = val_f.reshape(bh, n_bands, 128, c_).transpose(0, 1, 3, 2)
    lvl_spec = pl.BlockSpec((1, pairs, BLOCK_Q), lambda b, q: (b, 0, q),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(
            _kernel_v13, level_sizes=tuple(level_sizes),
            pairs_per_level=pairs, n_pad=n_pad,
        ),
        grid=(bh, nqb),
        in_specs=[lvl_spec] * (2 * n_levels) + [
            pl.BlockSpec((1, n_bands, c_, 128), lambda b, q: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c_, BLOCK_Q), lambda b, q: (b, 0, q),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, c_, n_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((c_, BLOCK_Q), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*idx_t, *w_t, val_t)


def msdetrpc_pallas_levels_impl(idxs, ws, val, level_sizes: Tuple[int, ...],
                                interpret: bool = False,
                                version: int | None = None):
    """Per-level forward: idxs/ws are per-level (bh, n, pairs) arrays with
    LEVEL-LOCAL indices and attention already folded into the weights."""
    bh, n, pairs = idxs[0].shape
    ntot, c_ = val.shape[1:]
    n_levels = len(level_sizes)

    idx_p = [_pad_to(i.astype(jnp.int32), BLOCK_Q, 1) for i in idxs]
    w_p = [_pad_to(w.astype(jnp.float32), BLOCK_Q, 1) for w in ws]
    n_pad = idx_p[0].shape[1]
    nqb = n_pad // BLOCK_Q
    val_f = val.astype(jnp.float32)

    version = FWD_VERSION if version is None else version
    if version == 0:
        # windowing pays when many bands can be skipped (large n: queries
        # per block span few bands); at small n the dynamic branch overhead
        # loses to v8's static sweep (measured 9.5 vs 10.9 ms at n=4096,
        # 1.34 vs 0.94 ms at n=256)
        version = 9 if n >= 2048 else 8
    if version == 9:
        kernel = functools.partial(
            _kernel_v9, level_sizes=tuple(level_sizes),
            pairs_per_level=pairs, n_pad=n_pad,
        )
        scratch = [pltpu.VMEM((BLOCK_Q, c_), jnp.float32)]
    elif version == 10:
        kernel = functools.partial(
            _kernel_v10, level_sizes=tuple(level_sizes), pairs_per_level=pairs,
        )
        scratch = []
    elif version == 13:
        # lane-gather forward: everything pre-transposed in XLA (queries on
        # lanes, value table banded-transposed); see _kernel_v13
        idx_t = [i.transpose(0, 2, 1) for i in idx_p]      # (bh, P, n_pad)
        w_t = [w.transpose(0, 2, 1) for w in w_p]
        out = _run_fwd_v13(idx_t, w_t, val_f, level_sizes, pairs, n_pad,
                           interpret)
        return out.transpose(0, 2, 1)[:, :n]
    elif version == 11:
        kernel = functools.partial(
            _kernel_v11, level_sizes=tuple(level_sizes), pairs_per_level=pairs,
        )
        scratch = []
        lvl_spec = pl.BlockSpec((1, BLOCK_Q, pairs, 1),
                                lambda b, q: (b, q, 0, 0),
                                memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kernel,
            grid=(bh, nqb),
            in_specs=[lvl_spec] * (2 * n_levels) + [
                pl.BlockSpec((1, ntot, c_), lambda b, q: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, BLOCK_Q, c_), lambda b, q: (b, q, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bh, n_pad, c_), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(*[i[..., None] for i in idx_p], *[w[..., None] for w in w_p], val_f)
        return out[:, :n]
    else:
        kernel = functools.partial(
            _kernel_v8, level_sizes=tuple(level_sizes), pairs_per_level=pairs,
        )
        scratch = []

    lvl_spec = pl.BlockSpec((1, BLOCK_Q, pairs), lambda b, q: (b, q, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(bh, nqb),
        in_specs=[lvl_spec] * (2 * n_levels) + [
            pl.BlockSpec((1, ntot, c_), lambda b, q: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BLOCK_Q, c_), lambda b, q: (b, q, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, n_pad, c_), jnp.float32),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * bh * nqb * BLOCK_Q * ntot * (pairs + c_),
            bytes_accessed=bh * (ntot * c_ * 4
                                 + n_pad * n_levels * pairs * 8),
            transcendentals=0,
        ),
        interpret=interpret,
    )(*idx_p, *w_p, val_f)
    return out[:, :n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def msdetrpc_pallas_levels(idxs, ws, val, level_sizes):
    """Per-level-input variant of msdetrpc_pallas (no interleaved layout).

    idxs: tuple of (bh, n, pairs) int32, level-LOCAL value indices
    ws:   tuple of (bh, n, pairs) f32, shepard weights with attention folded
    val:  (bh, ntot, c_); level_sizes partition its token axis."""
    return msdetrpc_pallas_levels_impl(idxs, ws, val, level_sizes)


def _fwd_levels(idxs, ws, val, level_sizes):
    return msdetrpc_pallas_levels_impl(idxs, ws, val, level_sizes), (
        idxs, ws, val,
    )


def _bwd_levels_impl(idxs, ws, val, g, level_sizes, interpret=False):
    """Reuse the regrouped-layout backward kernel: the regrouped layout IS
    per-level contiguous, so assembling it is a plain stack (training-only
    path; inference never pays it)."""
    bh, n, pairs = idxs[0].shape
    ntot, c_ = val.shape[1:]
    n_levels = len(level_sizes)
    offs = np.cumsum([0] + list(level_sizes))[:-1]

    idx = jnp.stack(
        [i + int(o) for i, o in zip(idxs, offs)], axis=2
    )                                                   # (bh, n, L, P) global
    wr = jnp.stack(ws, axis=2).astype(jnp.float32)
    idx = _pad_to(idx, BLOCK_Q, 1, value=0)
    wr = _pad_to(wr, BLOCK_Q, 1, value=0.0)
    n_pad = idx.shape[1]
    nqb = n_pad // BLOCK_Q
    val_f = val.astype(jnp.float32)
    g_f = _pad_to(g.astype(jnp.float32), BLOCK_Q, 1, value=0.0)

    dval, dwr = _run_bwd_kernel(idx, wr, val_f, g_f, level_sizes, pairs,
                                n_pad, interpret=interpret)

    d_ws = tuple(
        dwr[:, :n, j].astype(ws[j].dtype) for j in range(n_levels)
    )
    d_idxs = tuple(jnp.zeros_like(i) for i in idxs)
    return d_idxs, d_ws, dval.astype(val.dtype)


def _bwd_levels(level_sizes, res, g):
    idxs, ws, val = res
    return _bwd_levels_impl(idxs, ws, val, g, level_sizes)


msdetrpc_pallas_levels.defvjp(_fwd_levels, _bwd_levels)


def msdetrpc_pallas_levels_t_impl(idx_ts, w_ts, val,
                                  level_sizes: Tuple[int, ...],
                                  interpret: bool = False):
    """Pre-transposed per-level forward: idx_ts/w_ts are (bh, pairs, n) with
    queries on the MINOR axis — exactly the layout _kernel_v13 consumes, so
    producers that build their operands channel-major (the pixel decoder's
    fused prep path) skip the (bh, n, P) -> (bh, P, n) wrapper relayouts that
    cost ~0.6 ms each at the 4096-query level.  Returns (bh, n, c_)."""
    bh, pairs, n = idx_ts[0].shape
    idx_t = [_pad_to(i.astype(jnp.int32), BLOCK_Q, 2) for i in idx_ts]
    w_t = [_pad_to(w.astype(jnp.float32), BLOCK_Q, 2) for w in w_ts]
    n_pad = idx_t[0].shape[2]
    out = _run_fwd_v13(idx_t, w_t, val.astype(jnp.float32),
                       level_sizes, pairs, n_pad, interpret)
    return out.transpose(0, 2, 1)[:, :n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def msdetrpc_pallas_levels_t(idx_ts, w_ts, val, level_sizes):
    """Pre-transposed-layout variant of msdetrpc_pallas_levels.

    idx_ts: tuple of (bh, pairs, n) int32 level-LOCAL indices, queries minor
    w_ts:   tuple of (bh, pairs, n) f32 shepard*attention weights
    val:    (bh, ntot, c_); level_sizes partitions its token axis."""
    return msdetrpc_pallas_levels_t_impl(idx_ts, w_ts, val, level_sizes)


def _fwd_levels_t(idx_ts, w_ts, val, level_sizes):
    return msdetrpc_pallas_levels_t_impl(idx_ts, w_ts, val, level_sizes), (
        idx_ts, w_ts, val,
    )


def _bwd_levels_t(level_sizes, res, g):
    """Training-only: untranspose to the regrouped layout and reuse the
    lane-gather backward kernel (_run_bwd_kernel)."""
    idx_ts, w_ts, val = res
    d_idxs, d_ws, d_val = _bwd_levels(
        level_sizes,
        (tuple(i.transpose(0, 2, 1) for i in idx_ts),
         tuple(w.transpose(0, 2, 1) for w in w_ts), val),
        g,
    )
    return (tuple(di.transpose(0, 2, 1) for di in d_idxs),
            tuple(dw.transpose(0, 2, 1) for dw in d_ws), d_val)


msdetrpc_pallas_levels_t.defvjp(_fwd_levels_t, _bwd_levels_t)


def _kernel_v14(idx_ref, w_ref, val_ref, out_ref, acc_ref, *, level_sizes,
                pairs_per_level, n_pad):
    """Stacked-operand v13: identical math/band-windowing to _kernel_v13,
    but the per-level idx/w operands arrive as ONE stacked (1, L*P, BQ)
    ref each (static sublane slices pick level j's rows) so XLA materializes
    ONE (bh, n, L*P) -> (bh, L*P, n) relayout per array instead of L, and
    the output stays (c_, BQ) — the wrapper returns it channel-major for
    the consumer to fold into the output projection's dot_general.
    val_ref: (1, nb, c_, 128)."""
    c_ = out_ref.shape[1]
    bq = out_ref.shape[2]
    p = pairs_per_level

    acc_ref[...] = jnp.zeros_like(acc_ref)
    off = 0
    for j, nj in enumerate(level_sizes):
        hi_n = nj // 128
        kw = -(-bq * nj // n_pad) // 128 + _WINDOW_SLACK
        if kw > hi_n // 2:
            kw = hi_n
        idx_j = idx_ref[0, j * p:(j + 1) * p, :]           # (P, BQ) local
        w_j = w_ref[0, j * p:(j + 1) * p, :]
        hi = idx_j // 128
        lo = idx_j - hi * 128
        band0 = off // 128

        def _bands(band_idxs, hi_vals, hi=hi, lo=lo, w_j=w_j, band0=band0):
            acc = jnp.zeros((c_, bq), jnp.float32)
            for band, hval in zip(band_idxs, hi_vals):
                vt = val_ref[0, pl.dslice(band0 + band, 1)][0]  # (c_, 128)
                for p_i in range(p):
                    wsel = jnp.where(
                        hi[p_i : p_i + 1, :] == hval,
                        w_j[p_i : p_i + 1, :], 0.0,
                    )
                    g = jnp.take_along_axis(
                        vt,
                        jnp.broadcast_to(lo[p_i : p_i + 1, :], (c_, bq)),
                        axis=1,
                    )
                    acc = acc + g * wsel
            acc_ref[...] += acc

        if hi_n <= kw:
            _bands(list(range(hi_n)), list(range(hi_n)))
            off += nj
            continue

        base = jnp.min(hi)
        fits = (jnp.max(hi) - base) < kw

        @pl.when(fits)
        def _fast(base=base, _bands=_bands):
            _bands([base + i for i in range(kw)],
                   [base + i for i in range(kw)])

        @pl.when(jnp.logical_not(fits))
        def _full(hi_n=hi_n, _bands=_bands):
            _bands(list(range(hi_n)), list(range(hi_n)))

        off += nj
    out_ref[0] = acc_ref[...]


def _run_fwd_v14(idx_st, w_st, val_f, level_sizes, pairs, n_pad,
                 interpret=False):
    """pallas_call for the stacked v14 forward.  idx_st/w_st: (bh, L*P,
    n_pad) with queries minor; val_f: (bh, ntot, c_) fp32.  Returns
    (bh, c_, n_pad) channel-major."""
    bh, lp, _ = idx_st.shape
    ntot, c_ = val_f.shape[1:]
    nqb = n_pad // BLOCK_Q
    n_bands = ntot // 128
    val_t = val_f.reshape(bh, n_bands, 128, c_).transpose(0, 1, 3, 2)
    stk_spec = pl.BlockSpec((1, lp, BLOCK_Q), lambda b, q: (b, 0, q),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(
            _kernel_v14, level_sizes=tuple(level_sizes),
            pairs_per_level=pairs, n_pad=n_pad,
        ),
        grid=(bh, nqb),
        in_specs=[stk_spec, stk_spec,
                  pl.BlockSpec((1, n_bands, c_, 128), lambda b, q: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, c_, BLOCK_Q), lambda b, q: (b, 0, q),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, c_, n_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((c_, BLOCK_Q), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(idx_st, w_st, val_t)


def msdetrpc_pallas_levels_s_impl(idx_s, w_s, val,
                                  level_sizes: Tuple[int, ...],
                                  interpret: bool = False):
    """Stacked-operand forward: idx_s/w_s are (bh, n, L*P) with the L levels
    concatenated on the pair axis (level-LOCAL indices).  The wrapper pays
    ONE (bh, n, L*P) -> (bh, L*P, n) relayout per operand (vs L in
    msdetrpc_pallas_levels) and returns the kernel's output CHANNEL-MAJOR
    (bh, c_, n) so the consumer can absorb the untranspose into its output
    projection's dot_general."""
    bh, n, lp = idx_s.shape
    pairs = lp // len(level_sizes)
    idx_p = _pad_to(idx_s.astype(jnp.int32), BLOCK_Q, 1)
    w_p = _pad_to(w_s.astype(jnp.float32), BLOCK_Q, 1)
    n_pad = idx_p.shape[1]
    out = _run_fwd_v14(idx_p.transpose(0, 2, 1), w_p.transpose(0, 2, 1),
                       val.astype(jnp.float32), level_sizes, pairs, n_pad,
                       interpret)
    return out[:, :, :n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def msdetrpc_pallas_levels_s(idx_s, w_s, val, level_sizes):
    """Stacked-layout variant of msdetrpc_pallas_levels.

    idx_s: (bh, n, L*pairs) int32 level-LOCAL indices, levels stacked on the
           pair axis (level j occupies columns [j*pairs, (j+1)*pairs))
    w_s:   (bh, n, L*pairs) f32 shepard*attention weights, same stacking
    val:   (bh, ntot, c_); level_sizes partitions its token axis.
    Returns (bh, c_, n) CHANNEL-MAJOR."""
    return msdetrpc_pallas_levels_s_impl(idx_s, w_s, val, level_sizes)


def _fwd_levels_s(idx_s, w_s, val, level_sizes):
    return msdetrpc_pallas_levels_s_impl(idx_s, w_s, val, level_sizes), (
        idx_s, w_s, val,
    )


def msdetrpc_pallas_levels_s_bwd_impl(idx_s, w_s, val, g, level_sizes,
                                      interpret=False):
    """Training-only: split the stacked operands per level and reuse the
    lane-gather backward (_bwd_levels_impl); g arrives channel-major
    (bh, c_, n).  Returns (d_idx_s zeros, d_w_s stacked, d_val)."""
    p = idx_s.shape[2] // len(level_sizes)
    idxs = tuple(idx_s[:, :, j * p:(j + 1) * p]
                 for j in range(len(level_sizes)))
    ws = tuple(w_s[:, :, j * p:(j + 1) * p]
               for j in range(len(level_sizes)))
    _, d_ws, d_val = _bwd_levels_impl(idxs, ws, val, g.transpose(0, 2, 1),
                                      level_sizes, interpret=interpret)
    return (jnp.zeros_like(idx_s), jnp.concatenate(d_ws, axis=2), d_val)


def _bwd_levels_s(level_sizes, res, g):
    idx_s, w_s, val = res
    return msdetrpc_pallas_levels_s_bwd_impl(idx_s, w_s, val, g, level_sizes)


msdetrpc_pallas_levels_s.defvjp(_fwd_levels_s, _bwd_levels_s)


# ---------------------------------------------------------------------------
# Head-natural layout path (r3): the (b, n, h, ...) tensors coming out of the
# pixel decoder's Dense producers are consumed DIRECTLY — the grid's (b*h)
# programs route heads via BlockSpec index maps instead of XLA transposes.
# The measured ~31 ms of per-layer (b, n, h, X) -> (b*h, n, X) relayouts
# around the kernel calls (145.6 in-context - 84 kernel - 29 gathers - 1.3
# shepard) disappears; the kernel body is v8's, bit-identical results.
# ---------------------------------------------------------------------------


def _kernel_v12(*args, level_sizes, pairs_per_level, n_heads):
    """v8 body on head-natural (1, BQ, h, P)-blocked per-level refs: the
    head loop runs in-kernel (grid is (b, nqb)); slicing [0, :, h_i, :] is
    the same static mid-dim slice v2 used for its level axis."""
    n_levels = len(level_sizes)
    idx_refs = args[:n_levels]
    w_refs = args[n_levels : 2 * n_levels]
    val_ref = args[2 * n_levels]
    out_ref = args[2 * n_levels + 1]
    bq = out_ref.shape[1]
    c_ = val_ref.shape[3]
    p = pairs_per_level

    for h_i in range(n_heads):
        acc = jnp.zeros((bq, c_), jnp.float32)
        off = 0
        for j, nj in enumerate(level_sizes):
            hi_n = nj // 128
            idx_j = idx_refs[j][0, :, h_i, :]              # (BQ, P) local
            w_j = w_refs[j][0, :, h_i, :]
            hi = idx_j // 128
            lo = idx_j - hi * 128
            h_oh = (
                hi[:, :, None]
                == jax.lax.broadcasted_iota(jnp.int32, (bq, p, hi_n), 2)
            ).astype(jnp.float32)
            l_oh = jnp.where(
                lo[:, :, None]
                == jax.lax.broadcasted_iota(jnp.int32, (bq, p, 128), 2),
                w_j[:, :, None], 0.0,
            )
            w_mat = jax.lax.dot_general(
                h_oh, l_oh, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            for hi_idx in range(hi_n):
                acc = acc + jax.lax.dot_general(
                    w_mat[:, hi_idx, :],
                    val_ref[0, off + hi_idx * 128
                            : off + (hi_idx + 1) * 128, h_i, :],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            off += nj
        out_ref[0, :, h_i, :] = acc


def _bwd_kernel_v12(*args, level_sizes, pairs_per_level, n_pad, n_heads):
    """_bwd_kernel_v4 (windowed, exact) on head-natural per-level refs; the
    head loop runs in-kernel (grid (b, nqb))."""
    n_levels = len(level_sizes)
    idx_refs = args[:n_levels]
    w_refs = args[n_levels : 2 * n_levels]
    val_ref = args[2 * n_levels]
    g_ref = args[2 * n_levels + 1]
    dval_ref = args[2 * n_levels + 2]
    dw_refs = args[2 * n_levels + 3 :]

    q_step = pl.program_id(1)
    bq = g_ref.shape[1]
    p = pairs_per_level
    c_ = val_ref.shape[3]

    @pl.when(q_step == 0)
    def _():
        dval_ref[0] = jnp.zeros_like(dval_ref[0])

    for h_i in range(n_heads):
        g = g_ref[0, :, h_i, :]                            # (BQ, c_)
        off = 0
        for j, nj in enumerate(level_sizes):
            hi_n = nj // 128
            kw = -(-bq * nj // n_pad) // 128 + _WINDOW_SLACK
            if kw > hi_n // 2:
                kw = hi_n
            idx_j = idx_refs[j][0, :, h_i, :]              # (BQ, P) local
            w_j = w_refs[j][0, :, h_i, :]
            hi = idx_j // 128
            lo = idx_j - hi * 128
            lo_match = (
                lo[:, :, None]
                == jax.lax.broadcasted_iota(jnp.int32, (bq, p, 128), 2)
            )
            hi_b = hi[:, :, None]

            def _bands(band_starts, hi_vals, u0, lo_match=lo_match,
                       hi_b=hi_b, w_j=w_j, g=g, h_i=h_i):
                u_acc = u0
                for start, hval in zip(band_starts, hi_vals):
                    sel = lo_match & (hi_b == hval)
                    sel_f = sel.astype(jnp.float32)
                    w_band = jnp.sum(
                        jnp.where(sel, w_j[:, :, None], 0.0), axis=1
                    )
                    dval_ref[0, pl.dslice(start, 128), h_i, :] += (
                        jax.lax.dot_general(
                            w_band, g, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                    )
                    u_acc = u_acc + jax.lax.dot_general(
                        sel_f, val_ref[0, pl.dslice(start, 128), h_i, :],
                        (((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                return u_acc

            if hi_n <= kw:
                u_acc = _bands(
                    [off + i * 128 for i in range(hi_n)], list(range(hi_n)),
                    jnp.zeros((bq, p, c_), jnp.float32),
                )
                dw_refs[j][0, :, h_i, :] = jnp.sum(
                    u_acc * g[:, None, :], axis=-1
                )
                off += nj
                continue

            base = jnp.min(hi)
            fits = (jnp.max(hi) - base) < kw
            dw_refs[j][0, :, h_i, :] = jnp.zeros((bq, p), jnp.float32)

            @pl.when(fits)
            def _fast(base=base, off=off, j=j, kw=kw, _bands=_bands,
                      g=g, h_i=h_i):
                u_acc = _bands(
                    [off + (base + i) * 128 for i in range(kw)],
                    [base + i for i in range(kw)],
                    jnp.zeros((bq, p, c_), jnp.float32),
                )
                dw_refs[j][0, :, h_i, :] = jnp.sum(
                    u_acc * g[:, None, :], axis=-1
                )

            @pl.when(jnp.logical_not(fits))
            def _full(off=off, hi_n=hi_n, j=j, _bands=_bands, g=g, h_i=h_i):
                u_acc = _bands(
                    [off + i * 128 for i in range(hi_n)], list(range(hi_n)),
                    jnp.zeros((bq, p, c_), jnp.float32),
                )
                dw_refs[j][0, :, h_i, :] = jnp.sum(
                    u_acc * g[:, None, :], axis=-1
                )

            off += nj


def msdetrpc_pallas_bh_impl(idxs, ws, val, level_sizes: Tuple[int, ...],
                            interpret: bool = False):
    """Head-natural forward.

    idxs/ws: per level (b, n, h, pairs) — level-LOCAL indices, attention
    folded into the weights; val: (b, ntot, h, c_).  Returns (b, n, h, c_).
    """
    b, n, h, pairs = idxs[0].shape
    ntot, c_ = val.shape[1], val.shape[3]
    n_levels = len(level_sizes)

    idx_p = [_pad_to(i.astype(jnp.int32), BLOCK_Q, 1) for i in idxs]
    w_p = [_pad_to(w.astype(jnp.float32), BLOCK_Q, 1) for w in ws]
    n_pad = idx_p[0].shape[1]
    nqb = n_pad // BLOCK_Q
    val_f = val.astype(jnp.float32)

    lvl_spec = pl.BlockSpec(
        (1, BLOCK_Q, h, pairs), lambda b_, q: (b_, q, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel_v12, level_sizes=tuple(level_sizes),
            pairs_per_level=pairs, n_heads=h,
        ),
        grid=(b, nqb),
        in_specs=[lvl_spec] * (2 * n_levels) + [
            pl.BlockSpec((1, ntot, h, c_), lambda b_, q: (b_, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BLOCK_Q, h, c_), lambda b_, q: (b_, q, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, h, c_), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * nqb * BLOCK_Q * ntot * (pairs + c_),
            bytes_accessed=b * h * (ntot * c_ * 4
                                    + n_pad * n_levels * pairs * 8),
            transcendentals=0,
        ),
        interpret=interpret,
    )(*idx_p, *w_p, val_f)
    return out[:, :n]


def _bh_fwd(idxs, ws, val, level_sizes):
    return msdetrpc_pallas_bh_impl(idxs, ws, val, level_sizes), (idxs, ws, val)


def msdetrpc_pallas_bh_bwd_impl(idxs, ws, val, g, level_sizes,
                                interpret: bool = False):
    b, n, h, pairs = idxs[0].shape
    ntot, c_ = val.shape[1], val.shape[3]
    n_levels = len(level_sizes)

    idx_p = [_pad_to(i.astype(jnp.int32), BLOCK_Q, 1) for i in idxs]
    w_p = [_pad_to(w.astype(jnp.float32), BLOCK_Q, 1) for w in ws]
    n_pad = idx_p[0].shape[1]
    nqb = n_pad // BLOCK_Q
    val_f = val.astype(jnp.float32)
    g_f = _pad_to(g.astype(jnp.float32), BLOCK_Q, 1)

    lvl_spec = pl.BlockSpec(
        (1, BLOCK_Q, h, pairs), lambda b_, q: (b_, q, 0, 0),
        memory_space=pltpu.VMEM,
    )
    val_spec = pl.BlockSpec((1, ntot, h, c_), lambda b_, q: (b_, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec((1, BLOCK_Q, h, c_), lambda b_, q: (b_, q, 0, 0),
                          memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(
            _bwd_kernel_v12, level_sizes=tuple(level_sizes),
            pairs_per_level=pairs, n_pad=n_pad, n_heads=h,
        ),
        grid=(b, nqb),
        in_specs=[lvl_spec] * (2 * n_levels) + [val_spec, g_spec],
        out_specs=[val_spec] + [lvl_spec] * n_levels,
        out_shape=[jax.ShapeDtypeStruct((b, ntot, h, c_), jnp.float32)]
        + [jax.ShapeDtypeStruct((b, n_pad, h, pairs), jnp.float32)] * n_levels,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*idx_p, *w_p, val_f, g_f)
    dval = outs[0]
    d_ws = tuple(outs[1 + j][:, :n].astype(ws[j].dtype)
                 for j in range(n_levels))
    d_idxs = tuple(jnp.zeros_like(i) for i in idxs)
    return d_idxs, d_ws, dval.astype(val.dtype)


def _bh_bwd(level_sizes, res, g):
    idxs, ws, val = res
    return msdetrpc_pallas_bh_bwd_impl(idxs, ws, val, g, level_sizes)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def msdetrpc_pallas_bh(idxs, ws, val, level_sizes):
    """Head-natural-layout deformable sampling (no XLA head transposes).

    idxs: tuple of (b, n, h, pairs) int32 level-LOCAL value indices
    ws:   tuple of (b, n, h, pairs) f32 shepard*attention weights
    val:  (b, ntot, h, c_); level_sizes partitions its token axis."""
    return msdetrpc_pallas_bh_impl(idxs, ws, val, level_sizes)


msdetrpc_pallas_bh.defvjp(_bh_fwd, _bh_bwd)
