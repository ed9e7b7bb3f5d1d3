"""Windowed row-gather Pallas kernel: table lookups at VPU speed.

XLA row-gathers on TPU run at a fixed ~115-250M rows/s regardless of row
width (scalar-core driven).  This kernel instead exploits the spatial
locality of the pixel decoder's lookups: consecutive samples (queries in
space-filling order x their sampling points) hit grid cells whose linear
indices cluster, so per 128-sample tile the hit rows of the table fall in a
narrow dynamic window.  `tpu.dynamic_gather` (exposed as take_along_axis
along lanes) gathers 128 samples x C channels per issue from a single-vreg
128-row table slice — the kernel slides a K-subwindow (K*128 rows) over the
dynamic base and select-combines, with an exact full-table `fori_loop`
fallback for tiles whose spread exceeds the window (locality buys speed,
never correctness).

Built for the deformable-attention neighbor-table lookup
(models/pixel_decoder.py nb_packed gather, reference msdeformattn_pc.py:
186-194).  MEASURED DEAD END for that use (kept for the record, default off
via pixel_decoder.USE_FUSED_PREP): real sampling indices spread too wide per
128-sample tile (6% window fit at k_sub=16), and the kernel's cost is linear
in the window width, so it never beats XLA's row gather — see the numbers in
models/pixel_decoder.py and tools/bench_fused_gather.py.

Layout contract: the table is CHANNEL-MAJOR (b, C, N) so gathers run along
lanes; the result is (b, C, S).  C <= 32, N and S padded to multiples of 128
internally.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_S = 2048        # samples per program
K_SUB = 16           # fast-path window: K_SUB * 128 table rows


def _kernel(idx_ref, table_ref, out_ref, *, n_rows, k_sub, tile_s):
    c = table_ref.shape[1]
    n_sub = n_rows // 128

    for t in range(tile_s // 128):
        cell = idx_ref[0, t, :]                               # (128,) int32
        cmin = jnp.min(cell)
        cmax = jnp.max(cell)
        base_sw = jnp.minimum(cmin // 128, n_sub - k_sub)
        base_sw = jnp.maximum(base_sw, 0)
        fits = (cmax // 128 - base_sw) < k_sub

        local = cell - base_sw * 128
        sub = local // 128
        loff = jnp.broadcast_to((local % 128)[None, :], (c, 128))

        @pl.when(fits)
        def _fast(sub=sub, loff=loff, base_sw=base_sw, t=t):
            acc = jnp.zeros((c, 128), table_ref.dtype)
            for i in range(k_sub):
                x = table_ref[0, :, pl.dslice((base_sw + i) * 128, 128)]
                g = jnp.take_along_axis(x, loff, axis=1)
                acc = jnp.where(sub[None, :] == i, g, acc)
            out_ref[0, :, t * 128 : (t + 1) * 128] = acc

        @pl.when(jnp.logical_not(fits))
        def _full(cell=cell, t=t):
            # exact fallback: scan every 128-row slice of the table
            sub_a = cell // 128
            loff_a = jnp.broadcast_to((cell % 128)[None, :], (c, 128))

            def body(sw, acc):
                x = table_ref[0, :, pl.dslice(sw * 128, 128)]
                g = jnp.take_along_axis(x, loff_a, axis=1)
                return jnp.where(sub_a[None, :] == sw, g, acc)

            acc = jax.lax.fori_loop(
                0, n_sub, body, jnp.zeros((c, 128), table_ref.dtype)
            )
            out_ref[0, :, t * 128 : (t + 1) * 128] = acc


def _pad_axis(x, mult, axis, value=0):
    pad = (-x.shape[axis]) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def windowed_row_gather(table_cm: jnp.ndarray, idx: jnp.ndarray,
                        interpret: bool = False,
                        k_sub: int = K_SUB,
                        tile_s: int = TILE_S) -> jnp.ndarray:
    """table_cm: (b, C, N) channel-major table; idx: (b, S) int32 row ids in
    [0, N).  Returns (b, C, S) with out[b, :, s] = table_cm[b, :, idx[b, s]].

    k_sub: fast-path window in 128-row bands — size to the caller's expected
    per-128-sample spread (Morton-reordered tables make SFC-local queries
    rank-local; see geometry/morton.py).  Exactness never depends on it (the
    per-128-sample full-table fallback fires when the window misses).

    No gradient (the pixel decoder's neighbor tables are geometry, not
    parameters)."""
    b, c, n = table_cm.shape
    s = idx.shape[1]
    table_p = _pad_axis(table_cm, 128, 2)
    n_pad = table_p.shape[2]
    k_sub = min(k_sub, n_pad // 128)
    idx_p = _pad_axis(idx, tile_s, 1)
    s_pad = idx_p.shape[1]
    idx_p = idx_p.reshape(b, s_pad // 128, 128)

    out = pl.pallas_call(
        functools.partial(_kernel, n_rows=n_pad, k_sub=k_sub, tile_s=tile_s),
        grid=(b, s_pad // tile_s),
        in_specs=[
            pl.BlockSpec((1, tile_s // 128, 128), lambda bi, si: (bi, si, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, n_pad), lambda bi, si: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, tile_s), lambda bi, si: (bi, 0, si),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c, s_pad), table_cm.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(idx_p, table_p)
    return out[:, :, :s]


def windowed_row_gather_supported(table_cm, idx) -> bool:
    return table_cm.ndim == 3 and table_cm.shape[1] <= 32 and idx.ndim == 2
