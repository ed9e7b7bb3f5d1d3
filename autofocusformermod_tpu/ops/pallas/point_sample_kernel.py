"""Fused Pallas bilinear point-sampling (PointRend criterion hot path).

The criterion samples ~22M scalar taps per train step (uncertainty-ranking
pass + src-logit and target-label supervision samples, stacked over all
deep-supervision layers) and XLA element gathers run at ~110M elem/s on this
TPU — the sampling was ~200 ms of the ~260 ms criterion at batch 2.

Reformulation without gathers: bilinear interpolation is SEPARABLE, so for
mask image I (H, W) and a tile of P points

    sample[p] = oh_y[p, :] @ I @ oh_x[p, :]^T

where oh_y (P, H) carries (1-wy, wy) at rows (y0, y0+1) and oh_x (P, W)
carries (1-wx, wx) — each built with two iota-compares on the VPU.  The
kernel computes tmp = oh_y @ I on the MXU ((P, H) x (H, W)) and reduces
sum(oh_x * tmp, axis=1) on the VPU.  Out-of-bounds taps get zero weight
(torch grid_sample padding_mode='zeros' semantics, matching
losses/point_sample.point_sample).

Nearest-cell sampling (the ranking tap) reuses the same kernel with coords
snapped to cell centers — the bilinear weights collapse to exactly (1, 0).

Backward (for the src logits; targets and coords carry no gradient —
the reference's point_coords are torch.rand/topk results with
requires_grad=False):

    dI = oh_y^T @ (g[:, None] * oh_x)      accumulated over point tiles

also a dense MXU product, accumulated in the revisited (H, W) output block.

MXU dots run at default (bf16-input) precision: ~0.4% relative on sampled
logits.  The TPU-only dispatch keeps the XLA flat-gather path (fp32) as the
semantic reference and the CPU/test path.  Requires H, W, P all multiples of
128; callers fall back to the XLA path otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_P = 256  # minimum tile; divides 12544 (supervision) and 37632 (ranking)


def _pick_block_p(p: int, h: int, w: int) -> int:
    """Largest point tile that divides p and keeps the kernel's working set
    (two one-hots + the y-interpolated rows + the image) within ~12 MB —
    bigger tiles amortize per-program overhead (the ranking pass alone is
    otherwise ~6k programs)."""
    for bp in (1792, 896, 448, 256, 128):
        if p % bp == 0 and (bp * (h + 2 * w) + h * w) * 4 < 12 * 1024 * 1024:
            return bp
    return 0


def _build_onehot(i0f, w_frac, size, bp):
    """Weighted two-tap one-hot (bp, size): (1-w) at i0, w at i0+1, zeros
    out of bounds (iota never matches i0 outside [0, size-1]).
    i0f/w_frac: (bp, 1) float; i0f is integral-valued."""
    i0 = i0f.astype(jnp.int32)
    iota = jax.lax.broadcasted_iota(jnp.int32, (bp, size), 1)
    oh = jnp.where(iota == i0, 1.0 - w_frac, 0.0)
    oh = oh + jnp.where(iota == i0 + 1, w_frac, 0.0)
    return oh


def _fwd_kernel(x_ref, y_ref, img_ref, out_ref):
    """x/y_ref: (1, 1, BP) pixel-space coords; img_ref: (1, H, W);
    out_ref: (1, 1, BP)."""
    h = img_ref.shape[1]
    w = img_ref.shape[2]
    bp = x_ref.shape[2]
    x = x_ref[0, 0:1, :].reshape(bp, 1)                    # (BP, 1)
    y = y_ref[0, 0:1, :].reshape(bp, 1)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    oh_y = _build_onehot(y0, y - y0, h, bp)                # (BP, H)
    oh_x = _build_onehot(x0, x - x0, w, bp)                # (BP, W)
    tmp = jax.lax.dot_general(
        oh_y, img_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                      # (BP, W)
    # lane-axis reduction on the MXU: sum_x oh_x*tmp == (oh_x*tmp) @ ones —
    # the VPU shuffle-reduce over (BP, W) lanes dominated the kernel.
    ones = jnp.ones((w, 1), jnp.float32)
    out_ref[0, 0] = jax.lax.dot_general(
        oh_x * tmp, ones, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(bp)


def _bwd_kernel(x_ref, y_ref, g_ref, dimg_ref):
    """dI = oh_y^T @ (g * oh_x), accumulated across point tiles."""
    h = dimg_ref.shape[1]
    w = dimg_ref.shape[2]
    bp = x_ref.shape[2]
    pt = pl.program_id(1)

    @pl.when(pt == 0)
    def _():
        dimg_ref[0] = jnp.zeros_like(dimg_ref[0])

    x = x_ref[0, 0:1, :].reshape(bp, 1)
    y = y_ref[0, 0:1, :].reshape(bp, 1)
    g = g_ref[0, 0:1, :].reshape(bp, 1)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    oh_y = _build_onehot(y0, y - y0, h, bp)
    oh_x = _build_onehot(x0, x - x0, w, bp)
    dimg_ref[0] += jax.lax.dot_general(
        oh_y, g * oh_x, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                      # (H, W)


def point_sample_pallas_supported(masks, coords) -> bool:
    n, h, w = masks.shape
    p = coords.shape[1]
    return h % 128 == 0 and w % 128 == 0 and _pick_block_p(p, h, w) > 0


def _prep_coords(coords, h, w):
    """Normalized [0, 1] (x, y) -> pixel space, clamped so that floor() taps
    land in [-1, h] and OOB weights vanish (grid_sample zeros semantics):
    a tap at -1 or h gets weight from the *other* tap only when that one is
    in bounds; clamping x to [-1, w] preserves exactly the in-bounds taps."""
    x = jnp.clip(coords[..., 0] * w - 0.5, -1.0, float(w))
    y = jnp.clip(coords[..., 1] * h - 0.5, -1.0, float(h))
    return x, y


def point_sample_pallas_impl(masks, coords, interpret: bool = False):
    n, h, w = masks.shape
    p = coords.shape[1]
    x, y = _prep_coords(coords.astype(jnp.float32), h, w)
    x = x[:, None, :]                                      # (n, 1, p)
    y = y[:, None, :]
    bp = _pick_block_p(p, h, w)
    npt = p // bp
    out = pl.pallas_call(
        _fwd_kernel,
        grid=(n, npt),
        in_specs=[
            pl.BlockSpec((1, 1, bp), lambda ni, pt: (ni, 0, pt)),
            pl.BlockSpec((1, 1, bp), lambda ni, pt: (ni, 0, pt)),
            pl.BlockSpec((1, h, w), lambda ni, pt: (ni, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, bp), lambda ni, pt: (ni, 0, pt)),
        out_shape=jax.ShapeDtypeStruct((n, 1, p), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=24 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * p * h * w // 1,
            bytes_accessed=n * (h * w + 3 * p) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, y, masks.astype(jnp.float32))
    return out[:, 0, :]


def point_sample_pallas_bwd_impl(masks_shape, coords, g, interpret: bool = False):
    n, h, w = masks_shape
    p = coords.shape[1]
    x, y = _prep_coords(coords.astype(jnp.float32), h, w)
    x = x[:, None, :]
    y = y[:, None, :]
    g = g.astype(jnp.float32)[:, None, :]
    bp = _pick_block_p(p, h, w)
    npt = p // bp
    dimg = pl.pallas_call(
        _bwd_kernel,
        grid=(n, npt),
        in_specs=[
            pl.BlockSpec((1, 1, bp), lambda ni, pt: (ni, 0, pt)),
            pl.BlockSpec((1, 1, bp), lambda ni, pt: (ni, 0, pt)),
            pl.BlockSpec((1, 1, bp), lambda ni, pt: (ni, 0, pt)),
        ],
        out_specs=pl.BlockSpec((1, h, w), lambda ni, pt: (ni, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h, w), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=24 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * p * h * w,
            bytes_accessed=n * (h * w + 3 * p) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, y, g)
    return dimg


@jax.custom_vjp
def point_sample_pallas(masks, coords):
    """Bilinear-sample masks (n, h, w) at coords (n, p, 2) in [0, 1] -> (n, p).

    Same semantics as losses/point_sample.point_sample (torch grid_sample,
    align_corners=False, padding_mode='zeros'); gradient flows to masks only.
    """
    return point_sample_pallas_impl(masks, coords)


def _ps_fwd(masks, coords):
    return point_sample_pallas_impl(masks, coords), (masks.shape, coords)


def _ps_bwd(res, g):
    masks_shape, coords = res
    return point_sample_pallas_bwd_impl(masks_shape, coords, g), None


point_sample_pallas.defvjp(_ps_fwd, _ps_bwd)


def _nearest_kernel(cx_ref, cy_ref, img_ref, out_ref):
    """Nearest-cell read: out[p] = img[cy[p], cx[p]] via single-tap one-hots.

    Half the one-hot-build work of the bilinear kernel (one iota-compare per
    axis, no fractional weights) and a bf16 single-pass MXU dot — the ranking
    pass needs only the value, not interpolation.  cx/cy_ref: (1, 1, BP)
    int32 cell indices, already clamped in-bounds."""
    h = img_ref.shape[1]
    w = img_ref.shape[2]
    bp = cx_ref.shape[2]
    cx = cx_ref[0, 0:1, :].reshape(bp, 1)
    cy = cy_ref[0, 0:1, :].reshape(bp, 1)
    ioh = jax.lax.broadcasted_iota(jnp.int32, (bp, h), 1)
    iow = jax.lax.broadcasted_iota(jnp.int32, (bp, w), 1)
    oh_y = (ioh == cy).astype(jnp.bfloat16)                # (BP, H)
    tmp = jax.lax.dot_general(
        oh_y, img_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)                                 # (BP, W)
    oh_x = (iow == cx).astype(jnp.bfloat16)
    # lane-axis reduction on the MXU: sum_x oh_x*tmp == (oh_x*tmp) @ ones.
    # The VPU shuffle-reduce over (BP, 128) lanes was the kernel's dominant
    # cost (~7 passes); the N=1 matmul is ~1 MXU pass.
    ones = jnp.ones((w, 1), jnp.bfloat16)
    out_ref[0, 0] = jax.lax.dot_general(
        oh_x * tmp, ones, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(bp)


def _pick_block_p_nearest(p: int, h: int, w: int) -> int:
    """Like _pick_block_p but for the leaner nearest kernel (bf16 one-hots,
    no fractional-weight arrays): bigger tiles amortize program overhead."""
    for bp in (5376, 2688, 1792, 896, 448, 256, 128):
        if p % bp == 0 and (bp * (h + 2 * w) * 2 + h * w * 4) < 12 * 1024 * 1024:
            return bp
    return 0


def point_sample_nearest_supported(masks, coords) -> bool:
    n, h, w = masks.shape
    p = coords.shape[1]
    return h % 128 == 0 and w % 128 == 0 and _pick_block_p_nearest(p, h, w) > 0


def point_sample_nearest_pallas(masks, coords, interpret: bool = False):
    """Nearest-cell sample of masks (n, h, w) at normalized coords (n, p, 2)
    -> (n, p): out[n, p] = masks[n, floor(y*h), floor(x*w)] (clamped).

    Equals bilinear sampling at snapped cell centers (the ranking tap in
    losses/point_sample.get_uncertain_point_coords_nn_ranked) but ~2x faster:
    single-tap one-hots and a bf16 MXU pass.  Image values round to bf16 —
    ranking-only callers tolerate that (selection heuristic); no VJP
    (ranking runs under stop_gradient)."""
    n, h, w = masks.shape
    p = coords.shape[1]
    cx = jnp.clip((coords[..., 0] * w).astype(jnp.int32), 0, w - 1)[:, None, :]
    cy = jnp.clip((coords[..., 1] * h).astype(jnp.int32), 0, h - 1)[:, None, :]
    bp = _pick_block_p_nearest(p, h, w)
    npt = p // bp
    out = pl.pallas_call(
        _nearest_kernel,
        grid=(n, npt),
        in_specs=[
            pl.BlockSpec((1, 1, bp), lambda ni, pt: (ni, 0, pt)),
            pl.BlockSpec((1, 1, bp), lambda ni, pt: (ni, 0, pt)),
            pl.BlockSpec((1, h, w), lambda ni, pt: (ni, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, bp), lambda ni, pt: (ni, 0, pt)),
        out_shape=jax.ShapeDtypeStruct((n, 1, p), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=24 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * p * h * w,
            bytes_accessed=n * (h * w + 3 * p) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(cx, cy, masks.astype(jnp.bfloat16))
    return out[:, 0, :]


# Row-stratified nearest kernel: one program per mask (the chunk dim is not
# 8-divisible — 294 = 2*3*7^2 — so the block takes the full dimension, which
# Pallas allows regardless of divisibility; 294 unrolled chunk bodies of ~6
# vector ops each compile and pipeline fine)


def _nearest_rows_kernel(cx_ref, cy_ref, img_ref, out_ref, *, h, chunks):
    """Nearest read for Y-STRATIFIED candidates: chunk c's points all lie in
    the y-sliver [c/chunks, (c+1)/chunks), which spans at most two adjacent
    image rows r0, r0+1 with r0 = c*h//chunks — so each 128-point chunk is
    two single-vreg lane gathers (tpu.dynamic_gather via take_along_axis)
    plus a row select.  No one-hots, no window search, no MXU.

    cx/cy_ref: (1, G, 128) int32 cell coords; img_ref: (1, H, W);
    out_ref: (1, G, 128).  ~5x the one-hot _nearest_kernel (71 -> ~14 ms on
    the criterion ranking pass at N=800)."""
    g = cx_ref.shape[1]
    for c in range(g):
        i = c
        r0 = min(c * h // chunks, h - 2)
        rows = img_ref[0, r0 : r0 + 2, :]                  # (2, W) static

        cx = cx_ref[0, i, :]                               # (128,)
        cy = cy_ref[0, i, :]
        got = jnp.take_along_axis(
            rows, jnp.broadcast_to(cx[None, :], (2, 128)), axis=1
        )                                                  # (2, 128)
        out_ref[0, i, :] = jnp.where(cy == r0, got[0], got[1])


def point_sample_nearest_rows_supported(n, h, w, p) -> bool:
    chunks = p // 128
    return (
        p % 128 == 0
        and w % 128 == 0
        and h >= 2
        and chunks >= h          # sliver spans <= 2 rows only then
    )


def point_sample_nearest_rows_pallas(masks, cx, cy, interpret: bool = False):
    """Row-stratified nearest read: masks (n, h, w); cx/cy (n, chunks, 128)
    int32 cell coords with chunk c's cy in {c*h//chunks, c*h//chunks + 1}
    (clamped in-bounds) -> (n, chunks, 128) f32 values.

    Contract: callers generate candidate y stratified per chunk
    (y = (c + u)/chunks), which keeps the marginal distribution exactly
    uniform while pinning each chunk to a known pair of rows."""
    n, h, w = masks.shape
    chunks = cx.shape[1]
    out = pl.pallas_call(
        functools.partial(_nearest_rows_kernel, h=h, chunks=chunks),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, chunks, 128), lambda ni: (ni, 0, 0)),
            pl.BlockSpec((1, chunks, 128), lambda ni: (ni, 0, 0)),
            pl.BlockSpec((1, h, w), lambda ni: (ni, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, chunks, 128), lambda ni: (ni, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, chunks, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=24 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=n * chunks * 128 * 4,
            bytes_accessed=n * (h * w + 3 * chunks * 128) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(cx.astype(jnp.int32), cy.astype(jnp.int32), masks.astype(jnp.float32))
    return out


def snap_to_cell_centers(coords, h, w):
    """Snap normalized coords to their cell centers: bilinear sampling at the
    snapped coords is exactly the 1-tap nearest-cell read (the ranking pass)."""
    cx = (jnp.floor(coords[..., 0] * w) + 0.5) / w
    cy = (jnp.floor(coords[..., 1] * h) + 0.5) / h
    return jnp.stack(
        [jnp.clip(cx, 0.5 / w, 1 - 0.5 / w), jnp.clip(cy, 0.5 / h, 1 - 0.5 / h)],
        axis=-1,
    )
