"""Split uncertainty-coords cost: ranking sample vs top_k vs approx_max_k.

Usage: python tools/profile_unc.py [n_masks] [iters]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timed(name, fn, *args, iters=10):
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    salt = jnp.zeros(())
    r = fn(*args, salt)
    jax.block_until_ready(r)
    s = r[0] if isinstance(r, tuple) else r
    float(jnp.sum(s.astype(jnp.float32)))
    comp = time.perf_counter() - t0
    salt = jnp.float32(0.0)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args, salt)
        s = r[0] if isinstance(r, tuple) else r
        salt = (jnp.sum(s.astype(jnp.float32)) * 1e-12).astype(jnp.float32)
    float(salt)
    ms = 1e3 * (time.perf_counter() - t0) / iters
    print(f"{name:34s} {ms:8.1f} ms  [compile {comp:.0f}s]", flush=True)
    return ms


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 800
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    import jax
    import jax.numpy as jnp

    from autofocusformermod_tpu.ops.pallas.point_sample_kernel import (
        point_sample_pallas,
        snap_to_cell_centers,
    )

    h = w = 128
    p = 37632
    k = 9408
    rng = np.random.default_rng(0)
    masks = jnp.asarray(rng.normal(size=(n, h, w)), jnp.float32)
    coords = jnp.asarray(rng.uniform(size=(n, p, 2)), jnp.float32)

    @jax.jit
    def f_rank(m, c, salt):
        return point_sample_pallas(m + salt, snap_to_cell_centers(c, h, w))

    timed("ranking sample (pallas)", f_rank, masks, coords, iters=iters)
    unc = jax.jit(lambda m, c: -jnp.abs(point_sample_pallas(m, snap_to_cell_centers(c, h, w))))(masks, coords)

    @jax.jit
    def f_topk(u, salt):
        return jax.lax.top_k(u + salt, k)[1]

    timed("exact top_k", f_topk, unc, iters=iters)

    @jax.jit
    def f_approx(u, salt):
        return jax.lax.approx_max_k(u + salt, k)[1]

    timed("approx_max_k (default recall)", f_approx, unc, iters=iters)

    @jax.jit
    def f_approx90(u, salt):
        return jax.lax.approx_max_k(u + salt, k, recall_target=0.90)[1]

    timed("approx_max_k (recall 0.90)", f_approx90, unc, iters=iters)

    # gather-based nearest ranking for reference
    @jax.jit
    def f_gather(m, c, salt):
        cx = jnp.clip((c[..., 0] * w).astype(jnp.int32), 0, w - 1)
        cy = jnp.clip((c[..., 1] * h).astype(jnp.int32), 0, h - 1)
        flat = (m + salt).reshape(n * h * w)
        row0 = (jnp.arange(n, dtype=jnp.int32) * (h * w))[:, None]
        return jnp.take(flat, (row0 + cy * w + cx).reshape(-1)).reshape(n, p)

    timed("ranking sample (flat gather)", f_gather, masks, coords, iters=iters)

    # ranking in bf16 via pallas (cast masks)
    @jax.jit
    def f_rank_bf16(m, c, salt):
        return point_sample_pallas(
            (m + salt).astype(jnp.bfloat16).astype(jnp.float32),
            snap_to_cell_centers(c, h, w),
        )

    timed("ranking sample (bf16-ish)", f_rank_bf16, masks, coords, iters=iters)


if __name__ == "__main__":
    main()

def bench_nearest():
    import sys, time
    import numpy as np
    import jax
    import jax.numpy as jnp
    from autofocusformermod_tpu.ops.pallas.point_sample_kernel import (
        point_sample_nearest_pallas,
    )

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 800
    h = w = 128
    p = 37632
    rng = np.random.default_rng(0)
    masks = jnp.asarray(rng.normal(size=(n, h, w)), jnp.float32)
    coords = jnp.asarray(rng.uniform(size=(n, p, 2)), jnp.float32)

    @jax.jit
    def f_near(m, c, salt):
        return point_sample_nearest_pallas(m + salt, c)

    timed("nearest kernel (bf16 1-tap)", f_near, masks, coords)

    # correctness vs flat nearest gather
    out = np.asarray(jax.jit(lambda m, c: point_sample_nearest_pallas(m, c))(masks, coords))
    cx = np.clip((np.asarray(coords)[..., 0] * w).astype(np.int32), 0, w - 1)
    cy = np.clip((np.asarray(coords)[..., 1] * h).astype(np.int32), 0, h - 1)
    ref = np.asarray(masks)[np.arange(n)[:, None], cy, cx]
    err = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    print(f"nearest kernel max rel err vs exact: {err:.2e}")
