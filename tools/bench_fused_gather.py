"""Microbench the Morton-windowed packed-table gather against take_rows with
REAL-MODEL-like index statistics (128-sample rows covering a ~23x23 cell
region of a 128x128 grid, Morton-ranked), across k_sub settings.

Usage: python tools/bench_fused_gather.py [iters]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> None:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 10

    import jax
    import jax.numpy as jnp

    from autofocusformermod_tpu.geometry.morton import morton_rank
    from autofocusformermod_tpu.ops.gather import take_rows
    from autofocusformermod_tpu.ops.pallas.window_gather import (
        windowed_row_gather,
    )

    rng = np.random.default_rng(0)
    b, c = 4, 12
    gh = gw = 128
    n_cells = gh * gw
    h, k, n_q = 8, 4, 4096
    s = h * k * n_q

    table = jnp.asarray(rng.standard_normal((b, c, n_cells)), jnp.float32)
    table_rm = jnp.asarray(np.asarray(table).transpose(0, 2, 1))

    # model the real pattern: per 128 consecutive queries (one (h,k) slice),
    # cells cluster in a sqrt(128*n_cells/n_q)-wide window + deformable
    # offset jitter of a few cells
    region = int(np.ceil(np.sqrt(128 * n_cells / n_q))) + 8   # ~31
    cx = rng.integers(0, gw - region, (b, s // 128, 1))
    cy = rng.integers(0, gh - region, (b, s // 128, 1))
    jx = rng.integers(0, region, (b, s // 128, 128))
    jy = rng.integers(0, region, (b, s // 128, 128))
    gx = (cx + jx).reshape(b, s)
    gy = (cy + jy).reshape(b, s)
    rank = jnp.asarray(morton_rank(gx, gy, 7, 7), jnp.int32)
    cell = jnp.asarray(gy * gw + gx, jnp.int32)

    REPS = 10

    def timed(fn, *args):
        def body(salt, *a):
            s_ = salt
            for _ in range(REPS):
                out = fn(*a)
                s_ = jnp.sum(out) * 0.0 + s_ * 0.0
            return s_
        f = jax.jit(body)
        float(f(jnp.zeros(()), *args))
        t0 = time.perf_counter()
        for _ in range(iters):
            float(f(jnp.zeros(()), *args))
        return (time.perf_counter() - t0) / (iters * REPS)

    dt_x = timed(lambda t, i: take_rows(t, i), table_rm, cell)
    print(f"take_rows (row-major)        {dt_x*1e3:7.2f} ms "
          f"({b*s/dt_x/1e6:6.0f} Mrows/s)", flush=True)

    # fraction of 128-sample rows whose Morton spread fits each window
    r2 = np.asarray(rank).reshape(b, s // 128, 128)
    spread = r2.max(-1) - r2.min(-1)
    for k_sub in (8, 16, 32, 64):
        fit = float((spread < k_sub * 128).mean())
        dt = timed(
            lambda t, i, ks=k_sub: windowed_row_gather(t, i, k_sub=ks),
            table, rank,
        )
        print(f"windowed k_sub={k_sub:3d} (fit {fit*100:3.0f}%) "
              f"{dt*1e3:7.2f} ms ({b*s/dt/1e6:6.0f} Mrows/s)", flush=True)


if __name__ == "__main__":
    main()
