"""Microbench + parity check for the windowed row-gather Pallas kernel vs the
XLA gather it would replace (pixel decoder's nb_packed lookup).

Usage: JAX_PLATFORMS=cpu python tools/bench_window_gather.py --check   # parity
       python tools/bench_window_gather.py [iters]                     # TPU perf
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> None:
    check_only = "--check" in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    iters = int(args[0]) if args else 20

    import jax
    import jax.numpy as jnp

    from autofocusformermod_tpu.ops.pallas.window_gather import (
        windowed_row_gather,
    )

    rng = np.random.default_rng(0)
    b, c, n = 4, 12, 16384          # finest-grid table at 512x512
    s = 8 * 4096 * 4                # h * n_i * k samples for the largest level

    table = jnp.asarray(rng.standard_normal((b, c, n)), jnp.float32)

    def make_idx(local: bool) -> jnp.ndarray:
        if local:
            # model the SFC locality: sample t maps near cell t*n/s + jitter
            base = (np.arange(s) * n) // s
            base = np.tile(base, (b, 1))
            jit = rng.integers(-400, 401, (b, s))
            return jnp.asarray(np.clip(base + jit, 0, n - 1), jnp.int32)
        return jnp.asarray(rng.integers(0, n, (b, s)), jnp.int32)

    if check_only:
        for local in (True, False):
            idx = make_idx(local)
            got = windowed_row_gather(table, idx, interpret=True)
            want = jnp.take_along_axis(
                table, idx[:, None, :].repeat(c, 1), axis=2
            )
            err = float(jnp.max(jnp.abs(got - want)))
            print(f"local={local}  max abs err {err:.2e}")
            assert err == 0.0, "windowed_row_gather mismatch"
        print("OK")
        return

    def xla_gather(t, i):
        # what the pixel decoder does today: row gather on (b, N, 12)
        t_rm = t.transpose(0, 2, 1)
        return jnp.take_along_axis(
            t_rm, i[:, :, None].repeat(c, 2), axis=1
        )

    REPS = 10

    def timed(fn, *a):
        f = jax.jit(lambda *a: sum(
            jnp.sum(fn(*a)) * 0.0 for _ in range(REPS)))
        f(*a).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(iters):
            f(*a).block_until_ready()
        return (time.perf_counter() - t0) / (iters * REPS)

    def timed_chain(fn, t, i):
        def body(t, i):
            salt = jnp.zeros((), t.dtype)
            for _ in range(REPS):
                out = fn(t + salt, i)
                salt = jnp.sum(out) * 0.0
            return salt
        f = jax.jit(body)
        f(t, i).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(iters):
            f(t, i).block_until_ready()
        return (time.perf_counter() - t0) / (iters * REPS)

    for local in (True, False):
        idx = make_idx(local)
        got = windowed_row_gather(table, idx)
        want = xla_gather(table, idx).transpose(0, 2, 1)
        err = float(jnp.max(jnp.abs(got - want)))
        dt_p = timed_chain(windowed_row_gather, table, idx)
        dt_x = timed_chain(xla_gather, table, idx)
        rows = b * s
        print(
            f"local={local}  err={err:.1e}  pallas {dt_p*1e3:7.2f} ms "
            f"({rows/dt_p/1e6:6.0f} Mrows/s)   xla {dt_x*1e3:7.2f} ms "
            f"({rows/dt_x/1e6:6.0f} Mrows/s)   speedup {dt_x/dt_p:5.2f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
