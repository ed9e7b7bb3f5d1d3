"""Microbenchmark the msdetrpc BACKWARD Pallas kernel on the real TPU.

Times msdetrpc_pallas_bwd_impl per query level at the pixel decoder's
512x512 batch-4 shapes (one encoder layer = sum of the three rows; the
full decoder backward = 6x that).  BENCH_BWD_VERSIONS selects kernel
variants; BENCH_CHECK=1 cross-checks variants against v1 numerics.

Usage: python tools/bench_msdetrpc_bwd.py [iters]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> None:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 10

    import jax
    import jax.numpy as jnp

    from autofocusformermod_tpu.ops.pallas import msdetrpc_kernel as mk

    level_sizes = (4096, 1024, 256)
    ntot = sum(level_sizes)
    bh, c_, l, k = 32, 32, 3, 4
    rng = np.random.default_rng(0)
    val = jnp.asarray(rng.standard_normal((bh, ntot, c_)), jnp.float32)

    def make_inputs(n):
        offs = np.cumsum([0] + list(level_sizes))[:-1]
        sizes = np.asarray(level_sizes)
        slot_level = np.tile(np.arange(l), k)
        q = np.arange(n)[None, :, None, None]
        base = (q * sizes[slot_level][None, None, :, None]) // n
        jit = rng.integers(-64, 65, (bh, n, l * k, 4))
        raw = np.clip(base + jit, 0, sizes[slot_level][None, None, :, None] - 1)
        nn_idx = jnp.asarray(offs[slot_level][None, None, :, None] + raw,
                             jnp.int32)
        nn_w = jnp.asarray(rng.uniform(0, 1, (bh, n, l * k, 4)), jnp.float32)
        attn = jnp.asarray(rng.uniform(0, 1, (bh, n, l * k)), jnp.float32)
        g = jnp.asarray(rng.standard_normal((bh, n, c_)), jnp.float32)
        return nn_idx, nn_w, attn, g

    REPS = 10

    def timed(fn, *args):
        def run(cnt):
            salt = jnp.zeros((), jnp.float32)
            for _ in range(cnt):
                salt = fn(salt, *args) * 0.0
            return float(salt)

        run(3)
        t0 = time.perf_counter()
        run(iters)
        return (time.perf_counter() - t0) / (iters * REPS)

    versions = tuple(
        int(v) for v in os.environ.get("BENCH_BWD_VERSIONS", "1").split(",")
    )

    if os.environ.get("BENCH_CHECK", "0") not in ("0", "false"):
        nn_idx, nn_w, attn, g = make_inputs(1024)
        ref = mk.msdetrpc_pallas_bwd_impl(nn_idx, nn_w, attn, val, g,
                                          level_sizes, version=1)
        for v in versions:
            if v == 1:
                continue
            got = mk.msdetrpc_pallas_bwd_impl(nn_idx, nn_w, attn, val, g,
                                              level_sizes, version=v)
            for name, a, b in zip(("dw", "da", "dv"), ref, got):
                err = float(jnp.max(jnp.abs(a - b)))
                rel = err / (float(jnp.max(jnp.abs(a))) + 1e-9)
                print(f"v{v} vs v1 {name}: max abs {err:.2e} rel {rel:.2e}",
                      flush=True)

    for version in versions:
        total = 0.0
        for n in (4096, 1024, 256):
            nn_idx, nn_w, attn, g = make_inputs(n)

            def body(salt, i, w, a, gg, version=version):
                s = salt
                for _ in range(REPS):
                    dw, da, dv = mk.msdetrpc_pallas_bwd_impl(
                        i, w + s * 0.0, a, val, gg, level_sizes,
                        version=version,
                    )
                    s = dv.sum() * 0.0
                return s

            dt = timed(jax.jit(body), nn_idx, nn_w, attn, g)
            total += dt
            print(f"bwd v{version} n={n:5d}  {dt * 1e3:7.2f} ms", flush=True)
        print(f"bwd v{version} layer total {total * 1e3:7.2f} ms "
              f"(decoder ~{total * 6 * 1e3:.0f} ms)\n", flush=True)


if __name__ == "__main__":
    main()
