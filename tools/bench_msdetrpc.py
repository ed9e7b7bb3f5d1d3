"""Microbenchmark the msdetrpc Pallas kernel variants on the real TPU.

Times each kernel version on the pixel decoder's three (query-level,
value-levels) invocations at 512x512 batch 4 (levels 4096/1024/256, bh=32,
c_=32, 48 pairs) and prints per-call ms so kernel experiments are measurable
in isolation (one encoder layer = the sum of the three rows; the full
decoder = 6x that).

Usage: python tools/bench_msdetrpc.py [iters]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> None:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 20

    import jax
    import jax.numpy as jnp

    from autofocusformermod_tpu.ops.pallas import msdetrpc_kernel as mk

    level_sizes = (4096, 1024, 256)
    ntot = sum(level_sizes)
    bh, c_, l, k, m = 32, 32, 3, 4, 4
    rng = np.random.default_rng(0)

    val = jnp.asarray(rng.standard_normal((bh, ntot, c_)), jnp.float32)

    def make_inputs(n, local=False):
        offs = np.cumsum([0] + list(level_sizes))[:-1]
        sizes = np.asarray(level_sizes)
        slot_level = np.tile(np.arange(l), k)  # levels interleave fastest
        if local:
            # realistic spatial locality: 4-NN targets of a query's snapped
            # cell sit near the query's own (scaled) index in each level
            q = np.arange(n)[None, :, None, None]
            base = (q * sizes[slot_level][None, None, :, None]) // n
            jit = rng.integers(-64, 65, (bh, n, l * k, m))
            raw = np.clip(base + jit, 0, sizes[slot_level][None, None, :, None] - 1)
            nn_idx = jnp.asarray(offs[slot_level][None, None, :, None] + raw,
                                 jnp.int32)
        else:
            nn_idx = jnp.asarray(
                rng.integers(0, ntot, (bh, n, l * k, m)), jnp.int32
            )
            lo = jnp.asarray(offs[slot_level][None, None, :, None])
            sz = jnp.asarray(sizes[slot_level][None, None, :, None])
            nn_idx = lo + nn_idx % sz
        nn_w = jnp.asarray(rng.uniform(0, 1, (bh, n, l * k, m)), jnp.float32)
        attn = jnp.asarray(rng.uniform(0, 1, (bh, n, l * k)), jnp.float32)
        return nn_idx, nn_w, attn

    REPS = 10  # kernel calls chained inside one jit (hides dispatch overhead)

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

    # dispatch-overhead floor: an (almost) empty chained jit
    empty = jax.jit(lambda s, v: (v[0, 0, 0] + s) * 1e-9)
    floor = timed(empty, val) * REPS
    print(f"dispatch floor {floor * 1e3:7.3f} ms/call\n", flush=True)

    import os
    local = os.environ.get("BENCH_LOCAL", "0") not in ("0", "false")
    versions = tuple(
        int(v) for v in os.environ.get("BENCH_VERSIONS", "2,3").split(",")
    )
    if os.environ.get("BENCH_CHECK", "0") not in ("0", "false"):
        nn_idx, nn_w, attn = make_inputs(1024, local=local)
        ref = mk.msdetrpc_pallas_impl(nn_idx, nn_w, attn, val, level_sizes,
                                      version=2)
        for v in versions:
            got = mk.msdetrpc_pallas_impl(nn_idx, nn_w, attn, val,
                                          level_sizes, version=v)
            err = float(jnp.max(jnp.abs(got - ref)))
            print(f"v{v} vs v2 max abs err {err:.2e}", flush=True)

    levels_mode = os.environ.get("BENCH_LEVELS", "0") not in ("0", "false")

    def to_levels(nn_idx, nn_w, attn, n):
        """Interleaved (bh, n, l*k, m) -> per-level (bh, n, k*m) local idx +
        attn-folded weights, as the pixel decoder supplies them."""
        offs = np.cumsum([0] + list(level_sizes))[:-1]
        w = nn_w * attn[..., None]
        idxs, ws = [], []
        for j in range(l):
            slots = [ki * l + j for ki in range(k)]
            ij = (nn_idx[:, :, slots, :] - int(offs[j])).reshape(bh, n, k * m)
            wj = w[:, :, slots, :].reshape(bh, n, k * m)
            idxs.append(ij.astype(jnp.int32))
            ws.append(wj.astype(jnp.float32))
        return tuple(idxs), tuple(ws)

    for version in versions:
        total = 0.0
        for n in (4096, 1024, 256):
            nn_idx, nn_w, attn = make_inputs(n, local=local)
            if levels_mode:
                idxs, ws = to_levels(nn_idx, nn_w, attn, n)

                def body(salt, *args, version=version):
                    nlv = len(level_sizes)
                    i_t, w_t, v = args[:nlv], args[nlv:2 * nlv], args[-1]
                    s = salt
                    for _ in range(REPS):
                        out = mk.msdetrpc_pallas_levels_impl(
                            i_t, tuple(wt + s * 0.0 for wt in w_t), v,
                            level_sizes, version=version,
                        )
                        s = out.sum() * 0.0
                    return s

                dt = timed(jax.jit(body), *idxs, *ws, val)
            else:
                def body(salt, i, w, a, v, version=version):
                    s = salt
                    for _ in range(REPS):
                        out = mk.msdetrpc_pallas_impl(
                            i, w + s * 0.0, a, v, level_sizes, version=version
                        )
                        s = out.sum() * 0.0
                    return s

                dt = timed(jax.jit(body), nn_idx, nn_w, attn, val)
            total += dt
            print(f"v{version} n={n:5d}  {dt * 1e3:7.2f} ms", flush=True)
        print(f"v{version} layer total {total * 1e3:7.2f} ms "
              f"(decoder ~{total * 6 * 1e3:.0f} ms)\n", flush=True)


if __name__ == "__main__":
    main()
