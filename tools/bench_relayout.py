"""Microbenchmark the XLA relayouts around the v13 msdetrpc forward kernel.

The r3 profile attributes ~32 ms/forward (AFF-Mini 512x512 batch 4) to
operand prep around the kernel: attn folding, casts, the per-(query-level,
value-level) (bh, n, P) -> (bh, P, n) idx/w transposes, the value banding
transpose, the (bh, c_, n) output untranspose and the (b, h, n, c_) ->
(b, n, h*c_) head merge.  This bench times each relayout shape in isolation
plus the candidate replacements:

  - stacked: ONE (bh, n, 3P) -> (bh, 3P, n) transpose vs three (bh, n, P)
  - dotT:    consuming the kernel's (b, h, c_, n) output directly in the
             output projection via dot_general (transpose absorbed into the
             MXU operand load) vs untranspose + head merge + dense

Usage: python tools/bench_relayout.py [iters]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timeit(fn, *args, iters=50):
    """Per-application ms of ``fn`` measured as ONE jitted chain of ``iters``
    data-dependent applications (axon's block_until_ready does not block, so
    per-iteration host fetches would dominate sub-ms ops; a single chained
    program syncs once)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chain(*args):
        salt = jnp.zeros((), jnp.float32)
        for _ in range(iters):
            out = fn(*(
                a + salt.astype(a.dtype) * 0 if jnp.issubdtype(a.dtype, jnp.floating)
                else a
                for a in args
            ))
            leaves = jax.tree_util.tree_leaves(out)
            salt = sum(l.astype(jnp.float32).ravel()[0] for l in leaves) * 1e-30
        return salt

    float(chain(*args))  # compile + settle
    t0 = time.perf_counter()
    float(chain(*args))
    return 1e3 * (time.perf_counter() - t0) / iters


def main() -> None:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 50

    import jax
    import jax.numpy as jnp

    b, h, c = 4, 8, 256
    bh, c_ = b * h, c // h
    P = 16
    rng = np.random.default_rng(0)
    rows = []

    for n in (4096, 1024, 256):
        w = jnp.asarray(rng.standard_normal((bh, n, P)), jnp.float32)
        w3 = jnp.asarray(rng.standard_normal((bh, n, 3 * P)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, n, (bh, n, P)), jnp.int32)

        t_one = timeit(jax.jit(lambda a: a.transpose(0, 2, 1)), w, iters=iters)
        t_idx = timeit(jax.jit(lambda a: a.transpose(0, 2, 1)), idx, iters=iters)
        t_stk = timeit(jax.jit(lambda a: a.transpose(0, 2, 1)), w3, iters=iters)
        rows.append((f"transpose (bh,{n},{P})->f32", t_one))
        rows.append((f"transpose (bh,{n},{P})->i32", t_idx))
        rows.append((f"transpose (bh,{n},{3*P}) stacked", t_stk))

    # attn fold (per query level, all 3 value levels): w * attn broadcast
    n = 4096
    ws = [jnp.asarray(rng.standard_normal((bh, n, 4, 4)), jnp.float32)
          for _ in range(3)]
    attn = jnp.asarray(rng.standard_normal((bh, n, 3, 4)), jnp.float32)

    @jax.jit
    def fold(attn, *ws):
        return tuple(
            (w * attn[:, :, j, :, None]).reshape(bh, n, P)
            for j, w in enumerate(ws)
        )

    rows.append(("attn fold n=4096 (3 levels)", timeit(fold, attn, *ws, iters=iters)))

    @jax.jit
    def fold_t(attn, *ws):
        return tuple(
            (w * attn[:, :, j, :, None]).reshape(bh, n, P).transpose(0, 2, 1)
            for j, w in enumerate(ws)
        )

    rows.append(("fold+transpose n=4096 (3 lv)", timeit(fold_t, attn, *ws, iters=iters)))

    # output side: (bh, c_, n) kernel output -> out_proj(b, n, c)
    out_t = jnp.asarray(rng.standard_normal((bh, c_, n)), jnp.float32)
    kern = jnp.asarray(rng.standard_normal((c, c)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((c,)), jnp.float32)

    @jax.jit
    def consume_legacy(o, k, bb):
        s = o.transpose(0, 2, 1).reshape(b, h, n, c_)
        s = s.transpose(0, 2, 1, 3).reshape(b, n, c)
        return s @ k + bb

    @jax.jit
    def consume_dot(o, k, bb):
        # (b, h, c_, n) x (h, c_, co) -> (b, n, co): transpose rides the MXU
        o4 = o.reshape(b, h, c_, n)
        k3 = k.reshape(h, c_, c)
        y = jax.lax.dot_general(o4, k3, (((1, 2), (0, 1)), ((), ())))
        return y + bb

    ta = timeit(consume_legacy, out_t, kern, bias, iters=iters)
    tb = timeit(consume_dot, out_t, kern, bias, iters=iters)
    rows.append(("out: untranspose+head+dense", ta))
    rows.append(("out: dot_general direct", tb))

    x = consume_legacy(out_t, kern, bias)
    y = consume_dot(out_t, kern, bias)
    err = float(jnp.max(jnp.abs(x - y)) / (jnp.max(jnp.abs(x)) + 1e-9))

    # value banding transpose (per layer)
    val = jnp.asarray(rng.standard_normal((bh, 5376, c_)), jnp.float32)
    rows.append((
        "val banding (bh,5376,32)",
        timeit(jax.jit(lambda v: v.reshape(bh, 42, 128, c_).transpose(0, 1, 3, 2)),
               val, iters=iters),
    ))

    # head split of values (per layer): (b, ntot, c) -> (bh, ntot, c_)
    vc = jnp.asarray(rng.standard_normal((b, 5376, c)), jnp.float32)
    rows.append((
        "val head split (b,5376,256)",
        timeit(jax.jit(
            lambda v: v.reshape(b, 5376, h, c_).transpose(0, 2, 1, 3)
            .reshape(bh, 5376, c_)), vc, iters=iters),
    ))

    for name, ms in rows:
        print(f"{name:34s} {ms:7.3f} ms")
    print(f"dot_general rel err vs legacy: {err:.2e}")


if __name__ == "__main__":
    main()
