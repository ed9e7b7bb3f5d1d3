"""Microbenchmark the fused SFC local-attention kernels at the backbone's
real per-stage shapes (512x512 AFF-Mini, batch 4) on the TPU.

Builds the true stage geometry (grid positions -> SFC clustering -> cluster
KNN) so the visit bounds match the model, then times forward and
value_and_grad per stage with the chained-salt protocol.

Usage: python tools/bench_local_attn.py [iters]
Env:   AFF_ATTN_PREC=highest|high|default — kernel dot precision A/B.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> None:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 20

    import jax
    import jax.numpy as jnp

    from autofocusformermod_tpu.geometry.cluster import space_filling_cluster
    from autofocusformermod_tpu.geometry.knn import knn
    from autofocusformermod_tpu.ops.pallas.local_attn import (
        sfc_cluster_attention,
    )

    print(f"AFF_ATTN_PREC={os.environ.get('AFF_ATTN_PREC', 'high')}",
          flush=True)
    b = 4
    rng = np.random.default_rng(0)

    # (h_img, w_img, heads, c_) per AFF-Mini stage at 512x512
    stages = [
        (128, 128, 2, 16),
        (64, 64, 4, 32),
        (32, 32, 8, 32),
    ]
    m = 8
    nnc = 6

    def timed(name, fn, *args):
        t0 = time.perf_counter()
        r = fn(*args, jnp.float32(0.0))
        float(jax.tree.leaves(r)[0].astype(jnp.float32))
        comp = time.perf_counter() - t0
        salt = jnp.float32(0.0)
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(*args, salt)
            salt = (jax.tree.leaves(r)[0].astype(jnp.float32) * 1e-12).astype(
                jnp.float32
            )
        float(salt)
        ms = 1e3 * (time.perf_counter() - t0) / iters
        print(f"{name:26s} {ms:8.2f} ms  [compile {comp:.0f}s]", flush=True)
        return ms

    for hi, wi, h, c_ in stages:
        n = hi * wi
        ys, xs = np.meshgrid(np.arange(hi), np.arange(wi), indexing="ij")
        pos0 = jnp.asarray(
            np.stack([xs, ys], 2).reshape(1, -1, 2), jnp.float32
        )
        pos2, cmean, _, _, _ = space_filling_cluster(pos0, m, hi, wi)
        nc = knn(pos2, cmean, nnc)
        pos_b = jnp.broadcast_to(jnp.asarray(pos2), (b, n, 2))
        nc_b = jnp.broadcast_to(jnp.asarray(nc), (b, n, nnc))

        q = jnp.asarray(rng.standard_normal((b, h, n, c_)), jnp.float32) * 0.2
        k = jnp.asarray(rng.standard_normal((b, h, n, c_)), jnp.float32) * 0.2
        v = jnp.asarray(rng.standard_normal((b, h, n, c_)), jnp.float32)
        w5 = jnp.asarray(rng.standard_normal((h, 5)), jnp.float32) * 0.1
        b5 = jnp.zeros((h,), jnp.float32)
        blank_k = jnp.asarray(rng.standard_normal((h, c_)), jnp.float32) * 0.2

        @jax.jit
        def fwd(q, k, v, salt):
            out, blank = sfc_cluster_attention(
                q + salt, k, v, pos_b, nc_b, w5, b5, blank_k, m
            )
            return jnp.sum(out.astype(jnp.float32)) + jnp.sum(blank)

        @jax.jit
        def vg(q, k, v, salt):
            def loss(q, k, v):
                out, blank = sfc_cluster_attention(
                    q, k, v, pos_b, nc_b, w5, b5, blank_k, m
                )
                return jnp.sum(out.astype(jnp.float32)) + jnp.sum(blank)

            val, grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(
                q + salt, k, v
            )
            return val + sum(jnp.sum(g) * 1e-30 for g in grads)

        label = f"n={n} h={h} c_={c_}"
        timed(f"fwd  {label}", fwd, q, k, v)
        timed(f"vjp  {label}", vg, q, k, v)


if __name__ == "__main__":
    main()
