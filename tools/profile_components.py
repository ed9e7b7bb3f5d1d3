"""Per-component inference timing for the flagship MaskFormer on TPU.

Times nested prefixes of the forward pipeline (normalize+backbone; +pixel
decoder; full model; +mask upsample & semantic inference) and reports the
difference as the per-component cost.  Uses the chained-salt protocol from
bench.py because ``block_until_ready`` does not block on this runtime.

Usage: python tools/profile_components.py [batch] [iters]
Env:   PROF_AMP=0 to profile the fp32 path (default bf16, as the bench).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> None:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_cfg
    from autofocusformermod_tpu.models import (
        maskformer_from_config,
        semantic_inference,
        upsample_masks,
    )

    cfg = _flagship_cfg()
    amp = os.environ.get("PROF_AMP", "1") not in ("0", "false")
    if amp:
        cfg.SOLVER.AMP.ENABLED = True
    model = maskformer_from_config(cfg)
    size = 512
    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 255, (batch, size, size, 3)),
        jnp.float32,
    )
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x[:1], train=False))()
    if amp:
        from autofocusformermod_tpu.parallel.precision import amp_variables

        variables = jax.jit(lambda v: amp_variables(v))(dict(variables))

    def scalarize(tree):
        # MUST consume every numeric leaf (incl. int argmax outputs): a
        # stage whose result doesn't feed the salt is dead code to XLA and
        # measures nothing (r3 fix: full+inference read 5 ms because the
        # int32 argmax was dropped here)
        leaves = [
            jnp.sum(l.astype(jnp.float32)) for l in jax.tree_util.tree_leaves(tree)
            if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.number)
        ]
        return sum(leaves) * 1e-9

    def m_backbone(mdl, x):
        return mdl.backbone(mdl.normalize(x).astype(mdl.compute_dtype))

    def m_pixdec(mdl, x):
        feats = mdl.backbone(mdl.normalize(x).astype(mdl.compute_dtype))
        return mdl.head.pixel_decoder(feats, True)

    def m_full(mdl, x):
        return mdl(x)

    def m_full_inference(mdl, x):
        out = mdl(x)
        masks = upsample_masks(out["pred_masks"], (size, size))
        sem = jax.vmap(semantic_inference)(out["pred_logits"], masks)
        return jnp.argmax(sem, axis=1).astype(jnp.int32)

    stages = [
        ("backbone", m_backbone),
        ("backbone+pixel_decoder", m_pixdec),
        ("full_model", m_full),
        ("full+inference", m_full_inference),
    ]

    results = {}
    for name, method in stages:
        fn = jax.jit(
            lambda v, x, salt, method=method: scalarize(
                model.apply(v, x + salt, method=method)
            )
        )

        def run(n):
            salt = jnp.zeros((), jnp.float32)
            for _ in range(n):
                salt = fn(variables, x, salt) * 0.0
            return float(salt)

        run(2)  # compile + warmup
        t0 = time.perf_counter()
        run(iters)
        dt = (time.perf_counter() - t0) / iters
        results[name] = dt
        print(f"{name:28s} {dt * 1e3:8.1f} ms/batch{batch}", flush=True)

    prev = 0.0
    print("\ndeltas:")
    order = [
        "backbone", "backbone+pixel_decoder", "full_model", "full+inference"
    ]
    labels = ["backbone", "pixel_decoder", "transformer_decoder", "upsample+sem_inf"]
    for key, label in zip(order, labels):
        dt = results[key] - prev
        print(f"  {label:24s} {dt * 1e3:8.1f} ms")
        prev = results[key]
    ips = batch / results["full+inference"]
    print(f"\nend-to-end: {ips:.2f} im/s (batch {batch})")


if __name__ == "__main__":
    main()
