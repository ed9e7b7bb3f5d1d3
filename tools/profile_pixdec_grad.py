"""Decompose the pixel decoder's BACKWARD cost with the ablation switches
(models/pixel_decoder.py: ABLATE_*), timing value_and_grad of
backbone+pixdec per variant.  (full - ablated) ~= that stage's in-context
fwd+bwd cost.

Usage: python tools/profile_pixdec_grad.py [batch] [iters]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> None:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_cfg
    from autofocusformermod_tpu.models import maskformer_from_config
    from autofocusformermod_tpu.models import pixel_decoder as pd
    from autofocusformermod_tpu.parallel.precision import amp_variables

    amp = os.environ.get("PROF_AMP", "1") not in ("0", "false")
    cfg = _flagship_cfg()
    model = maskformer_from_config(cfg)
    size = 512
    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 255, (batch, size, size, 3)),
        jnp.float32,
    )
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x[:1], train=False))()
    params = variables["params"]
    bs = variables.get("batch_stats", {})

    def scalarize(tree):
        return sum(
            jnp.sum(l.astype(jnp.float32))
            for l in jax.tree_util.tree_leaves(tree)
            if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)
        )

    def m_pixdec(mdl, x):
        feats = mdl.backbone(mdl.normalize(x).astype(mdl.compute_dtype))
        return mdl.head.pixel_decoder(feats, True)

    def time_variant(name, **flags):
        saved = {k: getattr(pd, k) for k in flags}
        for k, v in flags.items():
            setattr(pd, k, v)
        try:
            def f(p, salt):
                def loss(p_):
                    v = amp_variables({"params": p_, "batch_stats": bs},
                                      enabled=amp)
                    out, _ = model.apply(
                        v, x + salt, method=m_pixdec, mutable=["batch_stats"],
                        rngs={"dropout": jax.random.PRNGKey(1)},
                    )
                    return scalarize(out)

                v, g = jax.value_and_grad(loss)(p)
                return v + scalarize(g) * 1e-30

            f = jax.jit(f)
            t0 = time.perf_counter()
            float(f(params, jnp.float32(0.0)))
            comp = time.perf_counter() - t0
            salt = jnp.float32(0.0)
            t0 = time.perf_counter()
            for _ in range(iters):
                salt = (f(params, salt) * 1e-30).astype(jnp.float32)
            float(salt)
            dt = (time.perf_counter() - t0) / iters
        finally:
            for k, v in saved.items():
                setattr(pd, k, v)
        print(f"{name:24s} {dt * 1e3:8.1f} ms  [compile {comp:.0f}s]", flush=True)
        return dt

    full = time_variant("full")
    no_ms = time_variant("no msdetrpc", ABLATE_MSDETRPC=True)
    no_pack = time_variant("no packed gathers", ABLATE_PACK=True)
    no_knn = time_variant("no knn", ABLATE_KNN=True)
    no_shep = time_variant("no shepard pow", ABLATE_SHEPARD=True)

    print("\nin-context fwd+bwd costs (full - ablated):")
    print(f"  msdetrpc kernel      {(full - no_ms) * 1e3:8.1f} ms")
    print(f"  packed table gathers {(full - no_pack) * 1e3:8.1f} ms")
    print(f"  grid 4-NN knn        {(full - no_knn) * 1e3:8.1f} ms")
    print(f"  shepard pow/weights  {(full - no_shep) * 1e3:8.1f} ms")


if __name__ == "__main__":
    main()
