"""Decompose the pixel decoder's inference cost with the built-in ablation
switches (models/pixel_decoder.py: ABLATE_MSDETRPC / ABLATE_PACK / ABLATE_KNN).

Each ablation zeroes one stage while keeping shapes and the rest of the graph
intact, so (full - ablated) ~= that stage's in-context cost.

Usage: python tools/profile_pixdec.py [batch] [iters]
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
    from autofocusformermod_tpu.models import maskformer_from_config
    from autofocusformermod_tpu.models import pixel_decoder as pd

    cfg = _flagship_cfg()
    if os.environ.get("PROF_AMP", "1") not in ("0", "false"):
        cfg.SOLVER.AMP.ENABLED = True
    model = maskformer_from_config(cfg)
    size = 512
    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 255, (batch, size, size, 3)),
        jnp.float32,
    )
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x[:1], train=False))()
    if cfg.SOLVER.AMP.ENABLED:
        from autofocusformermod_tpu.parallel.precision import amp_variables

        variables = jax.jit(lambda v: amp_variables(v))(dict(variables))

    def scalarize(tree):
        leaves = [
            jnp.sum(l.astype(jnp.float32)) for l in jax.tree_util.tree_leaves(tree)
            if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)
        ]
        return sum(leaves) * 1e-9

    def m_pixdec(mdl, x):
        feats = mdl.backbone(mdl.normalize(x).astype(mdl.compute_dtype))
        return mdl.head.pixel_decoder(feats, True)

    def time_variant(name, **flags):
        saved = {k: getattr(pd, k) for k in flags}
        for k, v in flags.items():
            setattr(pd, k, v)
        try:
            fn = jax.jit(
                lambda v, x, salt: scalarize(model.apply(v, x + salt, method=m_pixdec))
            )

            def run(n):
                salt = jnp.zeros((), jnp.float32)
                for _ in range(n):
                    salt = fn(variables, x, salt) * 0.0
                return float(salt)

            run(2)
            t0 = time.perf_counter()
            run(iters)
            dt = (time.perf_counter() - t0) / iters
        finally:
            for k, v in saved.items():
                setattr(pd, k, v)
        print(f"{name:24s} {dt * 1e3:8.1f} ms/batch{batch}", flush=True)
        return dt

    # PROF_VARIANTS: comma list to run a subset (remote compiles are minutes
    # each; one 600s window rarely fits all six — run them one at a time)
    variants = {
        "full": {},
        "no_msdetrpc": {"ABLATE_MSDETRPC": True},
        "no_pack": {"ABLATE_PACK": True},
        "no_knn": {"ABLATE_KNN": True},
        "no_shepard": {"ABLATE_SHEPARD": True},
        "dense_only": {"ABLATE_MSDETRPC": True, "ABLATE_PACK": True,
                       "ABLATE_KNN": True},
    }
    selected = os.environ.get("PROF_VARIANTS", ",".join(variants)).split(",")
    results = {}
    for name in selected:
        results[name] = time_variant(name, **variants[name])

    if "full" in results:
        full = results["full"]
        print("\nin-context costs (full - ablated):")
        for name, label in [
            ("no_msdetrpc", "msdetrpc kernel"),
            ("no_pack", "packed table gathers"),
            ("no_knn", "grid 4-NN knn"),
            ("no_shepard", "shepard pow/weights"),
        ]:
            if name in results:
                print(f"  {label:20s} {(full - results[name]) * 1e3:8.1f} ms")
        if "dense_only" in results:
            print(f"  dense/other residual {results['dense_only'] * 1e3:8.1f} ms")


if __name__ == "__main__":
    main()
