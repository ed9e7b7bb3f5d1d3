"""Attribute the model backward cost per component via nested prefixes.

Times value_and_grad (wrt params) of (1) backbone only, (2) backbone +
pixel decoder, (3) the full model — differences give each component's
fwd+bwd in-context cost.  Chained-salt protocol as bench.py.

Usage: python tools/profile_grad_components.py [batch] [iters]
Env:   PROF_AMP=0 for fp32 (default bf16, matching bench.py).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> None:
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_cfg
    from autofocusformermod_tpu.models import maskformer_from_config
    from autofocusformermod_tpu.parallel.precision import amp_variables

    amp = os.environ.get("PROF_AMP", "1") not in ("0", "false")
    cfg = _flagship_cfg()
    if amp:
        # match bench.py: bf16 compute_dtype, not just bf16 params
        cfg.SOLVER.AMP.ENABLED = True
    model = maskformer_from_config(cfg)
    H = W = 512
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.uniform(0, 255, (b, H, W, 3)), jnp.float32)

    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), image[:1], train=False)
    )()
    params = variables["params"]
    bs = variables.get("batch_stats", {})

    def scalarize(tree):
        return sum(
            jnp.sum(l.astype(jnp.float32))
            for l in jax.tree_util.tree_leaves(tree)
            if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)
        )

    def m_backbone(mdl, x):
        return mdl.backbone(mdl.normalize(x).astype(mdl.compute_dtype))

    def m_pixdec(mdl, x):
        feats = mdl.backbone(mdl.normalize(x).astype(mdl.compute_dtype))
        return mdl.head.pixel_decoder(feats, True)

    def m_full(mdl, x):
        return mdl(x, train=True)

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
        print(f"{name:34s} {ms:8.1f} ms  [compile {comp:.0f}s]", flush=True)
        return ms

    results = {}
    for name, method in [
        ("backbone", m_backbone),
        ("backbone+pixdec", m_pixdec),
        ("full model", m_full),
    ]:
        def loss(p, salt, method=method):
            v = amp_variables({"params": p, "batch_stats": bs}, enabled=amp)
            out, _ = model.apply(
                v, image + salt, method=method, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(1)},
            )
            return scalarize(out)

        f_f = jax.jit(lambda p, salt, loss=loss: loss(p, salt))

        def f_g(p, salt, loss=loss):
            v, g = jax.value_and_grad(lambda p_: loss(p_, salt))(p)
            # fold the grads into the scalar so the backward survives DCE
            return v + scalarize(g) * 1e-30

        f_g = jax.jit(f_g)
        fms = timed(f"{name} fwd", f_f, params)
        gms = timed(f"{name} value_and_grad", f_g, params)
        results[name] = (fms, gms)

    bb_f, bb_g = results["backbone"]
    px_f, px_g = results["backbone+pixdec"]
    fl_f, fl_g = results["full model"]
    print("\nin-context fwd / fwd+bwd / bwd-only (ms):")
    print(f"  backbone       {bb_f:7.1f} {bb_g:7.1f} {bb_g - bb_f:7.1f}")
    print(f"  pixel decoder  {px_f - bb_f:7.1f} {px_g - bb_g:7.1f} "
          f"{(px_g - bb_g) - (px_f - bb_f):7.1f}")
    print(f"  mask decoder   {fl_f - px_f:7.1f} {fl_g - px_g:7.1f} "
          f"{(fl_g - px_g) - (fl_f - px_f):7.1f}")


if __name__ == "__main__":
    main()
