"""Per-stage forward timing for the AFF backbone on TPU.

Times nested prefixes (patch embed; + stage 1; + stage 2; ...) of the
backbone forward and reports per-stage costs by difference, using the
chained-salt protocol from bench.py (block_until_ready does not block on
the axon runtime).

Usage: python tools/profile_backbone.py [batch] [iters]
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
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    import jax
    import jax.numpy as jnp
    import flax.linen as nn

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

    aff = model.backbone

    def stages_prefix(mdl, x, upto: int):
        """Run patch embed + the first `upto` stages of the backbone."""
        bb = mdl.backbone
        x = mdl.normalize(x).astype(mdl.compute_dtype)
        # reproduce AFF.__call__ up to stage `upto` via the module's own
        # submodule structure (nn.compact: call through apply on the parent)
        return bb(x, train=False, _profile_upto=upto)

    def scalarize(tree):
        return sum(
            jnp.sum(l.astype(jnp.float32))
            for l in jax.tree_util.tree_leaves(tree)
            if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.number)
        )

    def timed(name, fn):
        t0 = time.perf_counter()
        r = fn(jnp.float32(0.0))
        float(jax.tree.leaves(r)[0].astype(jnp.float32))
        comp = time.perf_counter() - t0
        salt = jnp.float32(0.0)
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(salt)
            salt = (jax.tree.leaves(r)[0].astype(jnp.float32) * 1e-12).astype(
                jnp.float32
            )
        float(salt)
        ms = 1e3 * (time.perf_counter() - t0) / iters
        print(f"{name:28s} {ms:8.1f} ms  [compile {comp:.0f}s]", flush=True)
        return ms

    results = []
    for upto in range(0, 5):
        def run(salt, upto=upto):
            v = amp_variables(dict(variables), enabled=amp)
            out = model.apply(
                v, image + salt, method=stages_prefix, upto=upto,
            )
            return scalarize(out)

        label = "patch_embed" if upto == 0 else f"+ stage {upto}"
        results.append(timed(label, jax.jit(run)))

    print("\nper-stage (ms):")
    print(f"  patch_embed  {results[0]:7.1f}")
    for i in range(1, 5):
        print(f"  stage {i}      {results[i] - results[i - 1]:7.1f}")


if __name__ == "__main__":
    main()
