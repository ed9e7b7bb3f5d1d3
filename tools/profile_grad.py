"""Attribute the train step's backward cost: model backward vs criterion
backward, each timed as its own jitted value_and_grad program.

- model bwd: grad of sum-of-outputs wrt params (no criterion)
- criterion bwd: grad of the loss wrt the model OUTPUTS (fixed, no model)

Usage: python tools/profile_grad.py [batch] [iters]
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

    from __graft_entry__ import _flagship_cfg
    from autofocusformermod_tpu.losses.criterion import set_criterion
    from autofocusformermod_tpu.models import maskformer_from_config
    from autofocusformermod_tpu.parallel.precision import amp_variables

    amp = os.environ.get("PROF_AMP", "1") not in ("0", "false")
    cfg = _flagship_cfg()
    if amp:
        # match bench.py: bf16 compute_dtype, not just bf16 params
        cfg.SOLVER.AMP.ENABLED = True
    model = maskformer_from_config(cfg)
    H = W = 512
    t = 20
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.uniform(0, 255, (b, H, W, 3)), jnp.float32)
    tgt = {
        "labels": jnp.asarray(rng.integers(0, 150, (b, t)), jnp.int32),
        "masks": jnp.asarray(
            (rng.uniform(size=(b, t, H, W)) > 0.7), jnp.float32
        ),
        "valid": jnp.asarray(rng.uniform(size=(b, t)) > 0.3),
    }

    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), image[:1], train=False)
    )()
    params = variables["params"]
    bs = variables.get("batch_stats", {})

    def fwd(p, x):
        v = amp_variables({"params": p, "batch_stats": bs}, enabled=amp)
        out, _ = model.apply(
            v, x, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1)},
        )
        return out

    def timed(name, fn, *args):
        t0 = time.perf_counter()
        salt = jnp.float32(0.0)
        r = fn(*args, salt)
        jax.block_until_ready(r)
        leaves = jax.tree.leaves(r)
        float(jnp.sum(leaves[0].astype(jnp.float32)))
        comp = time.perf_counter() - t0
        salt = jnp.float32(0.0)
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(*args, salt)
            leaves = jax.tree.leaves(r)
            salt = (jnp.sum(leaves[0].astype(jnp.float32)) * 1e-12).astype(
                jnp.float32
            )
        float(salt)
        ms = 1e3 * (time.perf_counter() - t0) / iters
        print(f"{name:28s} {ms:8.1f} ms  [compile {comp:.0f}s]", flush=True)
        return ms

    # --- model forward / backward only ------------------------------------
    @jax.jit
    def f_fwd(p, x, salt):
        out = fwd(p, x + salt)
        return sum(
            jnp.sum(o.astype(jnp.float32))
            for o in jax.tree.leaves(out)
        )

    @jax.jit
    def f_vg(p, x, salt):
        def loss(p_):
            out = fwd(p_, x + salt)
            return sum(
                jnp.sum(o.astype(jnp.float32))
                for o in jax.tree.leaves(out)
            )

        return jax.value_and_grad(loss)(p)

    m_f = timed("model forward", f_fwd, params, image)
    m_vg = timed("model value_and_grad", f_vg, params, image)
    print(f"  -> model backward ~{m_vg - m_f:.1f} ms", flush=True)

    # --- criterion forward / backward wrt outputs --------------------------
    outputs = jax.jit(fwd)(params, image)
    outputs = jax.tree.map(lambda a: jnp.asarray(np.asarray(a)), outputs)

    @jax.jit
    def c_fwd(out, tg, salt):
        out = jax.tree.map(lambda a: a + salt.astype(a.dtype), out)
        total, _ = set_criterion(
            jax.random.PRNGKey(2), out, tg, num_classes=150
        )
        return total

    @jax.jit
    def c_vg(out, tg, salt):
        def loss(o):
            o = jax.tree.map(lambda a: a + salt.astype(a.dtype), o)
            total, _ = set_criterion(
                jax.random.PRNGKey(2), o, tg, num_classes=150
            )
            return total

        return jax.value_and_grad(loss)(out)

    c_f = timed("criterion forward", c_fwd, outputs, tgt)
    c_vg_ms = timed("criterion value_and_grad", c_vg, outputs, tgt)
    print(f"  -> criterion backward ~{c_vg_ms - c_f:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
