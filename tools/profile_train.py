"""Nested-prefix timing of the flagship training step on TPU.

Times (1) forward(train=True), (2) +criterion (loss value), (3) value_and_grad,
(4) the full train step (grads + clip + AdamW), each as its own jitted program
with the chained-salt protocol from bench.py; differences between consecutive
stages give the per-component cost (criterion, backward, optimizer).

Usage: python tools/profile_train.py [batch] [iters]
Env:   PROF_AMP=0 for fp32 (default bf16, matching bench.py BENCH_AMP).
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
    from autofocusformermod_tpu.engine.optimizer import build_optimizer
    from autofocusformermod_tpu.losses.criterion import set_criterion
    from autofocusformermod_tpu.models import maskformer_from_config
    from autofocusformermod_tpu.parallel import TrainState, make_train_step
    from autofocusformermod_tpu.parallel.precision import amp_variables

    amp = os.environ.get("PROF_AMP", "1") not in ("0", "false")
    cfg = _flagship_cfg()
    model = maskformer_from_config(cfg)
    H = W = 512
    t = 20
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.uniform(0, 255, (b, H, W, 3)), jnp.float32),
        "labels": jnp.asarray(rng.integers(0, 150, (b, t)), jnp.int32),
        "masks": jnp.asarray((rng.uniform(size=(b, t, H, W)) > 0.7), jnp.float32),
        "valid": jnp.asarray(rng.uniform(size=(b, t)) > 0.3),
    }
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), batch["image"][:1], train=False)
    )()
    params, bstats = variables["params"], variables.get("batch_stats", {})

    def fwd(params, bstats, batch, key):
        v = amp_variables({"params": params, "batch_stats": bstats}, enabled=amp)
        outputs, _ = model.apply(
            v, batch["image"], train=True, mutable=["batch_stats"],
            rngs={"dropout": key},
        )
        return outputs

    def loss(params, bstats, batch, key):
        k_drop, k_crit = jax.random.split(key)
        outputs = fwd(params, bstats, batch, k_drop)
        targets = {k: batch[k] for k in ("labels", "masks", "valid")}
        total, _ = set_criterion(k_crit, outputs, targets, 150)
        return total

    @jax.jit
    def stage_fwd(params, bstats, batch, salt):
        out = fwd(params, bstats, {**batch, "image": batch["image"] + salt * 1e-12},
                  jax.random.PRNGKey(1))
        return jnp.sum(out["pred_logits"].astype(jnp.float32)) * 1e-9

    @jax.jit
    def stage_loss(params, bstats, batch, salt):
        return loss(params, bstats,
                    {**batch, "image": batch["image"] + salt * 1e-12},
                    jax.random.PRNGKey(1))

    @jax.jit
    def stage_grad(params, bstats, batch, salt):
        total, grads = jax.value_and_grad(loss)(
            params, bstats, {**batch, "image": batch["image"] + salt * 1e-12},
            jax.random.PRNGKey(1))
        return total + optax_global_norm(grads) * 1e-12

    import optax

    def optax_global_norm(g):
        return optax.global_norm(g)

    tx = build_optimizer(cfg, params)
    state = TrainState.create(params, bstats, tx)
    step_fn = make_train_step(model, 150, donate=False, amp=amp)

    def stage_step(state, batch, salt):
        img = batch["image"] + salt * 1e-12
        state, metrics = step_fn(state, {**batch, "image": img}, jax.random.PRNGKey(1))
        return metrics["total_loss"]

    stages = [
        ("forward", lambda s: stage_fwd(params, bstats, batch, s)),
        ("fwd+criterion", lambda s: stage_loss(params, bstats, batch, s)),
        ("value_and_grad", lambda s: stage_grad(params, bstats, batch, s)),
        ("full step", lambda s: stage_step(state, batch, s)),
    ]
    # PROF_STAGES=forward,full step — run a subset (cold TPU compiles are
    # minutes each; per-stage invocations bound each run's wall clock)
    sel = os.environ.get("PROF_STAGES")
    if sel:
        keep = [x.strip() for x in sel.split(",")]
        stages = [st for st in stages if st[0] in keep]
    prev = 0.0
    print(f"amp={amp} batch={b}", flush=True)
    for name, fn in stages:
        t0 = time.perf_counter()
        salt = jnp.zeros(())
        salt = fn(salt)
        float(salt)
        compile_s = time.perf_counter() - t0
        salt = fn(salt)
        float(salt)
        t0 = time.perf_counter()
        for _ in range(iters):
            salt = fn(salt)
        float(salt)
        ms = 1e3 * (time.perf_counter() - t0) / iters
        print(f"{name:16s} {ms:8.1f} ms  (+{ms - prev:7.1f})  [compile {compile_s:.0f}s]",
              flush=True)
        prev = ms


if __name__ == "__main__":
    main()
