"""Time one full training step (forward + Hungarian/auction matching +
criterion + backward + AdamW) of the flagship AFF-Mini MaskFormer on the
attached TPU chip.

Usage: python tools/bench_train_step.py [batch] [steps]

Uses a chained data dependency between steps plus a final scalar fetch to
measure wall time — ``block_until_ready`` does not block on this runtime.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> None:
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_cfg
    from autofocusformermod_tpu.engine.optimizer import build_optimizer
    from autofocusformermod_tpu.models import maskformer_from_config
    from autofocusformermod_tpu.parallel import TrainState, make_train_step

    print(f"backend={jax.default_backend()} devices={jax.devices()}", flush=True)

    cfg = _flagship_cfg()
    model = maskformer_from_config(cfg)
    H = W = 512
    t = 20
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.uniform(0, 255, (b, H, W, 3)), jnp.float32),
        "labels": jnp.asarray(rng.integers(0, 150, (b, t)), jnp.int32),
        "masks": jnp.asarray(
            (rng.uniform(size=(b, t, H, W)) > 0.7).astype(np.float32)
        ),
        "valid": jnp.asarray(rng.uniform(size=(b, t)) > 0.3),
    }

    print("init...", flush=True)
    t0 = time.perf_counter()
    variables = jax.jit(
        lambda: model.init(
            jax.random.PRNGKey(0), batch["image"][:1], train=False
        )
    )()
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))
    print(f"init done in {time.perf_counter()-t0:.1f}s, params={n_params/1e6:.2f}M", flush=True)

    tx = build_optimizer(cfg, variables["params"])
    state = TrainState.create(variables["params"], variables["batch_stats"], tx)

    step_fn = make_train_step(model, 150, donate=True)

    def chained(state, batch, salt):
        # data-dependence between consecutive steps so timing is honest
        img = batch["image"] + salt * 1e-12
        state, metrics = step_fn(state, {**batch, "image": img}, jax.random.PRNGKey(1))
        return state, metrics

    print("compile + warmup...", flush=True)
    t0 = time.perf_counter()
    salt = jnp.zeros(())
    state, metrics = chained(state, batch, salt)
    salt = metrics["total_loss"]
    loss0 = float(salt)
    print(
        f"first step in {time.perf_counter()-t0:.1f}s  loss={loss0:.4f} "
        f"grad_norm={float(metrics['grad_norm']):.3f}",
        flush=True,
    )
    assert np.isfinite(loss0), "non-finite loss"
    # one more warmup (donation path)
    state, metrics = chained(state, batch, salt)
    salt = metrics["total_loss"]
    float(salt)

    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = chained(state, batch, salt)
        salt = metrics["total_loss"]
    final = float(salt)  # forces the whole chain
    dt = time.perf_counter() - t0
    ips = b * steps / dt
    print(
        json.dumps(
            {
                "metric": "train_images_per_sec",
                "value": round(ips, 3),
                "unit": "im/s",
                "batch": b,
                "step_ms": round(1e3 * dt / steps, 1),
                "final_loss": round(final, 4),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
