"""Benchmark: ADE20K 512x512 semantic-segmentation inference throughput
(images/sec/chip) for AFF-Mini + Mask2Former on the local accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
The reference publishes no throughput number (BASELINE.json "published": {}),
so vs_baseline is reported against the first recorded value of this bench
(1.0 when no prior record exists).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_cfg
    from autofocusformermod_tpu.models import (
        maskformer_from_config,
        semantic_inference,
        upsample_masks,
    )

    # throughput is flat in batch up to 4 (the point-cloud gathers are
    # latency-bound, not batch-amortized) and regresses at 8 (HBM pressure);
    # 4 is the model's best measured operating point on v5e
    batch = int(os.environ.get("BENCH_BATCH", "4"))
    iters = int(os.environ.get("BENCH_ITERS", "20"))
    warmup = int(os.environ.get("BENCH_WARMUP", "3"))

    cfg = _flagship_cfg()
    model = maskformer_from_config(cfg)
    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 255, (batch, 512, 512, 3)), jnp.float32
    )
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x[:1], train=False))()

    @jax.jit
    def infer(variables, x, salt):
        # `salt` chains iterations into a data-dependent sequence so async
        # runtimes (axon tunnel: block_until_ready does not block) cannot
        # overlap or elide steps; sync is a single end-of-loop scalar fetch.
        out = model.apply(variables, x + salt, train=False)
        masks = upsample_masks(out["pred_masks"], (512, 512))
        sem = jax.vmap(semantic_inference)(out["pred_logits"], masks)
        pred = jnp.argmax(sem, axis=1).astype(jnp.int32)
        return pred, jnp.mean(sem) * 1e-6

    def run(n):
        salt = jnp.zeros((), jnp.float32)
        pred = None
        for _ in range(n):
            pred, salt = infer(variables, x, salt)
        return float(salt), pred  # scalar fetch forces full completion

    run(warmup)
    t0 = time.perf_counter()
    run(iters)
    dt = time.perf_counter() - t0

    ips = batch * iters / dt

    prior_path = os.path.join(os.path.dirname(__file__), ".bench_first.json")
    vs = 1.0
    try:
        if os.path.exists(prior_path):
            first = json.load(open(prior_path))["value"]
            vs = ips / first
        else:
            json.dump({"value": ips}, open(prior_path, "w"))
    except Exception:
        pass

    print(
        json.dumps(
            {
                "metric": "ADE20K 512x512 semseg inference images/sec/chip (AFF-Mini + Mask2Former)",
                "value": round(ips, 3),
                "unit": "images/sec/chip",
                "vs_baseline": round(vs, 4),
                "batch": batch,
                "backend": jax.default_backend(),
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
