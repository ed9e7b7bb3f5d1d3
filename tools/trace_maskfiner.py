"""Op-level device profile of the MaskFiner cascade TRAIN step (VERDICT r4
item 4: the cascade trained at 1.56 im/s with no committed breakdown).

Same mechanism as tools/trace_ops.py (axon exports per-HLO-instruction
device events), applied to the 4-stage MixRes cascade's full train step
(4 backbones + 4 pixel decoders/mask decoders + per-stage criterion +
backward + AdamW), aggregated by source line so the cost lands on code.

Usage: python tools/trace_maskfiner.py [batch] [top]
Env:   BENCH_AMP=0 for fp32 (default bf16, matching bench.py).
"""

from __future__ import annotations

import collections
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from trace_ops import load_device_events, run_and_trace  # noqa: E402


def main() -> None:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    top = int(sys.argv[2]) if len(sys.argv) > 2 else 30

    import jax
    import jax.numpy as jnp

    from autofocusformermod_tpu.config import add_maskformer2_config, get_cfg
    from autofocusformermod_tpu.engine.optimizer import build_optimizer
    from autofocusformermod_tpu.models.registry import build_model
    from autofocusformermod_tpu.parallel import (
        TrainState,
        make_maskfiner_train_step,
    )

    cfg = get_cfg()
    add_maskformer2_config(cfg)
    cfg.merge_from_file(
        os.path.join(
            os.path.dirname(__file__), "..",
            "configs/ade20k/semantic-segmentation/maskfiner/"
            "maskfiner_mini_bs32_80k.yaml",
        )
    )
    amp = os.environ.get("BENCH_AMP", "1") not in ("0", "false")
    if amp:
        cfg.SOLVER.AMP.ENABLED = True
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    t = 8
    size = 512
    nc = cfg.MODEL.MR_SEM_SEG_HEAD.NUM_CLASSES
    data = {
        "image": jnp.asarray(
            rng.uniform(0, 255, (batch, size, size, 3)), jnp.float32),
        "labels": jnp.asarray(rng.integers(0, nc, (batch, t)), jnp.int32),
        "masks": jnp.asarray(
            rng.integers(0, 2, (batch, t, size, size)), jnp.float32),
        "valid": jnp.ones((batch, t), bool),
    }
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), data["image"][:1],
                           train=False)
    )()
    tx = build_optimizer(cfg, variables["params"])
    state = TrainState.create(
        variables["params"], variables.get("batch_stats", {}), tx)
    step_fn = make_maskfiner_train_step(
        model, nc, num_points=12544, donate=False, amp=amp,
    )

    def f(s, bch):
        s2, m = step_fn(s, bch, jax.random.PRNGKey(3))
        return m["total_loss"]

    run_and_trace(f, state, data)

    ev = [e for e in load_device_events()
          if not e["name"].startswith("jit_")
          and not (e["name"].split(".")[0].isdigit() if "." in e["name"]
                   else e["name"].isdigit())]
    total = sum(e["dur"] for e in ev)
    by_src = collections.Counter()
    cnt = collections.Counter()
    for e in ev:
        src = e.get("args", {}).get("source", "(none)")
        src = src.replace("/root/repo/", "")
        by_src[src] += e["dur"]
        cnt[src] += 1
    print(f"\nMaskFiner train step: {total / 1e3:.1f} ms device time "
          f"(batch {batch}, amp={amp})\n")
    for s, us in by_src.most_common(top):
        print(f"  {us / 1e3:7.2f} ms x{cnt[s]:<5d} {s}")


if __name__ == "__main__":
    main()
