"""Op-level device profile of the flagship model via jax.profiler.trace.

The axon runtime exports per-HLO-instruction device events (verified: pid =
/device:TPU:0, one X event per instruction with real durations), so instead
of inferring component costs by program differencing, trace ONE execution and
aggregate instruction time.

Usage: python tools/trace_ops.py [mode] [batch] [top]
  mode: fwd | vg | crit | train   (default vg)
Env:   PROF_AMP=0 for fp32 (default bf16 to match bench.py).

Prints the top-N instructions by total device time, grouped by HLO name with
trailing .N / digits stripped, plus a category rollup (fusion / gather /
scatter / dot / conv / copy / custom-call / rest).
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, ".")

TRACE_DIR = "/tmp/trace_ops"


def run_and_trace(fn, *args):
    import jax

    # warmup / compile
    r = fn(*args)
    float(jax.tree.leaves(r)[0].astype("float32").sum())
    os.system(f"rm -rf {TRACE_DIR}")
    with jax.profiler.trace(TRACE_DIR):
        r = fn(*args)
        float(jax.tree.leaves(r)[0].astype("float32").sum())


def load_device_events():
    paths = glob.glob(f"{TRACE_DIR}/plugins/profile/*/*.trace.json.gz")
    assert paths, "no trace written"
    with gzip.open(sorted(paths)[-1]) as f:
        d = json.load(f)
    tr = d["traceEvents"]
    dev_pids = {
        e["pid"]
        for e in tr
        if e.get("ph") == "M"
        and e.get("name") == "process_name"
        and "TPU" in str(e.get("args", {}).get("name", ""))
    }
    return [
        e
        for e in tr
        if e.get("ph") == "X" and e.get("pid") in dev_pids and e.get("dur")
    ]


_STRIP = re.compile(r"[.\-]?\d+$")


def group(name: str) -> str:
    n = name.split("(")[0]
    return _STRIP.sub("", n)


def category(name: str) -> str:
    n = name.lower()
    for k in ("custom-call", "fusion", "gather", "scatter", "dot", "conv",
              "copy", "transpose", "reduce", "broadcast", "while", "select",
              "iota", "dynamic"):
        if k in n:
            return k
    return "other"


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "vg"
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    top = int(sys.argv[3]) if len(sys.argv) > 3 else 40

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_cfg
    from autofocusformermod_tpu.losses.criterion import set_criterion
    from autofocusformermod_tpu.models import maskformer_from_config
    from autofocusformermod_tpu.parallel.precision import amp_variables

    amp = os.environ.get("PROF_AMP", "1") not in ("0", "false")
    cfg = _flagship_cfg()
    if amp:
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

    if mode == "fwd":
        f = jax.jit(lambda p, x: jax.tree.map(
            lambda a: jnp.sum(a.astype(jnp.float32)), fwd(p, x)))
        run_and_trace(f, params, image)
    elif mode == "vg":
        def loss(p, x):
            out = fwd(p, x)
            return sum(jnp.sum(o.astype(jnp.float32))
                       for o in jax.tree.leaves(out))

        f = jax.jit(lambda p, x: jax.value_and_grad(loss)(p, x))
        run_and_trace(f, params, image)
    elif mode == "crit":
        outputs = jax.jit(fwd)(params, image)
        outputs = jax.tree.map(lambda a: jnp.asarray(np.asarray(a)), outputs)
        f = jax.jit(lambda o, tg: set_criterion(
            jax.random.PRNGKey(2), o, tg, num_classes=150)[0])
        run_and_trace(f, outputs, tgt)
    elif mode == "train":
        from autofocusformermod_tpu.engine.optimizer import build_optimizer
        from autofocusformermod_tpu.parallel import TrainState, make_train_step

        tx = build_optimizer(cfg, params)
        state = TrainState.create(params, bs, tx)
        step = make_train_step(
            model, 150, amp=amp, donate=False,  # re-invoked on the same state
        )
        batch = {"image": image, **tgt}

        def f(s, bch):
            s2, m = step(s, bch, jax.random.PRNGKey(3))
            return m["total_loss"]

        run_and_trace(f, state, batch)
    else:
        raise SystemExit(f"unknown mode {mode}")

    ev = load_device_events()
    total = sum(e["dur"] for e in ev)
    by_name = collections.Counter()
    counts = collections.Counter()
    by_cat = collections.Counter()
    for e in ev:
        g = group(e["name"])
        by_name[g] += e["dur"]
        counts[g] += 1
        by_cat[category(e["name"])] += e["dur"]

    print(f"\n{len(ev)} device events, total {total / 1e3:.1f} ms\n")
    print("category rollup:")
    for c, us in by_cat.most_common():
        print(f"  {c:12s} {us / 1e3:8.1f} ms  ({100 * us / total:4.1f}%)")
    print(f"\ntop {top} instruction groups:")
    for g, us in by_name.most_common(top):
        print(f"  {us / 1e3:8.1f} ms  x{counts[g]:<5d} {g[:70]}")


if __name__ == "__main__":
    main()
