#!/usr/bin/env python
"""Model analysis: parameter counts, XLA FLOP estimate, compiled-memory stats.

TPU equivalent of the reference tools/analyze_model.py (fvcore
FlopCountAnalysis / parameter_count_table): uses jax's compiled cost analysis
on the jitted eval forward.

Usage: python tools/analyze_model.py --tasks flop param structure \
          [--config-file ...] [--input-size 512]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config-file", default="")
    ap.add_argument("--tasks", nargs="+", default=["flop", "param"],
                    choices=["flop", "param", "structure", "memory"])
    ap.add_argument("--input-size", type=int, default=512)
    ap.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    args = ap.parse_args()

    from autofocusformermod_tpu.config import (
        add_deeplab_config, add_maskformer2_config, get_cfg,
    )

    cfg = get_cfg()
    add_deeplab_config(cfg)
    add_maskformer2_config(cfg)
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    else:
        from __graft_entry__ import _flagship_cfg

        cfg = _flagship_cfg()
    if args.opts:
        cfg.merge_from_list(args.opts)

    import jax
    import jax.numpy as jnp

    from autofocusformermod_tpu.models import maskformer_from_config

    model = maskformer_from_config(cfg)
    s = args.input_size
    x = jnp.zeros((1, s, s, 3), jnp.float32)
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x, train=False))()

    if "param" in args.tasks or "structure" in args.tasks:
        flat = jax.tree_util.tree_leaves_with_path(variables["params"])
        total = 0
        rows = []
        for path, leaf in flat:
            nme = jax.tree_util.keystr(path)
            total += leaf.size
            rows.append((nme, leaf.shape, leaf.size))
        print(f"total parameters: {total / 1e6:.2f} M ({total})")
        if "structure" in args.tasks:
            for nme, shape, size in rows:
                print(f"  {nme:80s} {str(shape):24s} {size}")

    if "flop" in args.tasks or "memory" in args.tasks:
        fn = jax.jit(lambda v, x: model.apply(v, x, train=False))
        lowered = fn.lower(variables, x)
        compiled = lowered.compile()
        try:
            ca = compiled.cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            flops = ca.get("flops", float("nan"))
            print(f"XLA flops estimate (eval fwd, {s}x{s}): {flops / 1e9:.2f} GFLOPs")
            for k in ("bytes accessed", "transcendentals"):
                if k in ca:
                    print(f"  {k}: {ca[k]:.3e}")
        except Exception as e:  # noqa: BLE001
            print(f"cost_analysis unavailable: {e}")
        if "memory" in args.tasks:
            try:
                ma = compiled.memory_analysis()
                print(f"compiled memory: argument {ma.argument_size_in_bytes / 1e6:.1f} MB, "
                      f"output {ma.output_size_in_bytes / 1e6:.1f} MB, "
                      f"temp {ma.temp_size_in_bytes / 1e6:.1f} MB")
            except Exception as e:  # noqa: BLE001
                print(f"memory_analysis unavailable: {e}")


if __name__ == "__main__":
    main()
