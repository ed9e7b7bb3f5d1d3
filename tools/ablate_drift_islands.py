"""Per-island AMP ablation at the soak checkpoint (VERDICT r4 item 1a).

DRIFT_r04.json measured the uniform-bf16 production path flipping 3.14% of
mask-threshold decisions vs fp32 at trained weights — above both the 1%
budget and the near-threshold mass, i.e. a real precision defect.  The
pallas_only tier is 0.0, so the flips come from one or more AMP'd
components.  This tool localizes them: for each candidate fp32-island set
(parallel.precision.ISLAND_PARAM_PATHS) it rebuilds the flagship model with
that island active and measures decision flips vs the fp32-HIGHEST XLA
reference at the soak-trained weights.

The reference's own recipe keeps the whole pixel decoder fp32
(reference msdeformattn_pc.py:464 @autocast(enabled=False)); the ablation
tells us whether a cheaper island (the mask prediction heads) suffices.

Usage: python tools/ablate_drift_islands.py [batch]   (needs the TPU)
Writes DRIFT_ISLANDS_r05.json next to the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ISLAND_SETS = [
    "",                        # round-4 production: uniform bf16 (the defect)
    "mask_head",               # prediction heads only (cheapest candidate)
    "pixel_decoder",           # the reference's own island
    "mask_head,pixel_decoder",
    "decoder",                 # whole transformer decoder
]


def main() -> None:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 2

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_cfg
    from autofocusformermod_tpu.models import (
        maskformer_from_config,
        semantic_inference,
        upsample_masks,
    )
    from autofocusformermod_tpu.parallel.precision import amp_variables

    size = 512
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:size, 0:size]
    img = np.stack([
        127 + 80 * np.sin(xx / 23.0 + k) * np.cos(yy / 31.0 - 2 * k)
        + 25 * rng.standard_normal((size, size))
        for k in range(3)
    ], -1)
    x = jnp.asarray(np.clip(img, 0, 255)[None].repeat(batch, 0), jnp.float32)

    ckpt_path = os.environ.get(
        "SOAK_CKPT",
        os.path.join(os.path.dirname(__file__), "..", "soak_ckpt.npz"),
    )
    assert os.path.exists(ckpt_path), f"{ckpt_path} missing (tools/train_soak.py)"
    from flax import traverse_util

    loaded = np.load(ckpt_path)
    flat_p, flat_s = {}, {}
    for k in loaded.files:
        head, rest = k.split("/", 1)
        (flat_p if head == "params" else flat_s)[tuple(rest.split("/"))] = loaded[k]
    variables = {
        "params": traverse_util.unflatten_dict(flat_p),
        "batch_stats": traverse_util.unflatten_dict(flat_s),
    }

    def decisions(model, v, precision=None):
        @jax.jit
        def infer(v, x):
            out = model.apply(v, x, train=False)
            masks = upsample_masks(out["pred_masks"], (size, size))
            sem = jax.vmap(semantic_inference)(out["pred_logits"], masks)
            return (jnp.argmax(sem, axis=1).astype(jnp.int32),
                    (masks > 0).astype(jnp.uint8),
                    jnp.argmax(out["pred_logits"], -1).astype(jnp.int32))

        t0 = time.perf_counter()
        if precision is None:
            arg, thr, cls = infer(v, x)
        else:
            with jax.default_matmul_precision(precision):
                arg, thr, cls = infer(v, x)
        ret = (np.asarray(arg), np.asarray(thr), np.asarray(cls))
        # timed second call (compiled)
        t0 = time.perf_counter()
        if precision is None:
            r2 = infer(v, x)
        else:
            with jax.default_matmul_precision(precision):
                r2 = infer(v, x)
        jax.block_until_ready(r2)
        ms = (time.perf_counter() - t0) * 1e3
        return ret, ms

    # fp32-HIGHEST XLA reference (no pallas, no amp)
    from autofocusformermod_tpu.ops import dispatch

    saved = dispatch._PALLAS_ENV
    results = {"config": f"AFF-Mini 512x512 batch{batch}, soak ckpt"}
    try:
        dispatch._PALLAS_ENV = False
        cfg = _flagship_cfg()
        model_ref = maskformer_from_config(cfg)
        (ref_arg, ref_thr, ref_cls), ref_ms = decisions(
            model_ref, variables, precision="highest")
        results["ref_infer_ms"] = round(ref_ms, 1)

        dispatch._PALLAS_ENV = True
        for islands in ISLAND_SETS:
            os.environ["AFF_F32_ISLANDS"] = islands
            cfg2 = _flagship_cfg()
            cfg2.SOLVER.AMP.ENABLED = True
            model = maskformer_from_config(cfg2)
            v = jax.jit(lambda vv, _m=model: amp_variables(vv))(dict(variables))
            (a, t, c), ms = decisions(model, v)
            entry = {
                "sem_argmax_flip_rate": float((a != ref_arg).mean()),
                "mask_threshold_flip_rate": float((t != ref_thr).mean()),
                "query_class_flip_rate": float((c != ref_cls).mean()),
                "infer_ms": round(ms, 1),
            }
            results[f"islands[{islands or 'none'}]"] = entry
            print(json.dumps({islands or "none": entry}), flush=True)
    finally:
        dispatch._PALLAS_ENV = saved
        os.environ.pop("AFF_F32_ISLANDS", None)

    out = os.path.join(os.path.dirname(__file__), "..", "DRIFT_ISLANDS_r05.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
        f.write("\n")
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
