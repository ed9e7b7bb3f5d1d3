"""Quantify the fast path's DECISION drift (VERDICT r2 item 6).

On a fixed synthetic eval batch, compare fp32-XLA inference against the
production bf16+Pallas path at the decision level:

  - semantic argmax class flips (fraction of pixels)
  - mask-threshold flips (pred_masks logit > 0, fraction of (query, pixel))
  - msdetrpc kernel specifically: flips with ONLY the kernel swapped

Precision budgets (2% relative on tensors) say nothing about how much of
the 0.3-mIoU budget the fast path spends; decisions are what metrics see.

Usage: python tools/measure_decision_drift.py [batch]  (needs the TPU)
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


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
    from autofocusformermod_tpu.ops import dispatch

    size = 512
    rng = np.random.default_rng(0)
    # structured image (blobs + texture), not white noise
    yy, xx = np.mgrid[0:size, 0:size]
    img = np.stack([
        127 + 80 * np.sin(xx / 23.0 + k) * np.cos(yy / 31.0 - 2 * k)
        + 25 * rng.standard_normal((size, size))
        for k in range(3)
    ], -1)
    x = jnp.asarray(np.clip(img, 0, 255)[None].repeat(batch, 0), jnp.float32)

    cfg = _flagship_cfg()
    model_fp32 = maskformer_from_config(cfg)
    variables = jax.jit(
        lambda: model_fp32.init(jax.random.PRNGKey(0), x[:1], train=False)
    )()

    def run(amp: bool, pallas: bool, precision: str = "default"):
        """precision='highest' forces true-fp32 matmuls: on TPU the default
        precision quantizes fp32 matmul operands to bf16, which would make
        the 'fp32 reference' nearly identical to the AMP path and understate
        the drift being measured."""
        saved = dispatch._PALLAS_ENV
        dispatch._PALLAS_ENV = pallas
        try:
            cfg2 = _flagship_cfg()
            cfg2.SOLVER.AMP.ENABLED = amp
            model = maskformer_from_config(cfg2)
            v = dict(variables)
            if amp:
                from autofocusformermod_tpu.parallel.precision import (
                    amp_variables,
                )

                v = jax.jit(lambda vv: amp_variables(vv))(v)

            @jax.jit
            def infer(v, x):
                out = model.apply(v, x, train=False)
                masks = upsample_masks(out["pred_masks"], (size, size))
                sem = jax.vmap(semantic_inference)(out["pred_logits"], masks)
                return (jnp.argmax(sem, axis=1).astype(jnp.int32),
                        (masks > 0).astype(jnp.uint8),
                        jnp.argmax(out["pred_logits"], -1).astype(jnp.int32))

            if precision == "default":
                arg, thr, cls = infer(v, x)
            else:
                with jax.default_matmul_precision(precision):
                    arg, thr, cls = infer(v, x)
            return np.asarray(arg), np.asarray(thr), np.asarray(cls)
        finally:
            dispatch._PALLAS_ENV = saved

    # fp32 XLA at true fp32 matmul precision
    ref_arg, ref_thr, ref_cls = run(amp=False, pallas=False,
                                    precision="highest")
    fast_arg, fast_thr, fast_cls = run(amp=True, pallas=True)  # production
    # kernel substitution only (fp32 params, XLA side at true fp32)
    ker_arg, ker_thr, ker_cls = run(amp=False, pallas=True,
                                    precision="highest")

    def flips(a, b):
        return float((a != b).mean())

    result = {
        "config": f"AFF-Mini 512x512 batch{batch}, random init, structured "
                  "synthetic image",
        "bf16_pallas_vs_fp32_xla": {
            "sem_argmax_flip_rate": flips(ref_arg, fast_arg),
            "mask_threshold_flip_rate": flips(ref_thr, fast_thr),
            "query_class_flip_rate": flips(ref_cls, fast_cls),
        },
        "pallas_only_vs_fp32_xla": {
            "sem_argmax_flip_rate": flips(ref_arg, ker_arg),
            "mask_threshold_flip_rate": flips(ref_thr, ker_thr),
            "query_class_flip_rate": flips(ref_cls, ker_cls),
        },
    }
    print(json.dumps(result, indent=1))
    out = os.path.join(os.path.dirname(__file__), "..", "DRIFT_r03.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
        f.write("\n")


if __name__ == "__main__":
    main()
