"""Attribute the trained-weights decision drift to its mechanism
(VERDICT r4 item 1a, continued from tools/ablate_drift_islands.py).

The island ablation showed fp32 islands DOWNSTREAM of the backbone do not
reduce the 3.1-3.8% mask-threshold flip rate — so the flips originate in the
bf16 backbone.  The suspected mechanism is discrete: AFF's ClusterMerging
keeps the top-25% tokens by ``grid_prior + alpha * sigmoid(prob_net(feat))``
(models/aff.py ClusterMerging; reference aff.py:296-324), and bf16 feature
noise flips near-cutoff ranks, changing the kept token SET — after which
every downstream tensor differs discretely, regardless of downstream
precision.  The reference's fp16 autocast has the same property vs its own
fp32 path; it certifies AMP at the task-metric level only
(TEST.EXPECTED_RESULTS, reference train_net.py).

This tool proves/refutes that attribution at the soak checkpoint:

  1. kept-token-set drift per stage: compare res3/4/5 position sets between
     the fp32 reference and the production bf16 path (Jaccard; exact-set
     fraction per image)
  2. backbone-island control: bf16 everywhere EXCEPT the backbone — if
     selection flips are the source, mask flips collapse
  3. flip concentration: per-query flip rates, and flips restricted to
     "live" queries (max real-class softmax > 0.5 — the ones
     instance/panoptic inference can surface)

Usage: python tools/diagnose_drift_source.py [batch]   (needs the TPU)
Writes DRIFT_SOURCE_r05.json.
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

    ckpt_path = os.path.join(os.path.dirname(__file__), "..", "soak_ckpt.npz")
    assert os.path.exists(ckpt_path)
    from flax import traverse_util

    loaded = np.load(ckpt_path)
    flat_p, flat_s = {}, {}
    for k in loaded.files:
        head, rest = k.split("/", 1)
        if head == "params":
            flat_p[tuple(rest.split("/"))] = loaded[k]
        elif head == "batch_stats":
            flat_s[tuple(rest.split("/"))] = loaded[k]
    variables = {
        "params": traverse_util.unflatten_dict(flat_p),
        "batch_stats": traverse_util.unflatten_dict(flat_s),
    }

    def run(amp, pallas, precision, islands):
        saved = dispatch._PALLAS_ENV
        dispatch._PALLAS_ENV = pallas
        os.environ["AFF_F32_ISLANDS"] = islands
        try:
            cfg2 = _flagship_cfg()
            cfg2.SOLVER.AMP.ENABLED = amp
            model = maskformer_from_config(cfg2)
            v = dict(variables)
            if amp:
                v = jax.jit(lambda vv: amp_variables(vv))(v)

            @jax.jit
            def infer(v, x):
                out, inter = model.apply(
                    v, x, train=False, capture_intermediates=lambda m, name:
                    name == "__call__" and m.name == "backbone",
                )
                feats = inter["intermediates"]["backbone"]["__call__"][0]
                poss = {
                    k: feats[k] for k in
                    ("res3_pos", "res4_pos", "res5_pos")
                }
                masks = upsample_masks(out["pred_masks"], (size, size))
                sem = jax.vmap(semantic_inference)(out["pred_logits"], masks)
                cls_prob = jax.nn.softmax(out["pred_logits"], -1)
                return (jnp.argmax(sem, axis=1).astype(jnp.int32),
                        (masks > 0).astype(jnp.uint8),
                        cls_prob.astype(jnp.float32), poss)

            if precision is None:
                arg, thr, cls_prob, poss = infer(v, x)
            else:
                with jax.default_matmul_precision(precision):
                    arg, thr, cls_prob, poss = infer(v, x)
            return (np.asarray(arg), np.asarray(thr), np.asarray(cls_prob),
                    {k: np.asarray(p) for k, p in poss.items()})
        finally:
            dispatch._PALLAS_ENV = saved
            os.environ.pop("AFF_F32_ISLANDS", None)

    def pos_set_drift(pa, pb):
        """pa, pb: (b, n, 2) kept positions. Jaccard of (x, y) sets/image."""
        out = []
        for b in range(pa.shape[0]):
            sa = set(map(tuple, pa[b].astype(np.int64)))
            sb = set(map(tuple, pb[b].astype(np.int64)))
            out.append(len(sa & sb) / max(len(sa | sb), 1))
        return float(np.mean(out))

    ref = run(False, False, "highest", "")
    prod = run(True, True, None, "mask_head")
    bb = run(True, True, None, "backbone,mask_head")

    def analyze(tag, fast):
        arg_f, thr_f, cls_f, poss_f = fast
        arg_r, thr_r, cls_r, poss_r = ref
        flips = (thr_f != thr_r)
        per_query = flips.mean(axis=(0, 2, 3))          # (q,)
        order = np.argsort(per_query)[::-1]
        # live queries: max real-class prob > 0.5 in the REFERENCE run
        live = cls_r[..., :-1].max(-1) > 0.5            # (b, q)
        live_flips = flips[live.nonzero()[0], live.nonzero()[1]]
        res = {
            "sem_argmax_flip_rate": float((arg_f != arg_r).mean()),
            "mask_threshold_flip_rate": float(flips.mean()),
            "mask_flip_rate_live_queries": float(live_flips.mean())
            if live_flips.size else 0.0,
            "num_live_queries": int(live.sum()),
            "top5_query_flip_share": float(
                per_query[order[:5]].sum() / max(per_query.sum(), 1e-12)
            ),
            "kept_token_jaccard": {
                k: pos_set_drift(poss_f[k], poss_r[k])
                for k in ("res3_pos", "res4_pos", "res5_pos")
            },
        }
        print(tag, json.dumps(res, indent=1), flush=True)
        return res

    result = {
        "config": f"AFF-Mini 512x512 batch{batch}, soak ckpt",
        "production_mask_head_island": analyze("production", prod),
        "backbone_island_control": analyze("backbone_f32", bb),
    }
    out = os.path.join(os.path.dirname(__file__), "..",
                       "DRIFT_SOURCE_r05.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
        f.write("\n")


if __name__ == "__main__":
    main()
