"""Quantify the fast path's DECISION drift (VERDICT r2 item 6).

On a fixed synthetic eval batch, compare fp32-XLA inference against the
production bf16+Pallas path at the decision level:

  - semantic argmax class flips (fraction of pixels)
  - mask-threshold flips (pred_masks logit > 0, fraction of (query, pixel))
  - msdetrpc kernel specifically: flips with ONLY the kernel swapped

Precision budgets (2% relative on tensors) say nothing about how much of
the 0.3-mIoU budget the fast path spends; decisions are what metrics see.

Round 4 (VERDICT r3 item 3): the r3 artifact measured at RANDOM INIT, where
mask logits sit near zero and the 7.7% flip rate measured near-ties, not
meaningful decisions.  This version additionally

  - loads the soak-trained weights (tools/train_soak.py soak_ckpt.npz) when
    present and reports drift at BOTH random init and trained weights
  - reports the mask-logit margin distribution (|logit| percentiles and the
    fraction of near-threshold logits), so a flip rate can be read against
    how many decisions were coin-flips to begin with

Round 5 (VERDICT r4 item 1): the drift mechanism was localized by
tools/ablate_drift_islands.py + tools/diagnose_drift_source.py — the flips
are backbone token-SELECTION reordering, not logit arithmetic (see
parallel/precision.py DEFAULT_F32_ISLANDS).  This tool therefore adds a
"selection_pinned" tier at trained weights (production bf16 with only the
backbone fp32), which isolates genuine arithmetic drift, and — when the
soak checkpoint carries its overfit batch (data/* keys) — the TASK-metric
delta: synthetic mIoU of the fp32 reference vs the production path on that
batch, converting the decision budget into the 0.3-mIoU currency the north
star is written in (VERDICT r4 item 5).

Usage: python tools/measure_decision_drift.py [batch]  (needs the TPU)
Env:   DRIFT_TAG=r05, SOAK_CKPT=soak_ckpt.npz, AFF_F32_ISLANDS
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

    def run(variables, amp: bool, pallas: bool, precision: str = "default",
            want_logits: bool = False, islands: str = None):
        """precision='highest' forces true-fp32 matmuls: on TPU the default
        precision quantizes fp32 matmul operands to bf16, which would make
        the 'fp32 reference' nearly identical to the AMP path and understate
        the drift being measured.  ``islands`` overrides AFF_F32_ISLANDS for
        this run (None = leave the production default)."""
        saved = dispatch._PALLAS_ENV
        dispatch._PALLAS_ENV = pallas
        saved_env = os.environ.get("AFF_F32_ISLANDS")
        if islands is not None:
            os.environ["AFF_F32_ISLANDS"] = islands
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
                        jnp.argmax(out["pred_logits"], -1).astype(jnp.int32),
                        masks.astype(jnp.float32))

            if precision == "default":
                arg, thr, cls, logits = infer(v, x)
            else:
                with jax.default_matmul_precision(precision):
                    arg, thr, cls, logits = infer(v, x)
            ret = (np.asarray(arg), np.asarray(thr), np.asarray(cls))
            return ret + ((np.asarray(logits),) if want_logits else ())
        finally:
            dispatch._PALLAS_ENV = saved
            if islands is not None:
                if saved_env is None:
                    os.environ.pop("AFF_F32_ISLANDS", None)
                else:
                    os.environ["AFF_F32_ISLANDS"] = saved_env

    def flips(a, b):
        return float((a != b).mean())

    def _miou_delta(variables, data, _run):
        """Synthetic mIoU (vs the soak batch's exclusive blob targets) for
        the fp32 reference and the production path — the decision budget
        expressed in task-metric currency (VERDICT r4 item 5)."""
        img = jnp.asarray(data["image"])
        labels, masks = data["labels"], data["masks"]
        sz = img.shape[1]
        # exclusive-ownership GT semantic map (masks are disjoint)
        gt = np.full((img.shape[0], sz, sz), -1, np.int64)
        cover = masks.sum(1) > 0
        arg = masks.argmax(1)
        for b in range(img.shape[0]):
            gt[b][cover[b]] = labels[b][arg[b][cover[b]]]

        def sem_argmax(amp, pallas, precision):
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
                def infer(v, im):
                    out = model.apply(v, im, train=False)
                    m = upsample_masks(out["pred_masks"], (sz, sz))
                    sem = jax.vmap(semantic_inference)(out["pred_logits"], m)
                    return jnp.argmax(sem, axis=1).astype(jnp.int32)

                if precision is None:
                    return np.asarray(infer(v, img))
                with jax.default_matmul_precision(precision):
                    return np.asarray(infer(v, img))
            finally:
                dispatch._PALLAS_ENV = saved

        def miou(pred):
            ious = []
            for c in np.unique(gt[gt >= 0]):
                inter = ((pred == c) & (gt == c)).sum()
                union = (((pred == c) & (gt >= 0)) | (gt == c)).sum()
                if union:
                    ious.append(inter / union)
            return float(np.mean(ious)) if ious else 0.0

        ref = miou(sem_argmax(False, False, "highest"))
        fast = miou(sem_argmax(True, True, None))
        return {
            "synthetic_miou_fp32_ref": round(ref, 4),
            "synthetic_miou_production": round(fast, 4),
            "delta": round(fast - ref, 4),
        }

    def measure(variables, weights_tag, selection_tier=False):
        # fp32 XLA at true fp32 matmul precision, with mask logits for the
        # margin distribution
        ref_arg, ref_thr, ref_cls, ref_logits = run(
            variables, amp=False, pallas=False, precision="highest",
            want_logits=True)
        fast_arg, fast_thr, fast_cls = run(
            variables, amp=True, pallas=True)  # production
        # kernel substitution only (fp32 params, XLA side at true fp32)
        ker_arg, ker_thr, ker_cls = run(
            variables, amp=False, pallas=True, precision="highest")

        # margin distribution: how far mask logits sit from the 0 threshold.
        # bf16 has ~3 decimal digits; drift flips decisions only within a
        # band of ~1e-2 x activation scale around 0, so report the fraction
        # of logits inside bands plus percentiles of |logit|.
        a = np.abs(ref_logits)
        scale = float(np.percentile(a, 99))
        margins = {
            "abs_logit_p1": float(np.percentile(a, 1)),
            "abs_logit_p5": float(np.percentile(a, 5)),
            "abs_logit_p25": float(np.percentile(a, 25)),
            "abs_logit_median": float(np.median(a)),
            "p99_scale": scale,
            "frac_within_1pct_of_scale": float((a < 0.01 * scale).mean()),
            "frac_within_5pct_of_scale": float((a < 0.05 * scale).mean()),
        }
        out = {
            "weights": weights_tag,
            "mask_logit_margins": margins,
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
        if selection_tier:
            # the ARITHMETIC tier (VERDICT r4 item 1 / DRIFT_SOURCE_r05):
            # production bf16 everywhere except the backbone, which pins the
            # discrete token selection (ClusterMerging top-k) to the
            # reference's choice.  The production-vs-ref flips above are
            # dominated by SELECTION reordering (near-tied keep scores pick
            # a different, equally-scored token subset — kept-token Jaccard
            # in DRIFT_SOURCE_r05.json); with selection pinned, what remains
            # is genuine bf16 arithmetic drift, and THAT is what the
            # near-threshold-mass tie budget meaningfully bounds.
            pin_islands = "backbone," + ",".join(
                active_f32_islands()) if active_f32_islands() else "backbone"
            pin_arg, pin_thr, pin_cls = run(
                variables, amp=True, pallas=True, islands=pin_islands)
            out["selection_pinned_bf16_vs_fp32_xla"] = {
                "islands": pin_islands,
                "sem_argmax_flip_rate": flips(ref_arg, pin_arg),
                "mask_threshold_flip_rate": flips(ref_thr, pin_thr),
                "query_class_flip_rate": flips(ref_cls, pin_cls),
            }
        return out

    from autofocusformermod_tpu.parallel.precision import active_f32_islands

    result = {
        "config": f"AFF-Mini 512x512 batch{batch}, structured synthetic "
                  "image",
        "production_f32_islands": list(active_f32_islands()),
        "random_init": measure(variables, "random init"),
    }

    ckpt_path = os.environ.get(
        "SOAK_CKPT",
        os.path.join(os.path.dirname(__file__), "..", "soak_ckpt.npz"),
    )
    if os.path.exists(ckpt_path):
        from flax import traverse_util

        loaded = np.load(ckpt_path)
        flat_p, flat_s, data = {}, {}, {}
        for k in loaded.files:
            head, rest = k.split("/", 1)
            if head == "params":
                flat_p[tuple(rest.split("/"))] = loaded[k]
            elif head == "batch_stats":
                flat_s[tuple(rest.split("/"))] = loaded[k]
            elif head == "data":
                data[rest] = loaded[k]
        trained = {
            "params": traverse_util.unflatten_dict(flat_p),
            "batch_stats": traverse_util.unflatten_dict(flat_s),
        }
        result["soak_trained"] = measure(
            trained, f"soak ckpt {ckpt_path}", selection_tier=True)
        if data:
            result["soak_trained"]["task_metric_delta"] = _miou_delta(
                trained, data, run)
    else:
        result["soak_trained"] = {
            "error": f"{ckpt_path} absent - run tools/train_soak.py first"
        }

    print(json.dumps(result, indent=1))
    tag = os.environ.get("DRIFT_TAG", "r05")
    out = os.path.join(os.path.dirname(__file__), "..", f"DRIFT_{tag}.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
        f.write("\n")


if __name__ == "__main__":
    main()
