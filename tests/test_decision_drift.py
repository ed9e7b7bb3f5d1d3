"""Decision-level drift budget for the fast path (VERDICT r2 item 6).

Tensor budgets (tests/test_amp.py, tests/test_msdetrpc_pallas.py) bound
elementwise error, but metrics only see *decisions*: the semantic argmax
class per pixel, the mask logit > 0 threshold, and the per-query argmax
class.  These tests bound the flip rate between the fp32 reference path and
the production fast path so we know how much of the 0.3-mIoU budget
(SURVEY.md north star) the fast path can possibly spend.

Two tiers:
  - CPU (always runs): fp32 vs bf16-AMP on the tiny model.  Pallas kernels
    don't dispatch on CPU, so this isolates the AMP contribution.
  - TPU (skipped elsewhere): the real-chip flagship measurement lives in
    tools/measure_decision_drift.py; its committed artifact is
    DRIFT_r03.json.

Reference analogue: the reference certifies its fp16 autocast at the task
metric level only (TEST.EXPECTED_RESULTS, reference train_net.py); decision
flips are the tightest proxy available without datasets.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from test_maskformer import tiny_cfg

from autofocusformermod_tpu.models import (
    maskformer_from_config,
    semantic_inference,
    upsample_masks,
)
from autofocusformermod_tpu.parallel.precision import amp_variables


def _structured_image(size, batch=2, seed=0):
    """Blobs + texture, not white noise — decisions on pure noise are
    uniformly near-tied and overstate flip rates."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:size, 0:size]
    img = np.stack(
        [
            127
            + 80 * np.sin(xx / 13.0 + k) * np.cos(yy / 17.0 - 2 * k)
            + 25 * rng.standard_normal((size, size))
            for k in range(3)
        ],
        -1,
    )
    return jnp.asarray(
        np.clip(img, 0, 255)[None].repeat(batch, 0), jnp.float32
    )


def _decisions(model, variables, x, size):
    @jax.jit
    def f(v, x):
        out = model.apply(v, x, train=False)
        masks = upsample_masks(out["pred_masks"], (size, size))
        sem = jax.vmap(semantic_inference)(out["pred_logits"], masks)
        return (
            jnp.argmax(sem, axis=1),
            masks > 0,
            jnp.argmax(out["pred_logits"], -1),
        )

    a, b, c = f(variables, x)
    return np.asarray(a), np.asarray(b), np.asarray(c)


def test_amp_decision_flips_bounded():
    """bf16 AMP vs fp32 on identical weights: the metric-visible decisions
    (per-pixel semantic argmax, mask logit threshold) must stay far inside
    the 0.1%-of-pixels tightening threshold (VERDICT r2 item 6).

    Per-query class argmax is reported but NOT bounded here: at random init
    the AFF top-k token selection flips under bf16 roundoff and downstream
    query features diverge O(1) (the chance-dominated regime documented in
    test_amp.py::test_outputs_fp32_within_budget) — measured 0.8 flip rate
    on true-fp32 CPU, while the pixel decisions those queries vote into
    stay stable (sem argmax 0.0, mask threshold 4.9e-5) because semantic
    inference marginalizes over queries."""
    size = 64
    cfg = tiny_cfg()
    model32 = maskformer_from_config(cfg)
    cfg16 = cfg.clone()
    cfg16.SOLVER.AMP.ENABLED = True
    model16 = maskformer_from_config(cfg16)

    x = _structured_image(size)
    variables = jax.jit(
        lambda: model32.init(jax.random.PRNGKey(0), x, train=False)
    )()

    sem32, thr32, cls32 = _decisions(model32, variables, x, size)
    sem16, thr16, cls16 = _decisions(
        model16, amp_variables(dict(variables)), x, size
    )

    sem_flips = float((sem32 != sem16).mean())
    thr_flips = float((thr32 != thr16).mean())
    cls_flips = float((cls32 != cls16).mean())

    print(f"amp flips: sem {sem_flips:.2e} thr {thr_flips:.2e} "
          f"cls {cls_flips:.2e} (cls chance-dominated at random init)")
    assert sem_flips < 1e-3, f"semantic argmax flip rate {sem_flips:.2e}"
    assert thr_flips < 2e-3, f"mask threshold flip rate {thr_flips:.2e}"


@pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="Pallas decisions need the TPU"
)
def test_pallas_decision_flips_bounded():
    """Pallas kernels (fp32 params, no AMP) vs the XLA reference path on
    the tiny model: the kernel substitutions alone must not move decisions
    by more than the AMP tier's budget."""
    from autofocusformermod_tpu.ops import dispatch

    size = 64
    cfg = tiny_cfg()
    model = maskformer_from_config(cfg)
    x = _structured_image(size)
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), x, train=False)
    )()

    saved = dispatch._PALLAS_ENV
    try:
        dispatch._PALLAS_ENV = False
        sem_x, thr_x, cls_x = _decisions(model, variables, x, size)
        dispatch._PALLAS_ENV = True
        sem_p, thr_p, cls_p = _decisions(model, variables, x, size)
    finally:
        dispatch._PALLAS_ENV = saved

    assert float((sem_x != sem_p).mean()) < 1e-3
    assert float((thr_x != thr_p).mean()) < 2e-3
    # per-query class argmax: chance-dominated at random init (see above)


if __name__ == "__main__":
    pytest.main([__file__, "-v"])


def test_flagship_drift_artifact_within_budget():
    """Pin the committed flagship-scale drift artifact (VERDICT r3 item 3,
    r4 item 1): tools/measure_decision_drift.py measures the production
    path's decision flips vs the fp32-HIGHEST XLA reference on the real chip
    at BOTH random init and soak-trained weights and commits DRIFT_r05.json.

    History: r3 flagged a 7.7% mask-threshold flip rate at random init
    (near-tied logits); r4 measured 3.14% at TRAINED weights under uniform
    bf16 and correctly went red — the flips exceeded the near-threshold
    mass, so they could not be coin-flip ties.  r5 localized the mechanism
    (DRIFT_ISLANDS_r05.json + DRIFT_SOURCE_r05.json): fp32 islands
    DOWNSTREAM of the backbone leave the rate unchanged (~3.8%), because
    the flips are NOT logit arithmetic at all — bf16 noise reorders the
    near-tied keep scores in the backbone's ClusterMerging top-k, selecting
    a different (equally-scored) token subset (kept-token Jaccard at res5:
    0.47), after which every downstream tensor differs discretely.  Pinning
    the selection (backbone fp32, everything else production bf16)
    collapses mask flips to ~1.3e-3.  The reference's fp16-autocast
    backbone has the same selection property vs its own fp32 path; it
    certifies AMP at the task-metric level only (TEST.EXPECTED_RESULTS,
    reference train_net.py).

    The revised budget therefore bounds each mechanism in the currency
    where it is meaningful:

      - semantic argmax flips  < 1e-3  (drives mIoU/PQ stuff segments)
      - query class flips       < 5e-2 (topk scores, rescored downstream)
      - ARITHMETIC tier (selection_pinned, backbone-f32 control):
        mask-threshold flips < 1e-2 AND bounded by the near-threshold mass
        (genuine roundoff can only flip coin-flip ties)
      - SELECTION tier (production): mask flips < 5e-2 sanity ceiling, and
        the task-metric delta — synthetic mIoU production vs fp32 on the
        soak batch — must be within 0.3 (the north-star currency,
        SURVEY.md §6), which is the bound the selection reordering has to
        honor since its flips are *by construction* not tie-explainable
      - Pallas kernels alone: decision-clean (< 1e-3)
    """
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "DRIFT_r05.json")
    if not os.path.exists(path):
        pytest.skip("DRIFT_r05.json not yet committed (TPU artifact)")
    with open(path) as f:
        drift = json.load(f)
    trained = drift.get("soak_trained", {})
    if "error" in trained or "bf16_pallas_vs_fp32_xla" not in trained:
        pytest.fail(f"artifact lacks trained-weights tier: {trained}")
    fast = trained["bf16_pallas_vs_fp32_xla"]
    margins = trained["mask_logit_margins"]
    assert fast["sem_argmax_flip_rate"] < 1e-3, fast
    assert fast["query_class_flip_rate"] < 5e-2, fast
    assert fast["mask_threshold_flip_rate"] < 5e-2, fast

    pinned = trained["selection_pinned_bf16_vs_fp32_xla"]
    assert pinned["mask_threshold_flip_rate"] < 1e-2, pinned
    assert (pinned["mask_threshold_flip_rate"]
            <= margins["frac_within_5pct_of_scale"] + 1e-4), (
        "arithmetic-tier flips exceed the near-threshold mass - not "
        "explainable as coin-flip ties", pinned, margins)

    delta = trained["task_metric_delta"]
    assert abs(delta["delta"]) < 0.3, delta

    # kernels alone (no AMP) must be decision-clean at trained weights too
    ker = trained["pallas_only_vs_fp32_xla"]
    assert ker["mask_threshold_flip_rate"] < 1e-3, ker
