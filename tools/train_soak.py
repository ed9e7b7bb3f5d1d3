"""On-TPU training soak (VERDICT r2 item 9, r3 item 9): bf16 train steps on
one fixed synthetic batch (overfit), asserting finite, descending loss —
proves the Pallas backward kernels + AMP + JV matcher + AdamW integrate
beyond the ~13-step bench.  Writes the loss curve plus a periodic
synthetic-eval mIoU (semantic inference on the overfit batch vs its own blob
targets) to SOAK_<tag>.jsonl, and saves the final params/batch_stats to
soak_ckpt.npz so tools/measure_decision_drift.py can measure decision drift
at TRAINED weights (VERDICT r3 item 3).

Usage: python tools/train_soak.py [steps] [batch] [size]
Env:   SOAK_TAG=r05 (output suffix), SOAK_LR=3e-4, SOAK_CKPT=soak_ckpt.npz,
       SOAK_TOPK=capped|global (pin the uncertainty-ranking top-k scheme for
       the STRATIFIED_TOPK end-metric A/B, tools/ab_stratified_topk.py)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _blob_targets(rng, batch, t, size, nc):
    """Coherent blob masks + labels (overfittable, unlike iid noise masks).

    Ownership is EXCLUSIVE (VERDICT r4 item 5): overlapping circles made the
    r4 argmax GT map ill-posed — each query's mask was trained to its FULL
    circle (matched-mask BCE ~0) while the eval argmax assigned overlap
    pixels to one owner, capping synthetic_miou at ~0.47 on the very batch
    the losses had overfit.  Carving overlaps (each covered pixel belongs to
    the blob whose normalized center distance is smallest) makes mask
    targets disjoint, so near-zero mask loss and mIoU ~1 can coexist and the
    metric measures optimization, not construction ambiguity."""
    yy, xx = np.mgrid[0:size, 0:size]
    masks = np.zeros((batch, t, size, size), np.float32)
    labels = rng.integers(0, nc, (batch, t)).astype(np.int32)
    for b in range(batch):
        # normalized distance field per blob; <1 inside the circle
        nd = np.full((t, size, size), np.inf, np.float32)
        for k in range(t):
            cy, cx = rng.uniform(0.2, 0.8, 2) * size
            r = rng.uniform(0.08, 0.25) * size
            nd[k] = np.hypot(yy - cy, xx - cx) / r
        owner = nd.argmin(0)
        covered = nd.min(0) < 1.0
        for k in range(t):
            masks[b, k] = covered & (owner == k)
    return labels, masks


def main() -> None:
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    size = int(sys.argv[3]) if len(sys.argv) > 3 else 512

    import jax
    import jax.numpy as jnp

    # Reuse the persistent compile cache (same dir as tests/conftest.py):
    # the train step costs ~220s to compile cold, ~0 warm.
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR",
                       os.path.expanduser("~/.cache/jax-pytest")),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from __graft_entry__ import _flagship_cfg
    from autofocusformermod_tpu.engine.optimizer import build_optimizer
    from autofocusformermod_tpu.models import maskformer_from_config
    from autofocusformermod_tpu.parallel import TrainState, make_train_step

    topk_mode = os.environ.get("SOAK_TOPK", "")
    if topk_mode:
        # NB: losses/__init__ re-exports a *function* named point_sample
        # that shadows the submodule on attribute lookup — resolve the
        # module itself or the flag lands on the function object (no-op)
        import importlib

        _ps = importlib.import_module(
            "autofocusformermod_tpu.losses.point_sample"
        )
        _ps.STRATIFIED_TOPK = topk_mode == "capped"
        print(f"SOAK_TOPK={topk_mode}: STRATIFIED_TOPK="
              f"{_ps.STRATIFIED_TOPK}", flush=True)

    cfg = _flagship_cfg()
    cfg.SOLVER.AMP.ENABLED = True
    cfg.SOLVER.BASE_LR = float(os.environ.get("SOAK_LR", "3e-4"))

    model = maskformer_from_config(cfg)
    rng = np.random.default_rng(0)
    t = 8
    labels, masks = _blob_targets(
        rng, batch, t, size, cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES
    )
    data = {
        "image": jnp.asarray(
            rng.uniform(0, 255, (batch, size, size, 3)), jnp.float32
        ),
        "labels": jnp.asarray(labels),
        "masks": jnp.asarray(masks),
        "valid": jnp.ones((batch, t), bool),
    }
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), data["image"][:1], train=False)
    )()
    tx = build_optimizer(cfg, variables["params"])
    state = TrainState.create(
        variables["params"], variables.get("batch_stats", {}), tx
    )
    step_fn = make_train_step(
        model, cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES, num_points=12544,
        donate=False, amp=True,
    )

    tag = os.environ.get("SOAK_TAG", "r05")
    out_path = os.path.join(os.path.dirname(__file__), "..",
                            f"SOAK_{tag}.jsonl")

    # synthetic-eval mIoU on the overfit batch: semantic inference vs the
    # blob targets' argmax label map (VERDICT r3 item 9's eval curve)
    from autofocusformermod_tpu.models import semantic_inference

    gt_sem = np.full((batch, size, size), -1, np.int64)
    cover = masks.sum(1) > 0
    arg = masks.argmax(1)
    for b in range(batch):
        gt_sem[b][cover[b]] = labels[b][arg[b][cover[b]]]

    @jax.jit
    def eval_miou(params, batch_stats):
        out = model.apply(
            {"params": params, "batch_stats": batch_stats},
            data["image"], train=False,
        )
        pm = out["pred_masks"]
        h, w = pm.shape[-2:]
        sem = jax.vmap(semantic_inference)(out["pred_logits"], pm)
        return jnp.argmax(sem, axis=1)

    def miou(params, batch_stats):
        pred = np.asarray(eval_miou(params, batch_stats))
        # predictions are at mask-feature resolution; downsample gt
        sh = size // pred.shape[-1]
        gt = gt_sem[:, ::sh, ::sh][:, : pred.shape[1], : pred.shape[2]]
        nc = cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES
        ious = []
        for c in np.unique(gt[gt >= 0]):
            inter = ((pred == c) & (gt == c)).sum()
            union = (((pred == c) & (gt >= 0)) | (gt == c)).sum()
            if union:
                ious.append(inter / union)
        return float(np.mean(ious)) if ious else 0.0

    losses = []
    t0 = time.perf_counter()
    with open(out_path, "w") as f:
        for i in range(steps):
            state, metrics = step_fn(state, data, jax.random.PRNGKey(i))
            if i % 10 == 0 or i == steps - 1:
                rec = {
                    "step": i,
                    "total_loss": float(metrics["total_loss"]),
                    "loss_ce": float(metrics.get("loss_ce", 0.0)),
                    "loss_mask": float(metrics.get("loss_mask", 0.0)),
                    "loss_dice": float(metrics.get("loss_dice", 0.0)),
                    "elapsed_s": round(time.perf_counter() - t0, 1),
                }
                if i % 100 == 0 or i == steps - 1:
                    rec["synthetic_miou"] = round(
                        miou(state.params, state.batch_stats), 4)
                losses.append(rec["total_loss"])
                f.write(json.dumps(rec) + "\n")
                f.flush()
                print(rec, flush=True)
                assert np.isfinite(rec["total_loss"]), f"NaN at step {i}"

    # save trained weights for the drift tool (flat npz of fp32 arrays)
    ckpt_path = os.environ.get(
        "SOAK_CKPT",
        os.path.join(os.path.dirname(__file__), "..", "soak_ckpt.npz"),
    )
    from flax import traverse_util

    flat = {
        "params/" + "/".join(k): np.asarray(v, np.float32)
        for k, v in traverse_util.flatten_dict(state.params).items()
    }
    flat.update({
        "batch_stats/" + "/".join(k): np.asarray(v, np.float32)
        for k, v in traverse_util.flatten_dict(state.batch_stats).items()
    })
    # the overfit batch rides along so measure_decision_drift.py can report
    # the TASK-metric delta (synthetic mIoU fp32 vs production path) at
    # these weights — converting decision flips into mIoU currency
    flat["data/image"] = np.asarray(data["image"], np.float32)
    flat["data/labels"] = labels
    flat["data/masks"] = masks.astype(np.uint8)
    np.savez(ckpt_path, **flat)
    print(f"saved trained weights to {ckpt_path}")

    first = np.mean(losses[:3])
    last = np.mean(losses[-3:])
    print(f"soak done: first~{first:.3f} last~{last:.3f} "
          f"({steps} steps, {time.perf_counter() - t0:.0f}s)")
    assert last < 0.5 * first, (
        f"insufficient descent: {first:.3f} -> {last:.3f}"
    )


if __name__ == "__main__":
    main()
