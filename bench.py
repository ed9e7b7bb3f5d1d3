"""Benchmark: ADE20K 512x512 semantic-segmentation inference throughput
(images/sec/chip) for AFF-Mini + Mask2Former on the local accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
The reference publishes no throughput number (BASELINE.json "published": {}),
so vs_baseline is reported against the first recorded value of this bench
(1.0 when no prior record exists).

BENCH_FULL=1 additionally benchmarks AFF-Small inference (the north-star
config, README.md:55) and the AFF-Mini training step, and writes all
results — with achieved TFLOP/s derived from the reference's published
GFLOPs/img (BASELINE.md: Mini 48.3G, Small 87G) — to BENCH_DETAILS.json.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

GFLOPS_PER_IMG = {"aff_mini": 48.3, "aff_small": 87.0}


def _bench_infer(cfg, batch, iters, warmup, size=512):
    import jax
    import jax.numpy as jnp

    from autofocusformermod_tpu.models import (
        maskformer_from_config,
        semantic_inference,
        upsample_masks,
    )

    if os.environ.get("BENCH_AMP", "1") not in ("0", "false"):
        cfg.SOLVER.AMP.ENABLED = True
    model = maskformer_from_config(cfg)
    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 255, (batch, size, size, 3)),
        jnp.float32,
    )
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x[:1], train=False))()
    if cfg.SOLVER.AMP.ENABLED:
        from autofocusformermod_tpu.parallel.precision import amp_variables

        variables = jax.jit(lambda v: amp_variables(v))(dict(variables))

    @jax.jit
    def infer(variables, x, salt):
        out = model.apply(variables, x + salt, train=False)
        masks = upsample_masks(out["pred_masks"], (size, size))
        sem = jax.vmap(semantic_inference)(out["pred_logits"], masks)
        pred = jnp.argmax(sem, axis=1).astype(jnp.int32)
        return pred, jnp.mean(sem) * 1e-6

    def run(n):
        salt = jnp.zeros((), jnp.float32)
        for _ in range(n):
            _, salt = infer(variables, x, salt)
        return float(salt)

    run(warmup)
    t0 = time.perf_counter()
    run(iters)
    dt = time.perf_counter() - t0
    return batch * iters / dt


def _bench_maskfiner_infer(batch, iters, warmup, size=512):
    """4-stage MixRes cascade (configs/ade20k/semantic-segmentation/
    maskfiner/maskfiner_mini_bs32_80k.yaml) eval forward."""
    import jax
    import jax.numpy as jnp

    from autofocusformermod_tpu.config import add_maskformer2_config, get_cfg
    from autofocusformermod_tpu.models.registry import build_model

    cfg = get_cfg()
    add_maskformer2_config(cfg)
    cfg.merge_from_file(
        os.path.join(
            os.path.dirname(__file__),
            "configs/ade20k/semantic-segmentation/maskfiner/"
            "maskfiner_mini_bs32_80k.yaml",
        )
    )
    if os.environ.get("BENCH_AMP", "1") not in ("0", "false"):
        cfg.SOLVER.AMP.ENABLED = True
    model = build_model(cfg)
    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 255, (batch, size, size, 3)),
        jnp.float32,
    )
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), x[:1], train=False)
    )()
    if cfg.SOLVER.AMP.ENABLED:
        from autofocusformermod_tpu.parallel.precision import amp_variables

        variables = jax.jit(lambda v: amp_variables(v))(dict(variables))

    @jax.jit
    def infer(variables, x, salt):
        out = model.apply(variables, x + salt, train=False)
        return jnp.mean(out["pred_masks"].astype(jnp.float32)) * 1e-6

    def run(n):
        salt = jnp.zeros((), jnp.float32)
        for _ in range(n):
            salt = infer(variables, x, salt) * 0.0
        return float(salt)

    run(warmup)
    t0 = time.perf_counter()
    run(iters)
    dt = time.perf_counter() - t0
    return batch * iters / dt


def _bench_maskfiner_train(batch, iters, warmup, size=512):
    """MaskFiner cascade TRAIN step (4 backbones + 4 criteria + STE splits +
    backward + AdamW) — the reference's research configs' training cost
    (VERDICT r3 #8; ref maskfiner_model.py:213-227)."""
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
            os.path.dirname(__file__),
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

    def run(n, state):
        loss = None
        for i in range(n):
            state, metrics = step_fn(state, data, jax.random.PRNGKey(i))
            loss = metrics["total_loss"]
        float(loss)
        return state

    state = run(warmup, state)
    t0 = time.perf_counter()
    run(iters, state)
    dt = time.perf_counter() - t0
    return batch * iters / dt


def _bench_train_step(cfg, batch, iters, warmup, size=512):
    """One full training step (forward, matcher, criterion, grads, AdamW)."""
    import jax
    import jax.numpy as jnp

    if os.environ.get("BENCH_AMP", "1") not in ("0", "false"):
        cfg.SOLVER.AMP.ENABLED = True

    from autofocusformermod_tpu.engine.optimizer import build_optimizer
    from autofocusformermod_tpu.models import maskformer_from_config
    from autofocusformermod_tpu.parallel import TrainState, make_train_step

    model = maskformer_from_config(cfg)
    rng = np.random.default_rng(0)
    t = 8
    data = {
        "image": jnp.asarray(rng.uniform(0, 255, (batch, size, size, 3)), jnp.float32),
        "labels": jnp.asarray(
            rng.integers(0, cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES, (batch, t)), jnp.int32
        ),
        "masks": jnp.asarray(rng.integers(0, 2, (batch, t, size, size)), jnp.float32),
        "valid": jnp.ones((batch, t), bool),
    }
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), data["image"][:1], train=False)
    )()
    tx = build_optimizer(cfg, variables["params"])
    state = TrainState.create(variables["params"], variables.get("batch_stats", {}), tx)
    step_fn = make_train_step(
        model, cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES, num_points=12544, donate=False,
        amp=cfg.SOLVER.AMP.ENABLED,
    )

    def run(n, state):
        loss = None
        for i in range(n):
            state, metrics = step_fn(state, data, jax.random.PRNGKey(i))
            loss = metrics["total_loss"]
        float(loss)
        return state

    state = run(warmup, state)
    t0 = time.perf_counter()
    run(iters, state)
    dt = time.perf_counter() - t0
    return batch * iters / dt


# Measured per-component inference breakdown (r3, AFF-Mini 512x512 batch 4,
# bf16, real v5e chip; tools/profile_components.py + tools/profile_pixdec.py
# ablations + tools/bench_msdetrpc.py BENCH_LEVELS=1 BENCH_LOCAL=1).  The
# pixel decoder's msdetrpc kernel is the cost center and is at its
# formulation floor: EIGHT kernel designs tie or lose within ~10.4 ms at the
# 4096-query level (v2 batched one-hot, v3 wide bands, v4 bf16 bands, v5
# windowed, v6 block-diag packing 14.4, v7 sublane pairs 14.2, v9 masked+
# windowed 13.0/level-set, v10 bf16 13.6/level-set, v12 head-natural layout
# 290 ms in context) — per program the 128-query-unrolled batched W dot +
# 42 band dots bound it at ~10 us regardless of operand precision, band
# width, or layout.  The band dots use 32 of 128 output lanes (c_=32 head
# dim), so the MXU ceiling for this contraction shape is ~4x below peak by
# construction; the dense one-hot reformulation still beats the XLA
# row-gather composition ~9x in context (952 -> ~110 ms since r2).
PROFILE_R03 = {
    "config": "AFF-Mini 512x512 batch4 bf16, ms per forward",
    "backbone_plus_pixel_decoder": 128.0,
    "pixel_decoder_breakdown_post_v13": {
        "msdetrpc_in_context": 76.3,
        "msdetrpc_kernel_isolated_per_layer": 7.31,
        "msdetrpc_xla_glue_note": (
            "76.3 in-context - 44 isolated (6 layers) = ~32 ms of operand "
            "prep: attn folding, casts, and the v13 (bh,n,P)->(bh,P,n) / "
            "val banding minor-dim transposes"
        ),
        "packed_table_gathers": 29.4,
        "grid_4nn_knn": 7.9,
        "shepard_weights": 1.7,
        "dense_backbone_residual": 51.7,
    },
    "pre_v13_breakdown": {
        "full_model": 214.6,
        "backbone": 42.9,
        "pixel_decoder": 153.9,
        "transformer_decoder": 17.8,
        "msdetrpc_kernel": 110.0,
        "note": (
            "one-hot x MXU kernel era (FWD v8); v13 windowed lane-gather "
            "halved the kernel (14.0 -> 7.31 ms/layer) and lifted AFF-Mini "
            "18.86 -> 27.39 im/s"
        ),
    },
}


# r4 op-level device profile (tools/trace_ops.py — per-HLO-instruction
# events from jax.profiler on the real chip; AFF-Mini 512x512 batch 4 bf16).
# This is the VERDICT-r3 #1 artifact: the full train step attributed
# including the backward, from instruction timings rather than program
# differencing.  Leads it produced this round: Pallas JV matcher solve
# (94 -> 0.2 ms), stratified ranking top-k (kills the 24.8 ms sort),
# two-tier backward windows (bwd kernel 21.8 -> 18.9 ms/layer isolated).
PROFILE_R04 = {
    "train_step_ms_total": 641.2,
    "train_step_breakdown_ms": {
        "msdetrpc_bwd_kernels": 117.8,
        "msdetrpc_fwd_kernels": 24.6,
        "backbone_attention_kernels_fwd_bwd": 83.3,
        "criterion": {
            "target_point_sample_kernel": 43.4,
            "uncertainty_topk_sort_pre_fix": 24.8,
            "pred_point_sample_kernel": 22.4,
            "pred_mask_layout_transpose_in_bwd": 21.5,
            "matcher_target_gathers_batched": 16.0,
            "matcher_pred_gathers": 21.3,
            "lsap_pallas": 0.2,
        },
        "packed_table_gather_complex": 53.0,
        "pixel_decoder_table_knn": 8.1,
        "rest_dense_fusions_copies_optimizer": "remainder",
    },
    "value_and_grad_ms": {
        "total": 487.9,
        "backbone_fwd_bwd": 149.3,
        "pixel_decoder_fwd_bwd": 313.3,
        "mask_decoder_fwd_bwd": 25.3,
    },
    "forward_ms": {
        "total": 142.3,
        "msdetrpc_kernels": 24.7,
        "packed_table_gathers_plus_layout": 30.0,
        "backbone_attention_kernels": 20.6,
        "table_knn": 8.7,
        "sfc_sort_gathers": 12.0,
    },
    "note": (
        "stage-1 backbone attention (n=16384, h=2, c_=16) is 55 of the 83 "
        "ms attention total: block-sparse visit bounds average 11 col-"
        "blocks/row-block vs 7.9 distinct (SFC discontinuities widen the "
        "contiguous range) and the dots ran bf16x6 (Precision.HIGHEST). "
        "Precision.HIGH (bf16x3) was REJECTED by Mosaic at compile time — "
        "the shipped default remains HIGHEST, with single-pass DEFAULT "
        "reachable via AFF_ATTN_PREC=default as the drift-budgeted A/B "
        "(local_attn.py).  Next leads: exact visit "
        "lists for the trace-time-constant stage-1 clustering, the 21.5 ms "
        "pred-mask relayout in the criterion backward, and the msdetrpc "
        "backward's VPU select+reduce scatter (Mosaic rejects narrowing it "
        "to bf16)."
    ),
}


# Round-5 shipped-step attribution (tools/trace_ops.py fwd/train on the real
# chip, per-HLO device events aggregated by source line; AFF-Mini 512x512
# batch 4 bf16).  VERDICT-r4 #8: this is the breakdown of the SHIPPED step —
# forward traced after the r5 gather/KNN fixes, train traced at the same
# commits (the matcher-gather and Shepard-pow items it exposed were then
# fixed; their entries carry before -> after).
PROFILE_R05 = {
    "forward_ms": {
        "total_device": 122.0,
        "row_gathers_take_rows": 26.3,
        "msdetrpc_fwd_kernels": 24.8,
        "backbone_attention_kernels": 19.9,
        "table_knn_kernels_pre_fix": 9.3,
        "table_knn_kernels_post_proximity_order": "~4 (train-trace: 3.9)",
        "sampling_prep_layout_glue": 16.0,
        "dense_matmuls": 4.9,
        "removed_this_round": {
            "learned_prob_width1_gather": 7.9,
            "point2img_lane_gathers_plus_lut_lookups": 7.4,
        },
    },
    "train_step_ms": {
        "total_device": 581.0,
        "wall_step_ms_batch4": 591.0,
        "msdetrpc_fwd_plus_bwd_kernels": 170.1,
        "backbone_attention_fwd_plus_bwd": 85.0,
        "point_sampling_total": {
            "target_supervision_kernel_fwd": 43.4,
            "pred_supervision_kernel_fwd": 22.4,
            "pred_supervision_kernel_bwd": 21.5,
            "matcher_target_taps_batched_gather_pre_fix": 18.5,
            "matcher_taps_post_flat_batch": "~4.5",
            "ranking_stratified_topk_sort": 3.8,
        },
        "shepard_weight_fusions_pre_int_pow": 31.0,
        "row_gathers": 37.5,
        "pixel_decoder_sampling_prep_glue": 35.0,
        "cluster_wf_gathers": 18.8,
        "dense_matmuls": 16.6,
        "table_knn": 3.9,
    },
    "note": (
        "r5 forward wins: fold the ClusterMerging importance score into the "
        "features (kills the 6.3 ms width-1 gather), raster-order mask "
        "features (point2img becomes reshape, window-KNN LUT lookups "
        "vanish), proximity-ordered early-exit KNN (3.45 -> ~1.1 ms per "
        "16384x4096 table).  28.2 -> 31.9 im/s.  The msdetrpc backward "
        "remains the top train item at its proven VPU floor "
        "(tools/roofline_msdetrpc_bwd.py: measured 18.9 ms/layer inside "
        "the [8.6, 17.8] analytic band); the next unproven train items are "
        "the 43.4 ms target-supervision one-hot sampling kernel (MXU-bound "
        "at 5.3 TFLOP; a y-sorted windowed one-hot would cut the y side "
        "~4x but the oh_x VPU build is ~half the cost and does not window) "
        "and the ~35 ms of sampling-prep layout glue."
    ),
}


def _full_details(primary_ips, batch, iters, warmup):
    import jax

    from __graft_entry__ import _flagship_cfg

    details = {
        "device": str(jax.devices()[0]),
        "profile_r03": PROFILE_R03,
        "profile_r04": PROFILE_R04,
        "profile_r05": PROFILE_R05,
        "aff_mini_infer_512": {
            "images_per_sec_chip": round(primary_ips, 3),
            "achieved_tflops": round(primary_ips * GFLOPS_PER_IMG["aff_mini"] / 1e3, 3),
        },
    }

    path = os.path.join(os.path.dirname(__file__), "BENCH_DETAILS.json")

    def flush():
        with open(path, "w") as f:
            json.dump(details, f, indent=1)
            f.write("\n")

    flush()
    try:
        small = _flagship_cfg()
        small.MODEL.AFF.EMBED_DIM = [96, 192, 384, 768]
        small.MODEL.AFF.DEPTHS = [3, 4, 18, 2]
        small.MODEL.AFF.NUM_HEADS = [3, 6, 12, 24]
        small.MODEL.AFF.MLP_RATIO = 3.0
        small.MODEL.AFF.LAYER_SCALE = 1e-5
        ips_small = _bench_infer(small, batch, max(iters // 2, 3), warmup)
        details["aff_small_infer_512"] = {
            "images_per_sec_chip": round(ips_small, 3),
            "achieved_tflops": round(ips_small * GFLOPS_PER_IMG["aff_small"] / 1e3, 3),
        }
    except Exception as e:  # record instead of killing the primary metric
        details["aff_small_infer_512"] = {"error": str(e)[:200]}
    flush()
    try:
        # MaskFiner cascade (4-stage MixRes) inference — previously
        # unmeasured (VERDICT r2 item 3)
        ips_mf = _bench_maskfiner_infer(batch, max(iters // 2, 3), warmup)
        details["maskfiner_mini_infer_512"] = {
            "images_per_sec_chip": round(ips_mf, 3),
        }
    except Exception as e:
        details["maskfiner_mini_infer_512"] = {"error": str(e)[:200]}
    flush()
    try:
        # batch 8 is the best measured train operating point (5.70 vs 5.29
        # im/s at batch 4 with the windowed backward kernel; batch 16 OOMs
        # HBM by ~270M of 15.75G — remat would fit it but b8->b16 gains
        # were already marginal)
        train_ips = _bench_train_step(_flagship_cfg(), 8,
                                      max(iters // 2, 3), warmup)
        details["aff_mini_train_512"] = {"images_per_sec_chip": round(train_ips, 3)}
    except Exception as e:
        details["aff_mini_train_512"] = {"error": str(e)[:200]}
    flush()
    try:
        # MaskFiner cascade TRAIN throughput (VERDICT r3 #8)
        mf_train_ips = _bench_maskfiner_train(4, max(iters // 2, 3), warmup)
        details["maskfiner_mini_train_512"] = {
            "images_per_sec_chip": round(mf_train_ips, 3)
        }
    except Exception as e:
        details["maskfiner_mini_train_512"] = {"error": str(e)[:200]}
    flush()
    return details


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
    # bf16 inference by default (BENCH_AMP=0 for the fp32 path): fp32 params
    # cast once up front, compute path bf16, losses/inference fp32 — the
    # parity budget is pinned by tests/test_amp.py
    amp = os.environ.get("BENCH_AMP", "1") not in ("0", "false")
    if amp:
        cfg.SOLVER.AMP.ENABLED = True
    model = maskformer_from_config(cfg)
    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 255, (batch, 512, 512, 3)), jnp.float32
    )
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x[:1], train=False))()
    if amp:
        from autofocusformermod_tpu.parallel.precision import amp_variables

        variables = jax.jit(lambda v: amp_variables(v))(dict(variables))

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

    if os.environ.get("BENCH_FULL"):
        _full_details(ips, batch, iters, warmup)

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
