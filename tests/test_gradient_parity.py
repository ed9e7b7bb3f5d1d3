"""GRADIENT-level parity against the REAL reference modules (VERDICT r3 #2).

Every other parity tier runs under torch.no_grad() — forward activations and
loss values only.  These tests compare d(total_loss)/dtheta per parameter
tensor between torch autograd through the reference modules (converted
weights, identical inputs, identical matcher assignments) and jax.grad
through this framework.  Grad-only risks covered that no forward test can
see:

- straight-through-estimator split masks (ref mixres_neighbour.py:713-733
  vs models/mixres.py:418-436) — dedicated STE test below
- detached importance probs in ClusterMerging (ref aff.py:308 vs
  models/aff.py:240)
- BatchNorm TRAIN-mode batch statistics (patch embed, ref aff.py:529) —
  the chain test runs both frameworks in train mode
- blank-token softmax backward (ref aff.py:139-147)

Gradient mapping: engine/convert_checkpoint.py applies only value-independent
linear re-layouts (transpose / reshape / slice / concat), so the SAME
converter maps torch gradient tensors into this framework's parameter tree —
d(loss)/d(P x) = P d(loss)/dx for any fixed permutation P.

Bound: forward parity through this chain is ~2e-3 relative (fp32, erf/softmax
implementation differences); one backward pass roughly doubles the depth, and
gradients accumulate over all queries/points, so per-tensor relative error is
bounded at 5e-2 of that tensor's gradient scale (floored at 1e-3 of the
global gradient scale so near-zero-gradient tensors don't amplify noise).
Wiring/semantic bugs are categorical: a wrong STE mask or an extra detach
zeroes or rescales whole tensors (observed >= 0.5 rel), far above the bound.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
import jax.numpy as jnp  # noqa: E402

from flax import traverse_util  # noqa: E402

from autofocusformermod_tpu.engine.convert_checkpoint import (  # noqa: E402
    convert_reference_state_dict,
)
from tests.reference_models import load_reference_losses  # noqa: E402
from tests.test_reference_parity import (  # noqa: E402
    DEPTHS,
    EMBED,
    HEADS,
    NBHD,
    _ref_modules,
)

NCLS, NQ, HIDDEN = 10, 20, 32
WEIGHTS = {"loss_ce": 2.0, "loss_mask": 5.0, "loss_dice": 5.0}


def _weighted_total(loss_dict):
    """Reference trainer semantics (maskformer_model.py:232-238): weight
    every term incl. deep-supervision _i suffixes by its base weight."""
    total = 0.0
    for k, v in loss_dict.items():
        base = k.rsplit("_", 1)[0] if k[-1].isdigit() else k
        total = total + WEIGHTS[base] * float(v)
    return total


def _synthetic_targets(rng, b, t, hw):
    """Well-separated blob targets: distinct labels + disjoint round masks so
    the LSAP optimum is unique w.h.p. and both frameworks match identically."""
    h, w = hw
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    labels = np.stack([rng.choice(NCLS, size=t, replace=False)
                       for _ in range(b)])
    centers_y = (np.arange(t) + 0.5) / t * h
    masks = np.zeros((b, t, h, w), np.float32)
    for i in range(b):
        for j in range(t):
            cy = centers_y[j] + rng.uniform(-4, 4)
            cx = w * (0.3 + 0.4 * rng.random())
            r2 = (min(h, w) / (2.5 * t)) ** 2
            masks[i, j] = ((yy - cy) ** 2 + (xx - cx) ** 2 < r2)
    return labels.astype(np.int64), masks


@pytest.mark.slow
def test_chain_gradient_parity_vs_reference():
    """d(total)/dtheta through AFF -> pixel decoder -> transformer decoder ->
    SetCriterionDownSample (deterministic criterion: no point-sampling RNG to
    coordinate) in TRAIN mode, torch autograd vs jax.grad, per tensor."""
    mods = _ref_modules()
    loss_mods = load_reference_losses()
    from detectron2.layers import ShapeSpec  # stubbed

    torch.manual_seed(0)
    ref_bb = mods["aff"].AFF(
        embed_dim=EMBED, depths=DEPTHS, num_heads=HEADS, nbhd_size=NBHD,
        mlp_ratio=2.0, drop_path_rate=0.0, drop_rate=0.0, attn_drop_rate=0.0,
    )
    ref_pd = mods["pixel_decoder"].MSDeformAttnPixelDecoder(
        input_shape={
            f"res{i + 2}": ShapeSpec(channels=EMBED[i], stride=4 * 2**i)
            for i in range(4)
        },
        transformer_dropout=0.0, transformer_nheads=4,
        transformer_dim_feedforward=1024, transformer_enc_layers=2,
        conv_dim=HIDDEN, mask_dim=HIDDEN, norm="",
        transformer_in_features=["res3", "res4", "res5"], common_stride=4,
        shepard_power=3.0, shepard_power_learnable=True,
    )
    ref_dec = mods["decoder"].MultiScaleMaskedTransformerDecoder(
        in_channels=HIDDEN, mask_classification=True, num_classes=NCLS,
        hidden_dim=HIDDEN, num_queries=NQ, nheads=4, dim_feedforward=64,
        dec_layers=6, pre_norm=False, mask_dim=HIDDEN,
        enforce_input_project=False,
    )
    # mask logits away from near-tied decision thresholds (see
    # test_end_to_end_maskformer_parity rationale) so the attention masks and
    # the LSAP assignment agree across frameworks
    with torch.no_grad():
        ref_dec.mask_embed.layers[-1].weight *= 3.0
    for m in (ref_bb, ref_pd, ref_dec):
        m.train()   # BN batch stats + any train-only paths: the grad risks

    from autofocusformermod_tpu.config import add_maskformer2_config, get_cfg
    from autofocusformermod_tpu.models import maskformer_from_config
    from autofocusformermod_tpu.losses.criterion import set_criterion_downsample
    from autofocusformermod_tpu.losses import matcher as my_matcher

    cfg = get_cfg()
    add_maskformer2_config(cfg)
    cfg.MODEL.PIXEL_MEAN = [0.0, 0.0, 0.0]
    cfg.MODEL.PIXEL_STD = [1.0, 1.0, 1.0]
    cfg.MODEL.AFF.EMBED_DIM = list(EMBED)
    cfg.MODEL.AFF.DEPTHS = list(DEPTHS)
    cfg.MODEL.AFF.NUM_HEADS = list(HEADS)
    cfg.MODEL.AFF.NBHD_SIZE = list(NBHD)
    cfg.MODEL.AFF.MLP_RATIO = 2.0
    cfg.MODEL.AFF.DROP_PATH_RATE = 0.0
    cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES = NCLS
    cfg.MODEL.SEM_SEG_HEAD.CONVS_DIM = HIDDEN
    cfg.MODEL.SEM_SEG_HEAD.MASK_DIM = HIDDEN
    cfg.MODEL.SEM_SEG_HEAD.TRANSFORMER_ENC_LAYERS = 2
    cfg.MODEL.MASK_FORMER.HIDDEN_DIM = HIDDEN
    cfg.MODEL.MASK_FORMER.NUM_OBJECT_QUERIES = NQ
    cfg.MODEL.MASK_FORMER.NHEADS = 4
    cfg.MODEL.MASK_FORMER.DIM_FEEDFORWARD = 64
    cfg.MODEL.MASK_FORMER.DEC_LAYERS = 7
    cfg.MODEL.MASK_FORMER.DROPOUT = 0.0
    mine = maskformer_from_config(cfg, use_pallas=False)

    rng = np.random.default_rng(3)
    x = rng.uniform(-1, 1, (1, 128, 128, 3)).astype(np.float32)
    labels_np, masks_np = _synthetic_targets(rng, b=1, t=3, hw=(128, 128))

    with jax.default_matmul_precision("highest"):
        variables = mine.init(jax.random.PRNGKey(0), jnp.asarray(x),
                              train=True)

    sd = {}
    sd.update({f"backbone.{k}": v.detach().numpy()
               for k, v in ref_bb.state_dict().items()})
    sd.update({f"sem_seg_head.pixel_decoder.{k}": v.detach().numpy()
               for k, v in ref_pd.state_dict().items()})
    sd.update({f"sem_seg_head.predictor.{k}": v.detach().numpy()
               for k, v in ref_dec.state_dict().items()})
    flat_p, flat_s = convert_reference_state_dict(sd)
    params = traverse_util.flatten_dict(variables["params"])
    unmapped = []
    for k in list(params.keys()):
        if k in flat_p:
            params[k] = jnp.asarray(flat_p[k])
        else:
            unmapped.append(k)
    assert len(unmapped) <= 2, f"converter missed: {unmapped}"
    stats = traverse_util.flatten_dict(variables.get("batch_stats", {}))
    for k in list(stats.keys()):
        if k in flat_s:
            stats[k] = jnp.asarray(flat_s[k])
    params_tree = traverse_util.unflatten_dict(params)
    stats_tree = traverse_util.unflatten_dict(stats)

    # ---- torch backward
    ten = torch.from_numpy(x).permute(0, 3, 1, 2)
    feats = ref_bb(ten)
    mf, mf_pos, _, msf, poss = ref_pd.forward_features(feats)
    r_out = ref_dec(msf, poss, mf, mf_pos)

    matcher = loss_mods["matcher_downsampled"].HungarianMatcherDownSample(
        cost_class=2.0, cost_mask=5.0, cost_dice=5.0, num_points=0,
    )
    criterion = loss_mods["criterion_downsampled"].SetCriterionDownSample(
        NCLS, matcher=matcher, weight_dict={},   # weights applied below
        eos_coef=0.1, losses=["labels", "masks"],
        num_points=0, oversample_ratio=3.0, importance_sample_ratio=0.75,
    )
    targets_t = [{"labels": torch.from_numpy(labels_np[0]),
                  "masks": torch.from_numpy(masks_np[0])}]
    ref_losses = criterion(r_out, targets_t)
    total_t = sum(
        WEIGHTS[k.rsplit("_", 1)[0] if k[-1].isdigit() else k] * v
        for k, v in ref_losses.items()
    )
    total_t.backward()
    grad_sd = {}
    for prefix, mod in (("backbone", ref_bb),
                        ("sem_seg_head.pixel_decoder", ref_pd),
                        ("sem_seg_head.predictor", ref_dec)):
        named_p = dict(mod.named_parameters())
        # state_dict keys (incl. BN buffers) so the converter's key schema is
        # satisfied; buffers map into `stats`, which this test ignores
        for name, t in mod.state_dict().items():
            p = named_p.get(name)
            if p is not None and p.grad is not None:
                grad_sd[f"{prefix}.{name}"] = p.grad.numpy()
            else:
                grad_sd[f"{prefix}.{name}"] = np.zeros_like(
                    t.detach().numpy())
    ref_grads, _ = convert_reference_state_dict(grad_sd)

    # ---- jax.grad
    my_matcher.set_matcher_backend("scipy")
    try:
        targets_j = {
            "labels": jnp.asarray(labels_np, jnp.int32),
            "masks": jnp.asarray(masks_np),
            "valid": jnp.ones(labels_np.shape, bool),
        }

        def loss_fn(p):
            out, _ = mine.apply(
                {"params": p, "batch_stats": stats_tree},
                jnp.asarray(x), train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(1)},
            )
            total, _ = set_criterion_downsample(
                jax.random.PRNGKey(0), out, targets_j, NCLS,
                eos_coef=0.1, class_weight=2.0, mask_weight=5.0,
                dice_weight=5.0,
            )
            return total

        with jax.default_matmul_precision("highest"):
            total_j, my_grads = jax.value_and_grad(loss_fn)(params_tree)
    finally:
        my_matcher.set_matcher_backend(None)

    # loss values agree => the LSAP assignments were identical
    assert abs(float(total_j) - float(total_t)) < 2e-3 * max(
        1.0, abs(float(total_t))
    ), f"total loss: torch {float(total_t):.6f} vs jax {float(total_j):.6f}"

    my_flat = traverse_util.flatten_dict(my_grads)
    gscale = max(float(np.abs(v).max()) for v in my_flat.values())
    errs = {}
    n_compared = 0
    for k, g_mine in my_flat.items():
        if k not in ref_grads:
            continue
        g_ref = np.asarray(ref_grads[k], np.float32)
        g_mine = np.asarray(g_mine, np.float32)
        assert g_ref.shape == g_mine.shape, (k, g_ref.shape, g_mine.shape)
        denom = float(np.abs(g_ref).max()) + 1e-3 * gscale
        errs[k] = float(np.abs(g_ref - g_mine).max()) / denom
        n_compared += 1
    assert n_compared >= len(my_flat) - 2, (
        f"only {n_compared}/{len(my_flat)} gradient tensors comparable"
    )
    worst = sorted(errs.items(), key=lambda kv: -kv[1])[:8]
    assert max(errs.values()) < 5e-2, (
        "gradient parity bound exceeded; worst tensors: "
        + ", ".join(f"{'/'.join(k)}={e:.3f}" for k, e in worst)
    )


@pytest.mark.slow
def test_mixres_ste_split_gradient_parity():
    """The straight-through-estimator token split: gradients w.r.t. BOTH the
    features and the importance scores must match the reference
    divide_tokens_to_split_and_keep + split_pos exactly
    (mixres_neighbour.py:713-782 vs models/mixres.py:418-455).

    The STE is pure grad plumbing — the forward multiplies by (hard mask +
    soft - soft.detach()) == hard mask — so only a gradient test can
    distinguish a correct port from feat * hard_mask."""
    import importlib

    loss_mods = load_reference_losses()  # installs stubs  # noqa: F841
    import sys
    import types

    # load the reference mixres_neighbour module standalone
    from tests.reference_models import _load, _install_stubs

    clusten = _install_stubs()
    for name in ["refmask", "refmask.modeling", "refmask.modeling.backbone",
                 "refmask.modeling.transformer_decoder"]:
        if name not in sys.modules:
            m = types.ModuleType(name)
            m.__path__ = []
            sys.modules[name] = m
    sys.modules["refmask.modeling.clusten"] = clusten
    if "refmask.modeling.backbone.point_utils" not in sys.modules:
        _load("mask2former/modeling/backbone/point_utils.py",
              "refmask.modeling.backbone.point_utils",
              "refmask.modeling.backbone")
    if "refmask.modeling.transformer_decoder.position_encoding" not in sys.modules:
        _load("mask2former/modeling/transformer_decoder/position_encoding.py",
              "refmask.modeling.transformer_decoder.position_encoding",
              "refmask.modeling.transformer_decoder")
    mr = _load("mask2former/modeling/backbone/mixres_neighbour.py",
               "refmask.modeling.backbone.mixres_neighbour",
               "refmask.modeling.backbone")

    b, n, c = 2, 24, 8
    n_scales, scale = 4, 1
    upscale_ratio = 0.25
    k_split = int(n * upscale_ratio)
    rng = np.random.default_rng(5)
    feat_np = rng.standard_normal((b, n, c)).astype(np.float32)
    # 3-D (scale, x, y) positions; scores distinct so top-k is unambiguous
    pos_np = np.concatenate(
        [np.full((b, n, 1), scale, np.float32),
         rng.integers(0, 32, (b, n, 2)).astype(np.float32)], axis=2)
    scores_np = rng.permutation(n * b).reshape(b, n).astype(np.float32) / (n * b)
    gA = rng.standard_normal((b, k_split, c)).astype(np.float32)
    gB = rng.standard_normal((b, n - k_split, c)).astype(np.float32)

    # ---- reference (unbound methods on a namespace carrying the attrs)
    from types import SimpleNamespace

    ns = SimpleNamespace(
        dynamic_up_ratios=False, training=True, upscale_ratio=upscale_ratio,
        dynamic_up_threshold=0.5, split_ratio=4, n_scales=n_scales,
        rel_pos_emb=torch.zeros(1, 1, 4, c), scale_emb=torch.zeros(1, 1, 1, c),
    )
    feat_t = torch.from_numpy(feat_np).requires_grad_(True)
    scores_t = torch.from_numpy(scores_np).requires_grad_(True)
    pos_t = torch.from_numpy(pos_np)
    tok_s, pos_s, tok_k, pos_k = (
        mr.MixResNeighbour.divide_tokens_to_split_and_keep(
            ns, feat_t, pos_t, scores_t)
    )
    child_pos_t = mr.MixResNeighbour.split_pos(ns, pos_s, scale)
    loss_t = (tok_s * torch.from_numpy(gA)).sum() \
        + (tok_k * torch.from_numpy(gB)).sum()
    loss_t.backward()

    # ---- mine
    from autofocusformermod_tpu.models.mixres import MixResNeighbour

    layer = MixResNeighbour(
        scale=scale, n_scales=n_scales, patch_sizes=(32, 16, 8, 4),
        min_patch_size=4, d_model=c, n_layers=1, n_heads=1,
        upscale_ratio=upscale_ratio,
    )

    def my_fn(feat, scores):
        ts, ps, tk, pk = layer._split_tokens(
            feat, jnp.asarray(pos_np), scores, k_split)
        return ((ts * jnp.asarray(gA)).sum() + (tk * jnp.asarray(gB)).sum(),
                (ts, ps, tk, pk))

    (loss_j, (ts, ps, tk, pk)), grads = jax.value_and_grad(
        my_fn, argnums=(0, 1), has_aux=True
    )(jnp.asarray(feat_np), jnp.asarray(scores_np))
    child_pos_j = layer._split_pos(ps)

    # forward identical (hard masks) ...
    np.testing.assert_allclose(np.asarray(ts), tok_s.detach().numpy(),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(tk), tok_k.detach().numpy(),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(child_pos_j),
                                  child_pos_t.numpy())
    assert abs(float(loss_j) - float(loss_t)) < 1e-4 * abs(float(loss_t))
    # ... and the STE gradients too
    np.testing.assert_allclose(np.asarray(grads[0]), feat_t.grad.numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(grads[1]), scores_t.grad.numpy(),
                               rtol=1e-5, atol=1e-6)
