"""Pipeline-level eval parity vs the REAL reference MaskFormer meta-arch.

Module-level parity (tensors fed straight into backbone/decoders) cannot see
resize / padding / postprocess convention bugs.  Here the real reference
meta-arch (maskformer_model.py:168-261: normalize -> ImageList pad ->
forward -> interpolate -> sem_seg_postprocess -> semantic/panoptic/instance
inference) runs end-to-end on synthetic images with converted weights, and
the SAME images go through this framework's eval pipeline; the FINAL METRICS
(mIoU / PQ / AP via this framework's evaluators on both sides) must agree.
This is the last verifiable tier toward "mIoU within 0.3" without real
datasets (VERDICT r2 item 2).
"""

from types import SimpleNamespace

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
import jax.numpy as jnp  # noqa: E402

from flax import traverse_util  # noqa: E402

from autofocusformermod_tpu.engine.convert_checkpoint import (  # noqa: E402
    convert_reference_state_dict,
)
from tests.reference_models import load_reference_meta_arch  # noqa: E402
from tests.test_reference_parity import (  # noqa: E402
    DEPTHS,
    EMBED,
    HEADS,
    NBHD,
    _ref_modules,
)

NCLS, NQ, HIDDEN = 10, 20, 32
THING_IDS = {0, 1, 2, 3, 4}          # classes 0-4 things, 5-9 stuff
PIXEL_MEAN = [123.675, 116.28, 103.53]
PIXEL_STD = [58.395, 57.12, 57.375]
OBJ_THRESH, OVL_THRESH = 0.10, 0.6
TOPK = 15


@pytest.fixture(scope="module")
def pair():
    """(reference MaskFormer meta-arch, my model, converted variables, cfg)."""
    mods = _ref_modules()
    ma = load_reference_meta_arch()
    import torch.nn as nn
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
    # push mask logits away from the 0/0.5 decision thresholds so fp drift
    # does not flip inference decisions (see test_end_to_end rationale)
    with torch.no_grad():
        ref_dec.mask_embed.layers[-1].weight *= 3.0

    class RefHead(nn.Module):
        """MaskFormerHead.layers wiring (mask_former_head.py:114-128)."""
        def __init__(self):
            super().__init__()
            self.pixel_decoder = ref_pd
            self.predictor = ref_dec
            self.num_classes = NCLS

        def forward(self, features):
            mf, mf_pos, _, msf, poss = self.pixel_decoder.forward_features(
                features)
            return self.predictor(msf, poss, mf, mf_pos)

    metadata = SimpleNamespace(
        thing_dataset_id_to_contiguous_id={i: i for i in sorted(THING_IDS)}
    )
    ref_model = ma.MaskFormer(
        backbone=ref_bb, sem_seg_head=RefHead(), criterion=None,
        num_queries=NQ, object_mask_threshold=OBJ_THRESH,
        overlap_threshold=OVL_THRESH, metadata=metadata, size_divisibility=32,
        sem_seg_postprocess_before_inference=True,
        pixel_mean=PIXEL_MEAN, pixel_std=PIXEL_STD,
        semantic_on=True, panoptic_on=True, instance_on=True,
        test_topk_per_image=TOPK,
    ).eval()

    from autofocusformermod_tpu.config import add_maskformer2_config, get_cfg
    from autofocusformermod_tpu.models import maskformer_from_config

    cfg = get_cfg()
    add_maskformer2_config(cfg)
    cfg.MODEL.PIXEL_MEAN = list(PIXEL_MEAN)
    cfg.MODEL.PIXEL_STD = list(PIXEL_STD)
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
    cfg.MODEL.MASK_FORMER.SIZE_DIVISIBILITY = 32
    cfg.MODEL.MASK_FORMER.TEST.OBJECT_MASK_THRESHOLD = OBJ_THRESH
    cfg.MODEL.MASK_FORMER.TEST.OVERLAP_THRESHOLD = OVL_THRESH
    mine = maskformer_from_config(cfg, use_pallas=False)

    x0 = np.zeros((1, 128, 160, 3), np.float32)
    with jax.default_matmul_precision("highest"):
        variables = mine.init(jax.random.PRNGKey(0), jnp.asarray(x0),
                              train=False)

    sd = {}
    sd.update({f"backbone.{k}": v.detach().numpy()
               for k, v in ref_bb.state_dict().items()})
    sd.update({f"sem_seg_head.pixel_decoder.{k}": v.detach().numpy()
               for k, v in ref_pd.state_dict().items()})
    sd.update({f"sem_seg_head.predictor.{k}": v.detach().numpy()
               for k, v in ref_dec.state_dict().items()})
    flat_p, flat_s = convert_reference_state_dict(sd)
    params = traverse_util.flatten_dict(variables["params"])
    for k in list(params.keys()):
        if k in flat_p:
            params[k] = jnp.asarray(flat_p[k])
    stats = traverse_util.flatten_dict(variables["batch_stats"])
    for k in list(stats.keys()):
        if k in flat_s:
            stats[k] = jnp.asarray(flat_s[k])
    variables = {
        "params": traverse_util.unflatten_dict(params),
        "batch_stats": traverse_util.unflatten_dict(stats),
    }
    return ref_model, mine, variables, cfg


def _synthetic_images():
    """(mapped_image uint8 (h, w, 3), original (height, width)) pairs of
    DIFFERENT non-divisible sizes, so padding + postprocess resize are real."""
    rng = np.random.default_rng(42)
    out = []
    # padded sizes (128, 160) / (160, 128): stage-3 token counts stay above
    # nbhd_size=48 so every AFF stage runs the real clustered-attention path
    for (h, w), (H0, W0) in [((98, 146), (147, 219)), ((150, 102), (225, 153))]:
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.stack([
            (127 + 90 * np.sin(xx / 9.0 + k) * np.cos(yy / 13.0 - k)
             + 20 * rng.standard_normal((h, w)))
            for k in range(3)
        ], axis=-1)
        out.append((np.clip(img, 0, 255).astype(np.uint8), (H0, W0)))
    return out


def _synthetic_gt(hw, seed):
    """Voronoi label map over NCLS classes + a 255 ignore stripe."""
    rng = np.random.default_rng(seed)
    h, w = hw
    seeds = rng.uniform(0, 1, (NCLS, 2)) * [h, w]
    yy, xx = np.mgrid[0:h, 0:w]
    d = (yy[None] - seeds[:, 0, None, None]) ** 2 \
        + (xx[None] - seeds[:, 1, None, None]) ** 2
    gt = np.argmin(d, axis=0).astype(np.int64)
    gt[: h // 10] = 255
    return gt


def _my_pipeline(mine, variables, cfg, img, out_hw):
    """This framework's engine eval path on one image: pad to divisibility
    (mean-valued, engine/train.py Trainer._pad_eval_image) -> jit forward ->
    upsample mask logits -> crop -> postprocess -> inferences."""
    from autofocusformermod_tpu.engine.train import Trainer
    from autofocusformermod_tpu.models import upsample_masks
    from autofocusformermod_tpu.models.inference import (
        instance_inference,
        panoptic_inference,
        sem_seg_postprocess,
        semantic_inference,
    )

    h, w = img.shape[:2]
    img_p = Trainer._pad_eval_image(SimpleNamespace(cfg=cfg), img)

    with jax.default_matmul_precision("highest"):
        out = mine.apply(variables, jnp.asarray(img_p, jnp.float32)[None],
                         train=False)
        masks = upsample_masks(out["pred_masks"], img_p.shape[:2])[0]
        logits = out["pred_logits"][0]
        masks = masks[:, :h, :w]
        # reference order: postprocess mask logits BEFORE inference
        masks_pp = sem_seg_postprocess(masks, (h, w), out_hw)
        sem = semantic_inference(logits, masks_pp)

    is_thing = np.zeros((NCLS,), bool)
    for t in THING_IDS:
        is_thing[t] = True
    pan, info = panoptic_inference(
        logits, masks_pp, THING_IDS, NCLS, OBJ_THRESH, OVL_THRESH
    )
    inst = instance_inference(
        logits, masks_pp, jnp.asarray(is_thing), NCLS, topk=TOPK,
        panoptic_on=True,
    )
    return np.asarray(sem), np.asarray(pan), info, inst


def _ref_pipeline(ref_model, img, out_hw):
    ten = torch.from_numpy(img.astype(np.float32)).permute(2, 0, 1)
    with torch.no_grad():
        res = ref_model([
            {"image": ten, "height": out_hw[0], "width": out_hw[1]}
        ])[0]
    sem = res["sem_seg"].numpy()
    pan_seg, segments = res["panoptic_seg"]
    inst = res["instances"]
    return sem, pan_seg.numpy(), segments, inst


@pytest.mark.slow
def test_eval_pipeline_metrics_match_reference(pair):
    ref_model, mine, variables, cfg = pair
    from autofocusformermod_tpu.evaluation import (
        InstanceSegEvaluator,
        PanopticEvaluator,
        SemSegEvaluator,
    )

    ev_sem = {s: SemSegEvaluator(NCLS, ignore_label=255) for s in ("ref", "my")}
    ev_pan = {s: PanopticEvaluator(THING_IDS, NCLS) for s in ("ref", "my")}
    ev_ins = {s: InstanceSegEvaluator(NCLS) for s in ("ref", "my")}

    for idx, (img, out_hw) in enumerate(_synthetic_images()):
        r_sem, r_pan, r_info, r_inst = _ref_pipeline(ref_model, img, out_hw)
        m_sem, m_pan, m_info, m_inst = _my_pipeline(
            mine, variables, cfg, img, out_hw)

        # --- semantic: argmax maps nearly identical, metrics via evaluator
        assert r_sem.shape == m_sem.shape == (NCLS,) + out_hw
        r_arg, m_arg = r_sem.argmax(0), m_sem.argmax(0)
        agree = (r_arg == m_arg).mean()
        assert agree > 0.995, f"img{idx}: semantic argmax agreement {agree:.4f}"

        gt = _synthetic_gt(out_hw, seed=100 + idx)
        ev_sem["ref"].process(r_arg, gt)
        ev_sem["my"].process(m_arg, gt)

        # --- panoptic: same canvas conventions
        assert r_pan.shape == m_pan.shape == out_hw
        # segment ids may be numbered differently; compare via class maps
        def class_map(pan, info):
            cm = np.full(pan.shape, -1, np.int64)
            for s in info:
                cm[pan == s["id"]] = s["category_id"]
            return cm
        pan_agree = (class_map(r_pan, r_info) == class_map(m_pan, m_info)).mean()
        assert pan_agree > 0.99, f"img{idx}: panoptic class agreement {pan_agree:.4f}"

        # synthetic panoptic GT: voronoi cells as segments (things+stuff)
        gt_pan = _synthetic_gt(out_hw, seed=200 + idx)
        gt_seg = np.where(gt_pan == 255, 0, gt_pan + 1).astype(np.int32)
        gt_info = [{"id": c + 1, "category_id": c, "isthing": c in THING_IDS}
                   for c in range(NCLS)]
        for side, pan, info in (("ref", r_pan, r_info), ("my", m_pan, m_info)):
            ev_pan[side].process(pan, info, gt_seg, gt_info)

        # --- instance
        r_masks = r_inst.pred_masks.numpy().astype(bool)
        r_cls = r_inst.pred_classes.numpy()
        r_scores = r_inst.scores.numpy()
        m_valid = np.asarray(m_inst["valid"]).astype(bool)
        m_masks = np.asarray(m_inst["masks"])[m_valid].astype(bool)
        m_cls = np.asarray(m_inst["labels"])[m_valid]
        m_scores = np.asarray(m_inst["scores"])[m_valid]

        gt_things = [(c, gt_pan == c) for c in sorted(THING_IDS)
                     if (gt_pan == c).sum() > 0]
        g_cls = np.array([c for c, _ in gt_things])
        g_masks = np.stack([m for _, m in gt_things])
        ev_ins["ref"].process(idx, r_masks, r_cls, r_scores, g_masks, g_cls)
        ev_ins["my"].process(idx, m_masks, m_cls, m_scores, g_masks, g_cls)

    sem_r = ev_sem["ref"].evaluate()["mIoU"]
    sem_m = ev_sem["my"].evaluate()["mIoU"]
    assert abs(sem_r - sem_m) < 0.3, f"mIoU: ref {sem_r:.3f} vs mine {sem_m:.3f}"

    pq_r = ev_pan["ref"].evaluate()["PQ"]
    pq_m = ev_pan["my"].evaluate()["PQ"]
    assert abs(pq_r - pq_m) < 0.3, f"PQ: ref {pq_r:.3f} vs mine {pq_m:.3f}"

    ap_r = ev_ins["ref"].evaluate()["AP"]
    ap_m = ev_ins["my"].evaluate()["AP"]
    assert abs(ap_r - ap_m) < 0.3, f"AP: ref {ap_r:.3f} vs mine {ap_m:.3f}"


def test_eval_mapper_size_convention_matches_d2():
    """My eval mapper's resize must land on detectron2 ResizeShortestEdge
    sizes (shortest edge -> min_size_test, capped by max_size_test) — the
    mapper half of pipeline parity (cheap, not marked slow)."""
    from autofocusformermod_tpu.data import transforms as T

    for (h, w), short, maxs in [
        ((300, 400), 256, 512),
        ((400, 300), 256, 512),
        ((200, 800), 256, 512),   # max_size cap engages
        ((512, 512), 640, 2560),
    ]:
        img = np.zeros((h, w, 3), np.uint8)
        out, _ = T.resize_shortest_edge(img, None, short, maxs)
        # d2 formula (detectron2 transforms/augmentation_impl.py)
        scale = short / min(h, w)
        nh, nw = (short, scale * w) if h < w else (scale * h, short)
        if max(nh, nw) > maxs:
            s2 = maxs / max(nh, nw)
            nh, nw = nh * s2, nw * s2
        exp = (int(nh + 0.5), int(nw + 0.5))
        assert out.shape[:2] == exp, ((h, w), out.shape[:2], exp)
