"""Sliding-window eval (reference maskfiner_oracle_teacher_model_sw.py:207-292).

The engine applies crop-grid sliding inference with count-normalized
stitching whenever TEST.SW_ENABLED is set or the meta-arch is
MaskFinerOracleTeacherSW.  These tests pin the window grid and the
stitching math against an independent port of the reference loop.
"""

import numpy as np
import pytest

from autofocusformermod_tpu.models.inference import (
    sliding_window_grid,
    sliding_window_semantic_scores,
)


def _reference_windows(h_img, w_img, h_crop, w_crop, h_stride, w_stride):
    """Direct port of the reference crop-grid loop
    (maskfiner_oracle_teacher_model_sw.py:217-243) as an oracle."""
    if h_crop > h_img or w_crop > w_img:
        sw_size = min(h_img, w_img)
        h_stride, w_stride = sw_size, sw_size
        h_crop, w_crop = sw_size, sw_size
    h_grids = max(h_img - h_crop + h_stride - 1, 0) // h_stride + 1
    w_grids = max(w_img - w_crop + w_stride - 1, 0) // w_stride + 1
    wins = []
    for h_idx in range(h_grids):
        for w_idx in range(w_grids):
            y1 = h_idx * h_stride
            x1 = w_idx * w_stride
            y2 = min(y1 + h_crop, h_img)
            x2 = min(x1 + w_crop, w_img)
            y1 = max(y2 - h_crop, 0)
            x1 = max(x2 - w_crop, 0)
            wins.append((y1, x1, y2, x2))
    return wins


@pytest.mark.parametrize("img_hw,crop_hw,stride_hw", [
    ((1024, 2048), (1024, 1024), (768, 768)),     # cityscapes SW recipe
    ((512, 512), (1024, 1024), (768, 768)),       # crop > image collapse
    ((512, 1024), (1024, 1024), (768, 768)),      # nonsquare collapse
    ((800, 800), (400, 400), (400, 400)),         # exact tiling, no overlap
    ((333, 777), (128, 256), (96, 192)),          # ragged edges
])
def test_grid_matches_reference(img_hw, crop_hw, stride_hw):
    mine = sliding_window_grid(img_hw, crop_hw, stride_hw)
    ref = _reference_windows(img_hw[0], img_hw[1], crop_hw[0], crop_hw[1],
                             stride_hw[0], stride_hw[1])
    assert mine == ref
    # every window is exactly crop-sized (static shape: one compilation)
    sizes = {(y2 - y1, x2 - x1) for (y1, x1, y2, x2) in mine}
    assert len(sizes) == 1


def _toy_score_fn(nc=4):
    """Deterministic crop -> (nc, hc, wc) scores that depend on content, so a
    stitching bug (wrong offset / missing normalization) shifts values."""
    def fn(crop):
        crop = np.asarray(crop, np.float32)
        base = crop.mean(axis=-1)                    # (hc, wc)
        return np.stack([base * (k + 1) + crop[..., k % 3] for k in range(nc)])
    return fn


def test_sw_with_crop_geq_image_equals_whole_image():
    """Crop >= (square) image collapses to one full window -> identical to
    whole-image eval (VERDICT r3 item 5 done-criterion)."""
    rng = np.random.default_rng(0)
    img = rng.random((96, 96, 3)).astype(np.float32)
    fn = _toy_score_fn()
    sw = sliding_window_semantic_scores(fn, img, (128, 128), (96, 96))
    np.testing.assert_allclose(sw, fn(img), rtol=0, atol=1e-6)


def test_sw_2x2_matches_reference_port_oracle():
    """2x2 overlapping crop grid stitches exactly like the reference
    accumulate/divide loop (torch F.pad variant ported inline)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(1)
    h_img, w_img = 160, 192
    h_crop, w_crop = 96, 128
    h_stride, w_stride = 64, 64      # -> 2x2 grid with overlaps
    img = rng.random((h_img, w_img, 3)).astype(np.float32)
    fn = _toy_score_fn()

    mine = sliding_window_semantic_scores(
        fn, img, (h_crop, w_crop), (h_stride, w_stride))

    # oracle: reference lines 235-286 verbatim on torch tensors
    nc = mine.shape[0]
    preds = torch.zeros((nc, h_img, w_img))
    count = torch.zeros((1, h_img, w_img))
    h_grids = max(h_img - h_crop + h_stride - 1, 0) // h_stride + 1
    w_grids = max(w_img - w_crop + w_stride - 1, 0) // w_stride + 1
    assert (h_grids, w_grids) == (2, 2)
    for h_idx in range(h_grids):
        for w_idx in range(w_grids):
            y1 = h_idx * h_stride
            x1 = w_idx * w_stride
            y2 = min(y1 + h_crop, h_img)
            x2 = min(x1 + w_crop, w_img)
            y1 = max(y2 - h_crop, 0)
            x1 = max(x2 - w_crop, 0)
            r = torch.from_numpy(fn(img[y1:y2, x1:x2]))
            preds += F.pad(r, (int(x1), int(w_img - x2),
                               int(y1), int(h_img - y2)))
            count[:, y1:y2, x1:x2] += 1
    assert (count == 0).sum() == 0
    oracle = (preds / count).numpy()
    np.testing.assert_allclose(mine, oracle, rtol=0, atol=1e-5)


def test_sw_configs_enable_sliding_window():
    """The -SW cityscapes configs must actually reach the engine's SW path:
    either TEST.SW_ENABLED or the SW meta-arch name."""
    import os

    from autofocusformermod_tpu.config import add_maskformer2_config, get_cfg

    root = os.path.join(os.path.dirname(__file__), "..", "configs")
    for rel in [
        "cityscapes/semantic-segmentation/maskformer2_R50_bs16_90k-SW.yaml",
        "cityscapes/semantic-segmentation/maskfiner_R50_bs16_90k-SW.yaml",
        "cityscapes/semantic-segmentation/maskfiner/maskfiner_updown_tiny_sw_bs16_90k.yaml",
    ]:
        cfg = get_cfg()
        add_maskformer2_config(cfg)
        cfg.merge_from_file(os.path.join(root, rel))
        enabled = (bool(getattr(cfg.TEST, "SW_ENABLED", False))
                   or cfg.MODEL.META_ARCHITECTURE == "MaskFinerOracleTeacherSW")
        assert enabled, rel
        assert len(cfg.TEST.SW_CROP_SIZE) == 2
        assert len(cfg.TEST.SW_STRIDE) == 2
