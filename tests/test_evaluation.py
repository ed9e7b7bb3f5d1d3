"""Evaluator tests: mIoU/PQ/AP sanity on synthetic perfect + imperfect preds."""

import numpy as np

from autofocusformermod_tpu.evaluation import (
    InstanceSegEvaluator,
    PanopticEvaluator,
    SemSegEvaluator,
)


def test_semseg_perfect_prediction():
    ev = SemSegEvaluator(3)
    gt = np.array([[0, 0, 1], [1, 2, 2], [255, 2, 0]])
    ev.process(gt.copy(), gt)
    r = ev.evaluate()
    assert r["mIoU"] == 100.0 and r["pACC"] == 100.0


def test_semseg_half_wrong():
    ev = SemSegEvaluator(2)
    gt = np.zeros((4, 4), np.int64)
    pred = np.zeros((4, 4), np.int64)
    pred[:2] = 1  # half of class-0 pixels predicted as 1
    ev.process(pred, gt)
    r = ev.evaluate()
    assert abs(r["mIoU"] - 50.0) < 1e-6  # only class 0 has gt; IoU=0.5


def test_panoptic_perfect():
    ev = PanopticEvaluator(thing_ids={0}, num_classes=2)
    seg = np.zeros((8, 8), np.int32)
    seg[:4] = 1
    seg[4:] = 2
    info = [
        {"id": 1, "category_id": 0, "isthing": True},
        {"id": 2, "category_id": 1, "isthing": False},
    ]
    ev.process(seg, info, seg, info)
    r = ev.evaluate()
    assert r["PQ"] == 100.0 and r["PQ_th"] == 100.0 and r["PQ_st"] == 100.0


def test_panoptic_miss_and_fp():
    ev = PanopticEvaluator(thing_ids={0}, num_classes=2)
    gt = np.zeros((8, 8), np.int32)
    gt[:4] = 1
    gt_info = [{"id": 1, "category_id": 0, "isthing": True}]
    pred = np.zeros((8, 8), np.int32)
    pred[4:] = 7  # wrong place entirely
    pred_info = [{"id": 7, "category_id": 0, "isthing": True}]
    ev.process(pred, pred_info, gt, gt_info)
    r = ev.evaluate()
    assert r["PQ"] == 0.0


def test_instance_ap_perfect():
    ev = InstanceSegEvaluator(2)
    m1 = np.zeros((16, 16), bool)
    m1[:8, :8] = True
    m2 = np.zeros((16, 16), bool)
    m2[8:, 8:] = True
    ev.process(
        0,
        pred_masks=np.stack([m1, m2]),
        pred_classes=[0, 1],
        pred_scores=[0.9, 0.8],
        gt_masks=np.stack([m1, m2]),
        gt_classes=[0, 1],
    )
    r = ev.evaluate()
    assert r["AP"] > 99.0 and r["AP50"] > 99.0


def test_instance_ap_partial_overlap():
    ev = InstanceSegEvaluator(1)
    gt = np.zeros((16, 16), bool)
    gt[:8] = True
    pred = np.zeros((16, 16), bool)
    pred[:6] = True  # IoU = 6/8 = 0.75
    ev.process(0, np.stack([pred]), [0], [0.9], np.stack([gt]), [0])
    r = ev.evaluate()
    # TP at thresholds <= 0.75 (6 of 10), FP above
    assert abs(r["AP"] - 60.0) < 1.0
    assert r["AP50"] > 99.0


def test_instance_rle_roundtrip():
    from autofocusformermod_tpu.evaluation.instance_evaluation import (
        rle_decode_bool,
        rle_encode,
    )

    rng = np.random.default_rng(0)
    m = rng.uniform(size=(13, 17)) > 0.6
    np.testing.assert_array_equal(rle_decode_bool(rle_encode(m)), m)


def test_panoptic_crowd_fp_discount_same_category_only():
    """panopticapi: unmatched predictions mostly covering a crowd region are
    discounted as FP only when the crowd has the prediction's own category."""
    import numpy as np

    # gt: segment 1 = crowd of category 0 covering left half; right half void
    gt = np.zeros((4, 8), np.int32)
    gt[:, :4] = 1
    gt_info = [{"id": 1, "category_id": 0, "isthing": True, "iscrowd": 1}]

    # prediction A: category 0 over the crowd -> discounted, no FP
    pred = np.zeros((4, 8), np.int32)
    pred[:, :4] = 7
    ev = PanopticEvaluator(thing_ids={0, 1}, num_classes=2)
    ev.process(pred, [{"id": 7, "category_id": 0, "isthing": True}], gt, gt_info)
    assert ev.fp.sum() == 0 and ev.tp.sum() == 0

    # prediction B: category 1 over the same crowd -> counted as FP
    ev2 = PanopticEvaluator(thing_ids={0, 1}, num_classes=2)
    ev2.process(pred, [{"id": 7, "category_id": 1, "isthing": True}], gt, gt_info)
    assert ev2.fp[1] == 1


def test_panoptic_union_ignores_crowd_discount():
    """The match union subtracts only true-VOID intersection (panopticapi),
    not crowd intersections: a pred half-on-gt/half-on-crowd must NOT be
    upgraded to a match by discounting the crowd half from the union."""
    import numpy as np

    gt = np.zeros((4, 8), np.int32)
    gt[:, :4] = 1          # real segment, category 0
    gt[:, 4:] = 2          # crowd, category 0
    gt_info = [
        {"id": 1, "category_id": 0, "isthing": True},
        {"id": 2, "category_id": 0, "isthing": True, "iscrowd": 1},
    ]
    pred = np.full((4, 8), 7, np.int32)  # one pred covering everything
    ev = PanopticEvaluator(thing_ids={0}, num_classes=1)
    ev.process(pred, [{"id": 7, "category_id": 0, "isthing": True}], gt, gt_info)
    # IoU = 16 / (16 + 32 - 16) = 0.5, not > 0.5 -> no TP
    assert ev.tp.sum() == 0
