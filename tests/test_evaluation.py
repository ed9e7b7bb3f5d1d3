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


def test_semseg_artifact_dumps(tmp_path):
    """SemSegEvaluatorSave-style dumps (ref semseg_evaluation.py:10-49):
    colorized prediction PNG, raw npy, red error map, extras as gray PNGs."""
    import numpy as np
    from autofocusformermod_tpu.evaluation.sem_seg_evaluation import (
        MaskFinerSemSegEvaluator,
    )

    ev = MaskFinerSemSegEvaluator(
        3, output_dir=str(tmp_path), save_predictions=True
    )
    pred = np.array([[0, 1], [2, 2]])
    gt = np.array([[0, 1], [255, 0]])
    ev.process(pred, gt, "img_007.jpg",
               extras={"disagreement_mask_1": np.full((2, 2), 128.0)})
    out = tmp_path / "inference_output"
    assert (out / "img_007_sem_seg.png").exists()
    assert (out / "img_007_error.png").exists()
    assert (out / "img_007_disagreement_mask_1.png").exists()
    raw = np.load(out / "img_007_sem_seg_raw.npy")
    np.testing.assert_array_equal(raw, pred)
    from PIL import Image

    err = np.asarray(Image.open(out / "img_007_error.png"))
    # pred!=gt only at (1,1); (1,0) is ignore -> black
    assert err[1, 1, 0] == 255 and err[1, 0, 0] == 0 and err[0, 0, 0] == 0
    # the confusion matrix must be unaffected by saving
    r = ev.evaluate()
    assert 0 <= r["mIoU"] <= 100


def test_metaloss_evaluator_renames_extras(tmp_path):
    import numpy as np
    from autofocusformermod_tpu.evaluation.sem_seg_evaluation import (
        MetaLossSemSegEvaluator,
    )

    ev = MetaLossSemSegEvaluator(2, output_dir=str(tmp_path), save_predictions=True)
    ev.process(np.zeros((2, 2), int), np.zeros((2, 2), int), "a.png",
               extras={"meta_loss_candidates_scale_2": np.ones((2, 2)) * 9})
    assert (tmp_path / "inference_output" / "a_meta_loss_scale_2.png").exists()


def test_instance_coco_json(tmp_path):
    import json
    import numpy as np
    from autofocusformermod_tpu.evaluation.instance_evaluation import (
        InstanceSegEvaluator,
    )

    ev = InstanceSegEvaluator(
        2, output_dir=str(tmp_path), contiguous_id_to_dataset_id={0: 17, 1: 42}
    )
    m = np.zeros((4, 4), bool)
    m[:2] = True
    ev.process(3, m[None], np.array([1]), np.array([0.9]), m[None], np.array([1]))
    path = ev.save_coco_results()
    recs = json.load(open(path))
    assert recs[0]["image_id"] == 3
    assert recs[0]["category_id"] == 42
    assert recs[0]["segmentation"]["size"] == [4, 4]
    # RLE decodes back to the mask
    from autofocusformermod_tpu.data.mapper_panoptic_instance import rle_decode

    back = rle_decode({"size": (4, 4), "counts": recs[0]["segmentation"]["counts"]})
    np.testing.assert_array_equal(back.astype(bool), m)


def test_merge_across_processes_single_is_noop():
    import numpy as np
    from autofocusformermod_tpu.evaluation import SemSegEvaluator
    from autofocusformermod_tpu.evaluation.distributed import (
        merge_across_processes,
    )

    ev = SemSegEvaluator(2)
    ev.process(np.zeros((2, 2), int), np.zeros((2, 2), int))
    conf = ev._conf.copy()
    merge_across_processes(ev)
    np.testing.assert_array_equal(ev._conf, conf)


def test_eval_loader_lazy_and_ordered():
    import threading
    import time as _time
    from autofocusformermod_tpu.data.loader import eval_loader

    in_flight = []
    lock = threading.Lock()

    def mapper(d):
        with lock:
            in_flight.append(d["i"])
        _time.sleep(0.01)
        return d

    dataset = [{"i": i} for i in range(100)]
    it = eval_loader(dataset, mapper, num_workers=4)
    first = next(it)
    assert first["i"] == 0
    # bounded window: far fewer than the whole dataset mapped so far
    assert len(in_flight) <= 2 * 4 + 4 + 1
    rest = [s["i"] for s in it]
    assert rest == list(range(1, 100))
