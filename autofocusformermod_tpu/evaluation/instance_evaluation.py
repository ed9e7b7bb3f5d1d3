"""Instance segmentation mask-AP evaluation in pure numpy.

Replaces the reference's COCOEvaluator/pycocotools dependency
(evaluation/instance_evaluation.py InstanceSegEvaluator — "COCO AP without
the contiguous-id assert"): COCO-protocol segm AP — per-class greedy matching
at IoU thresholds .50:.05:.95, score-sorted, crowd-aware, 101-point
interpolated precision, maxDets=100.  Masks are stored run-length encoded to
bound memory.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

IOU_THRS = np.linspace(0.5, 0.95, 10)
RECALL_THRS = np.linspace(0.0, 1.0, 101)
MAX_DETS = 100


def rle_encode(mask: np.ndarray) -> Dict:
    flat = np.asarray(mask, np.uint8).reshape(-1, order="F")
    change = np.nonzero(np.diff(flat))[0] + 1
    runs = np.concatenate([[0], change, [flat.size]])
    counts = np.diff(runs)
    if flat[0] == 1:
        counts = np.concatenate([[0], counts])
    return {"size": mask.shape, "counts": counts.astype(np.int64)}


def rle_area(rle: Dict) -> int:
    return int(rle["counts"][1::2].sum())


def rle_iou(a: Dict, b: Dict, crowd: bool = False) -> float:
    """IoU of two RLE masks (decode-free intersection via run merging is
    overkill here; decode the smaller extent instead)."""
    am = rle_decode_bool(a)
    bm = rle_decode_bool(b)
    inter = np.logical_and(am, bm).sum()
    if crowd:
        denom = am.sum()
    else:
        denom = am.sum() + bm.sum() - inter
    return float(inter) / float(denom) if denom > 0 else 0.0


def rle_decode_bool(rle: Dict) -> np.ndarray:
    h, w = rle["size"]
    flat = np.zeros(h * w, bool)
    pos = 0
    val = False
    for c in rle["counts"]:
        if val:
            flat[pos : pos + c] = True
        pos += int(c)
        val = not val
    return flat.reshape((h, w), order="F")


class InstanceSegEvaluator:
    def __init__(self, num_classes: int, class_names=None,
                 output_dir=None, contiguous_id_to_dataset_id=None):
        self.num_classes = num_classes
        self.class_names = class_names or [str(i) for i in range(num_classes)]
        self.output_dir = output_dir
        # contiguous model class -> dataset category id, for COCO-json output
        # (reference instance_evaluation.py:40-52 reverse_id_mapping)
        self.contiguous_id_to_dataset_id = contiguous_id_to_dataset_id or {}
        self.reset()

    def save_coco_results(self):
        """Write coco_instances_results.json (reference
        instance_evaluation.py:54-60): one record per detection with RLE
        segmentation, loadable by pycocotools."""
        import json
        import os

        if not self.output_dir:
            return None
        results = []
        for img_id, cls, score, rle in self._dets:
            h, w = rle["size"]
            results.append({
                "image_id": img_id,
                "category_id": self.contiguous_id_to_dataset_id.get(cls, cls),
                "score": score,
                "segmentation": {
                    "size": [int(h), int(w)],
                    "counts": [int(c) for c in rle["counts"]],
                },
            })
        os.makedirs(self.output_dir, exist_ok=True)
        path = os.path.join(self.output_dir, "coco_instances_results.json")
        with open(path, "w") as f:
            json.dump(results, f)
        return path

    def reset(self):
        # per (image, class): matching results at each IoU threshold
        self._dets: List = []   # (img_id, cls, score, rle)
        self._gts: List = []    # (img_id, cls, rle, iscrowd)
        self._img_ids = set()

    def process(self, image_id, pred_masks, pred_classes, pred_scores,
                gt_masks, gt_classes, gt_iscrowd=None):
        """pred_masks: (n, h, w) bool; gt_masks: (m, h, w) bool."""
        self._img_ids.add(image_id)
        order = np.argsort(-np.asarray(pred_scores))[:MAX_DETS]
        for i in order:
            if pred_masks[i].sum() == 0:
                continue
            self._dets.append(
                (image_id, int(pred_classes[i]), float(pred_scores[i]),
                 rle_encode(pred_masks[i]))
            )
        gt_iscrowd = gt_iscrowd if gt_iscrowd is not None else [0] * len(gt_classes)
        for j in range(len(gt_classes)):
            self._gts.append(
                (image_id, int(gt_classes[j]), rle_encode(gt_masks[j]),
                 int(gt_iscrowd[j]))
            )

    def merge(self, other: "InstanceSegEvaluator"):
        self._dets += other._dets
        self._gts += other._gts
        self._img_ids |= other._img_ids

    def evaluate(self) -> Dict[str, float]:
        T = len(IOU_THRS)
        ap_per_class = []
        ap50_per_class = []
        ap75_per_class = []
        for cls in range(self.num_classes):
            dets = [d for d in self._dets if d[1] == cls]
            gts = [g for g in self._gts if g[1] == cls]
            n_gt = sum(1 for g in gts if not g[3])
            if n_gt == 0:
                continue
            dets.sort(key=lambda d: -d[2])

            gt_by_img: Dict = {}
            for g in gts:
                gt_by_img.setdefault(g[0], []).append(g)

            nd = len(dets)
            tps = np.zeros((T, nd), bool)
            fps = np.zeros((T, nd), bool)
            matched: Dict = {t: set() for t in range(T)}
            for di, (img, _, score, rle) in enumerate(dets):
                cands = gt_by_img.get(img, [])
                ious = [rle_iou(rle, g[2], crowd=bool(g[3])) for g in cands]
                for t, thr in enumerate(IOU_THRS):
                    best, best_j = thr, -1
                    for j, (g, iou) in enumerate(zip(cands, ious)):
                        key = (img, j)
                        if not g[3] and key in matched[t]:
                            continue
                        if iou >= best:
                            # prefer non-crowd matches (COCO protocol)
                            if best_j >= 0 and not cands[best_j][3] and g[3]:
                                continue
                            best, best_j = iou, j
                    if best_j >= 0:
                        if cands[best_j][3]:
                            continue  # matched to crowd: neither TP nor FP
                        matched[t].add((img, best_j))
                        tps[t, di] = True
                    else:
                        fps[t, di] = True

            ap_t = np.zeros(T)
            for t in range(T):
                tp_cum = np.cumsum(tps[t])
                fp_cum = np.cumsum(fps[t])
                recall = tp_cum / n_gt
                precision = tp_cum / np.maximum(tp_cum + fp_cum, 1e-9)
                # monotone precision envelope + 101-pt interpolation
                for i in range(len(precision) - 2, -1, -1):
                    precision[i] = max(precision[i], precision[i + 1])
                prec_at = np.zeros(len(RECALL_THRS))
                inds = np.searchsorted(recall, RECALL_THRS, side="left")
                for ri, pi in enumerate(inds):
                    if pi < len(precision):
                        prec_at[ri] = precision[pi]
                ap_t[t] = prec_at.mean()
            ap_per_class.append(ap_t.mean())
            ap50_per_class.append(ap_t[0])
            ap75_per_class.append(ap_t[5])

        if not ap_per_class:
            return {"AP": 0.0, "AP50": 0.0, "AP75": 0.0}
        return {
            "AP": float(np.mean(ap_per_class) * 100),
            "AP50": float(np.mean(ap50_per_class) * 100),
            "AP75": float(np.mean(ap75_per_class) * 100),
        }
