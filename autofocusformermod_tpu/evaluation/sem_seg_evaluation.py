"""Semantic-segmentation evaluation: confusion-matrix mIoU (+ optional
prediction/error dumps).

Rebuild of reference mask2former/evaluation/semseg_evaluation.py (itself a
detectron2 SemSegEvaluator subclass): accumulate an (nc+1)^2 confusion matrix
over predictions vs ground truth, then derive mIoU / fwIoU / mACC / pACC.
Cross-host reduction sums the matrices (the reference gathers to rank 0)."""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np


class SemSegEvaluator:
    def __init__(
        self,
        num_classes: int,
        ignore_label: int = 255,
        class_names=None,
        output_dir: Optional[str] = None,
        save_predictions: bool = False,
    ):
        self.num_classes = num_classes
        self.ignore_label = ignore_label
        self.class_names = class_names or [str(i) for i in range(num_classes)]
        self.output_dir = output_dir
        self.save_predictions = save_predictions
        self.reset()

    def reset(self):
        self._conf = np.zeros(
            (self.num_classes + 1, self.num_classes + 1), dtype=np.int64
        )

    def process(self, pred: np.ndarray, gt: np.ndarray, file_name: str = ""):
        """pred: (h, w) predicted class ids; gt: (h, w) gt ids (ignore=255)."""
        pred = np.asarray(pred, np.int64).reshape(-1)
        gt = np.asarray(gt, np.int64).reshape(-1)
        gt = np.where(gt == self.ignore_label, self.num_classes, gt)
        gt = np.clip(gt, 0, self.num_classes)
        pred = np.clip(pred, 0, self.num_classes)
        idx = gt * (self.num_classes + 1) + pred
        self._conf += np.bincount(
            idx, minlength=(self.num_classes + 1) ** 2
        ).reshape(self.num_classes + 1, self.num_classes + 1)

        if self.save_predictions and self.output_dir:
            os.makedirs(self.output_dir, exist_ok=True)
            base = os.path.splitext(os.path.basename(file_name or "pred"))[0]
            np.save(os.path.join(self.output_dir, base + "_pred.npy"),
                    pred.astype(np.uint16))

    def merge(self, other: "SemSegEvaluator"):
        self._conf += other._conf

    def evaluate(self) -> Dict[str, float]:
        conf = self._conf[: self.num_classes, : self.num_classes].astype(np.float64)
        tp = np.diag(conf)
        gt_total = conf.sum(axis=1)
        pred_total = conf.sum(axis=0)
        union = gt_total + pred_total - tp
        valid = gt_total > 0
        iou = np.where(union > 0, tp / np.maximum(union, 1), 0.0)
        acc = np.where(valid, tp / np.maximum(gt_total, 1), 0.0)

        miou = float(iou[valid].mean() * 100) if valid.any() else 0.0
        macc = float(acc[valid].mean() * 100) if valid.any() else 0.0
        freq = gt_total / max(gt_total.sum(), 1)
        fwiou = float((freq[valid] * iou[valid]).sum() * 100) if valid.any() else 0.0
        pacc = float(tp.sum() / max(gt_total.sum(), 1) * 100)

        results = {"mIoU": miou, "fwIoU": fwiou, "mACC": macc, "pACC": pacc}
        for i, name in enumerate(self.class_names):
            if valid[i]:
                results[f"IoU-{name}"] = float(iou[i] * 100)
        return results
