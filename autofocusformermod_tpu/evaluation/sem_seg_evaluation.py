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

    def _color_map(self) -> np.ndarray:
        """The reference's deterministic HSV palette (semseg_evaluation.py:
        evenly spaced hues at s=v=0.75, shuffled with Random(1337))."""
        import colorsys
        import random

        hsv = [(i / self.num_classes, 0.75, 0.75) for i in range(self.num_classes)]
        random.Random(1337).shuffle(hsv)
        return (np.array([colorsys.hsv_to_rgb(*c) for c in hsv]) * 255).astype(
            np.uint8
        )

    def save_artifacts(self, pred, gt, file_name: str, extras: Optional[Dict] = None):
        """Colorized prediction PNG + raw npy + red error-map PNG (reference
        SemSegEvaluatorSave.save_sem_seg/save_error_map) and grayscale PNGs
        for any extra maps (MaskFiner disagreement masks, MetaLoss maps)."""
        from PIL import Image

        out_dir = os.path.join(self.output_dir, "inference_output")
        os.makedirs(out_dir, exist_ok=True)
        fn = os.path.splitext(os.path.basename(file_name or "pred"))[0]

        pred = np.asarray(pred, np.int64)
        cmap = self._color_map()
        rgb = cmap[np.clip(pred, 0, self.num_classes - 1)]
        Image.fromarray(rgb, "RGB").save(os.path.join(out_dir, fn + "_sem_seg.png"))
        np.save(os.path.join(out_dir, fn + "_sem_seg_raw.npy"), pred)

        if gt is not None and np.asarray(gt).shape == pred.shape:
            gt = np.asarray(gt, np.int64)
            err = np.zeros(pred.shape + (3,), np.uint8)
            err[..., 0] = np.where(
                (pred != gt) & (gt != self.ignore_label), 255, 0
            )
            Image.fromarray(err, "RGB").save(os.path.join(out_dir, fn + "_error.png"))

        for k, v in (extras or {}).items():
            arr = np.clip(np.asarray(v, np.float32), 0, 255).astype(np.uint8)
            Image.fromarray(arr, "L").save(os.path.join(out_dir, f"{fn}_{k}.png"))

    def process(self, pred: np.ndarray, gt: np.ndarray, file_name: str = "",
                extras: Optional[Dict] = None):
        """pred: (h, w) predicted class ids; gt: (h, w) gt ids (ignore=255);
        extras: optional named (h, w) maps dumped alongside predictions."""
        if self.save_predictions and self.output_dir:
            self.save_artifacts(pred, gt, file_name, extras)

        pred = np.asarray(pred, np.int64).reshape(-1)
        gt = np.asarray(gt, np.int64).reshape(-1)
        gt = np.where(gt == self.ignore_label, self.num_classes, gt)
        gt = np.clip(gt, 0, self.num_classes)
        pred = np.clip(pred, 0, self.num_classes)
        idx = gt * (self.num_classes + 1) + pred
        self._conf += np.bincount(
            idx, minlength=(self.num_classes + 1) ** 2
        ).reshape(self.num_classes + 1, self.num_classes + 1)

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


class MaskFinerSemSegEvaluator(SemSegEvaluator):
    """SemSeg evaluation + per-stage disagreement-mask dumps (reference
    maskfiner_evaluation.py:59-108): pass the model's ``disagreement_mask_*``
    maps via ``extras`` and they are saved as grayscale PNGs next to the
    colorized prediction."""


class MetaLossSemSegEvaluator(SemSegEvaluator):
    """SemSeg evaluation + predicted meta-loss map dumps (reference
    meta_loss_evaluation.py:7): pass ``meta_loss_candidates_scale_*`` maps
    via ``extras``; saved as ``<fn>_meta_loss_scale_<s>.png``."""

    def process(self, pred, gt, file_name="", extras=None):
        extras = {
            (f"meta_loss_scale_{k[-1]}" if k.startswith("meta_loss_candidates_scale_")
             else k): v
            for k, v in (extras or {}).items()
        }
        super().process(pred, gt, file_name, extras)
