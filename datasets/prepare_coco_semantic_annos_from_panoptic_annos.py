#!/usr/bin/env python
"""Derive COCO semantic-segmentation pngs from panoptic annotations
(reference datasets/prepare_coco_semantic_annos_from_panoptic_annos.py),
pycocotools-free.

Usage: DETECTRON2_DATASETS=/path python datasets/prepare_coco_semantic_annos_from_panoptic_annos.py
"""

import json
import os
from pathlib import Path

import numpy as np
from PIL import Image


def rgb2id(color):
    color = color.astype(np.int64)
    return color[..., 0] + 256 * color[..., 1] + 256 * 256 * color[..., 2]


def convert(pan_json: Path, pan_dir: Path, out_dir: Path):
    with open(pan_json) as f:
        data = json.load(f)
    id_map = {c["id"]: i for i, c in enumerate(
        sorted(data["categories"], key=lambda c: c["id"]))}
    out_dir.mkdir(parents=True, exist_ok=True)
    for i, ann in enumerate(data["annotations"]):
        pan = np.asarray(Image.open(pan_dir / ann["file_name"]).convert("RGB"))
        ids = rgb2id(pan)
        sem = np.full(ids.shape, 255, np.uint8)
        for seg in ann["segments_info"]:
            sem[ids == seg["id"]] = id_map[seg["category_id"]]
        Image.fromarray(sem).save(out_dir / ann["file_name"])
        if i % 500 == 0:
            print(f"{i}/{len(data['annotations'])}")


if __name__ == "__main__":
    root = Path(os.environ.get("DETECTRON2_DATASETS", "datasets")) / "coco"
    for split in ["train2017", "val2017"]:
        convert(
            root / "annotations" / f"panoptic_{split}.json",
            root / f"panoptic_{split}",
            root / f"panoptic_semseg_{split}",
        )
