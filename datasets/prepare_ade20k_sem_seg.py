#!/usr/bin/env python
"""Convert ADE20K annotations to detectron2-style training ids (label-1, with
255 for the 0/void class) — the same preprocessing as the reference
datasets/prepare_ade20k_sem_seg.py but without the tensorflow dependency.

Usage: DETECTRON2_DATASETS=/path python datasets/prepare_ade20k_sem_seg.py
"""

import os
from pathlib import Path

import numpy as np
from PIL import Image


def convert(input_dir: Path, output_dir: Path):
    output_dir.mkdir(parents=True, exist_ok=True)
    files = sorted(input_dir.glob("*.png"))
    for i, f in enumerate(files):
        lab = np.asarray(Image.open(f)).astype(np.int32)
        out = lab - 1
        out[lab == 0] = 255
        Image.fromarray(out.astype(np.uint8)).save(output_dir / f.name)
        if i % 500 == 0:
            print(f"{input_dir.name}: {i}/{len(files)}")


if __name__ == "__main__":
    root = Path(os.environ.get("DETECTRON2_DATASETS", "datasets"))
    base = root / "ADEChallengeData2016"
    for split in ["training", "validation"]:
        convert(base / "annotations" / split,
                base / "annotations_detectron2" / split)
