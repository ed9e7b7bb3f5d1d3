"""Colorize ADE20K annotation pngs for visualization.

Rebuild of reference tools/convert_ade20k_annotations_to_rgb.py: build a
deterministic 150-color map (evenly spaced hues at s=v=0.75, shuffled with
seed 1337 — identical colors to the reference, which uses
matplotlib.colors.hsv_to_rgb + random.Random(1337)), then map every label id
in annotations_detectron2/<split> to its color under
annotations_detectron2_rgb/<split>.

Usage: python tools/convert_ade20k_annotations_to_rgb.py [splits...]
       (default: validation; reads $DETECTRON2_DATASETS)
"""

from __future__ import annotations

import os
import random
import sys
from pathlib import Path

import numpy as np
from PIL import Image


def _hsv_to_rgb(hsv: np.ndarray) -> np.ndarray:
    """Vectorized HSV->RGB, same math as matplotlib.colors.hsv_to_rgb."""
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = (h * 6.0).astype(int)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i % 6
    out = np.choose(
        i[..., None],
        [
            np.stack([v, t, p], -1),
            np.stack([q, v, p], -1),
            np.stack([p, v, t], -1),
            np.stack([p, q, v], -1),
            np.stack([t, p, v], -1),
            np.stack([v, p, q], -1),
        ],
    )
    return out


def create_colormap(n: int = 150) -> np.ndarray:
    hsv_colors = [(i / n, 0.75, 0.75) for i in range(n)]
    random.Random(1337).shuffle(hsv_colors)
    rgb = _hsv_to_rgb(np.asarray(hsv_colors))
    return (rgb * 255).astype(np.uint8)


def convert_to_rgb(input_path, output_path, color_map: np.ndarray) -> None:
    img = np.asarray(Image.open(input_path))
    n = color_map.shape[0]
    # LUT gather instead of the reference's 150-iteration python loop;
    # labels >= n (e.g. 255 ignore) map to black
    lut = np.zeros((256, 3), np.uint8)
    lut[:n] = color_map
    Image.fromarray(lut[np.clip(img, 0, 255)]).save(output_path)


def main() -> None:
    splits = sys.argv[1:] or ["validation"]
    dataset_dir = (
        Path(os.getenv("DETECTRON2_DATASETS", "datasets"))
        / "ADEChallengeData2016"
    )
    color_map = create_colormap()
    for name in splits:
        annotation_dir = dataset_dir / "annotations_detectron2" / name
        output_dir = dataset_dir / "annotations_detectron2_rgb" / name
        output_dir.mkdir(parents=True, exist_ok=True)
        files = sorted(annotation_dir.iterdir())
        for k, file in enumerate(files):
            convert_to_rgb(file, output_dir / file.name, color_map)
            if (k + 1) % 200 == 0:
                print(f"{name}: {k + 1}/{len(files)}", flush=True)


if __name__ == "__main__":
    main()
