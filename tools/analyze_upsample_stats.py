#!/usr/bin/env python
"""GT-edge-based upsampling-ratio statistics.

Rebuild of reference tools/analyze_upsample_stats_{ade20k,coco,cityscapes}.py:
for each image's semantic GT, count the fraction of patches (per patch size)
containing a class boundary — the oracle upsampling ratio the MaskFiner
cascade would need per stage.

Usage: python tools/analyze_upsample_stats.py --dataset ade20k_sem_seg_val \
           [--patch-sizes 32 16 8 4] [--limit 500]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def edge_map(sem: np.ndarray, ignore: int = 255) -> np.ndarray:
    """Boundary pixels: label differs from a 4-neighbor (ignoring void)."""
    e = np.zeros_like(sem, bool)
    v = sem != ignore
    e[:-1] |= (sem[:-1] != sem[1:]) & v[:-1] & v[1:]
    e[:, :-1] |= (sem[:, :-1] != sem[:, 1:]) & v[:, :-1] & v[:, 1:]
    return e


def patch_edge_fraction(edges: np.ndarray, ps: int) -> float:
    h, w = edges.shape
    hp, wp = h // ps * ps, w // ps * ps
    if hp == 0 or wp == 0:
        return 0.0
    e = edges[:hp, :wp].reshape(hp // ps, ps, wp // ps, ps)
    has_edge = e.any(axis=(1, 3))
    return float(has_edge.mean())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="ade20k_sem_seg_val")
    ap.add_argument("--patch-sizes", type=int, nargs="+", default=[32, 16, 8, 4])
    ap.add_argument("--limit", type=int, default=0)
    args = ap.parse_args()

    from PIL import Image

    from autofocusformermod_tpu.data import DatasetCatalog, register_all_builtin

    register_all_builtin()
    dataset = DatasetCatalog.get(args.dataset)
    if args.limit:
        dataset = dataset[: args.limit]

    fracs = {ps: [] for ps in args.patch_sizes}
    for d in dataset:
        sem = np.asarray(Image.open(d["sem_seg_file_name"])).astype(np.int64)
        edges = edge_map(sem)
        for ps in args.patch_sizes:
            fracs[ps].append(patch_edge_fraction(edges, ps))

    print(f"dataset: {args.dataset} ({len(dataset)} images)")
    for ps in args.patch_sizes:
        arr = np.asarray(fracs[ps])
        print(
            f"patch {ps:3d}: edge-patch fraction mean {arr.mean():.4f}  "
            f"p50 {np.median(arr):.4f}  p90 {np.percentile(arr, 90):.4f}"
        )


if __name__ == "__main__":
    main()
