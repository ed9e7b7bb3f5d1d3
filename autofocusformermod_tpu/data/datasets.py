"""Builtin dataset registration (port of reference builtin.py:253-261 and the
loaders it pulls from detectron2), rooted at $DETECTRON2_DATASETS.

Round-1 coverage: ADE20K semantic (the flagship benchmark), cityscapes
semantic, generic folder-pair semantic datasets.  COCO/LVIS/panoptic
registration lands with the instance/panoptic pipelines.
"""

from __future__ import annotations

import os
from typing import Dict, List

from .catalog import DatasetCatalog, MetadataCatalog

ADE20K_SEM_SEG_CATEGORIES = [
    "wall", "building", "sky", "floor", "tree", "ceiling", "road, route", "bed",
    "window ", "grass", "cabinet", "sidewalk, pavement", "person", "earth, ground",
    "door", "table", "mountain, mount", "plant", "curtain", "chair", "car",
    "water", "painting, picture", "sofa", "shelf", "house", "sea", "mirror",
    "rug", "field", "armchair", "seat", "fence", "desk", "rock, stone",
    "wardrobe, closet, press", "lamp", "tub", "rail", "cushion", "base, pedestal, stand",
    "box", "column, pillar", "signboard, sign", "chest of drawers, chest, bureau, dresser",
    "counter", "sand", "sink", "skyscraper", "fireplace", "refrigerator, icebox",
    "grandstand, covered stand", "path", "stairs", "runway",
    "case, display case, showcase, vitrine",
    "pool table, billiard table, snooker table", "pillow",
    "screen door, screen", "stairway, staircase", "river", "bridge, span",
    "bookcase", "blind, screen", "coffee table",
    "toilet, can, commode, crapper, pot, potty, stool, throne",
    "flower", "book", "hill", "bench", "countertop",
    "stove", "palm, palm tree", "kitchen island",
    "computer", "swivel chair", "boat", "bar", "arcade machine",
    "hovel, hut, hutch, shack, shanty", "bus", "towel", "light", "truck", "tower",
    "chandelier", "awning, sunshade, sunblind", "street lamp", "booth",
    "tv", "plane", "dirt track", "clothes", "pole",
    "land, ground, soil", "bannister, banister, balustrade, balusters, handrail",
    "escalator, moving staircase, moving stairway",
    "ottoman, pouf, pouffe, puff, hassock", "bottle",
    "buffet, counter, sideboard",
    "poster, posting, placard, notice, bill, card", "stage", "van", "ship",
    "fountain",
    "conveyer belt, conveyor belt, conveyer, conveyor, transporter", "canopy",
    "washer, automatic washer, washing machine", "plaything, toy", "pool",
    "stool", "barrel, cask", "basket, handbasket", "falls", "tent", "bag",
    "minibike, motorbike", "cradle", "oven", "ball", "food, solid food",
    "step, stair", "tank, storage tank", "trade name", "microwave", "pot",
    "animal", "bicycle", "lake", "dishwasher", "screen", "blanket, cover",
    "sculpture", "hood, exhaust hood", "sconce", "vase", "traffic light",
    "tray", "trash can", "fan", "pier", "crt screen", "plate", "monitor",
    "bulletin board", "shower", "radiator", "glass, drinking glass", "clock",
    "flag",
]

CITYSCAPES_SEM_SEG_CATEGORIES = [
    "road", "sidewalk", "building", "wall", "fence", "pole", "traffic light",
    "traffic sign", "vegetation", "terrain", "sky", "person", "rider", "car",
    "truck", "bus", "train", "motorcycle", "bicycle",
]


def load_sem_seg(gt_root: str, image_root: str, gt_ext="png", image_ext="jpg") -> List[Dict]:
    """Pair images with ground-truth maps by shared basename (detectron2
    load_sem_seg semantics)."""

    def strip(path, root, ext):
        rel = os.path.normpath(os.path.relpath(path, root))
        return rel[: -len(ext) - 1]

    def walk(root, ext):
        out = []
        for dirpath, _, files in os.walk(root):
            for f in files:
                if f.endswith(ext):
                    out.append(os.path.join(dirpath, f))
        return sorted(out)

    inputs = walk(image_root, image_ext)
    gts = walk(gt_root, gt_ext)
    gt_by_base = {strip(g, gt_root, gt_ext): g for g in gts}
    dataset = []
    for img in inputs:
        base = strip(img, image_root, image_ext)
        if base in gt_by_base:
            dataset.append(
                {"file_name": img, "sem_seg_file_name": gt_by_base[base]}
            )
    return dataset


def register_sem_seg(name, image_root, gt_root, classes, ignore_label=255,
                     image_ext="jpg", gt_ext="png", evaluator_type="sem_seg"):
    DatasetCatalog.register(
        name, lambda: load_sem_seg(gt_root, image_root, gt_ext, image_ext)
    )
    MetadataCatalog.get(name).set(
        stuff_classes=list(classes),
        image_root=image_root,
        sem_seg_root=gt_root,
        ignore_label=ignore_label,
        evaluator_type=evaluator_type,
        thing_dataset_id_to_contiguous_id={},
    )


def register_all_ade20k(root: str) -> None:
    """ADE20K-150 semantic (builtin.py ade20k registration)."""
    base = os.path.join(root, "ADEChallengeData2016")
    for name, split in [("train", "training"), ("val", "validation")]:
        register_sem_seg(
            f"ade20k_sem_seg_{name}",
            image_root=os.path.join(base, "images", split),
            gt_root=os.path.join(base, "annotations_detectron2", split),
            classes=ADE20K_SEM_SEG_CATEGORIES,
            ignore_label=255,
        )


def register_all_cityscapes_semantic(root: str) -> None:
    base = os.path.join(root, "cityscapes")
    for split in ["train", "val"]:
        register_sem_seg(
            f"cityscapes_fine_sem_seg_{split}",
            image_root=os.path.join(base, "leftImg8bit", split),
            gt_root=os.path.join(base, "gtFine", split),
            classes=CITYSCAPES_SEM_SEG_CATEGORIES,
            ignore_label=255,
            image_ext="png",
            evaluator_type="cityscapes_sem_seg",
        )


_REGISTERED = False


def register_all_builtin(root: str = "") -> None:
    """Register everything under $DETECTRON2_DATASETS (builtin.py pattern)."""
    global _REGISTERED
    if _REGISTERED:
        return
    _REGISTERED = True
    root = root or os.environ.get("DETECTRON2_DATASETS", "datasets")
    register_all_ade20k(root)
    register_all_cityscapes_semantic(root)
    from .datasets_coco import (
        register_cityscapes_panoptic,
        register_coco,
        register_coco_stuff_171,
        register_coco_stuff_semseg,
    )

    register_coco(root)
    register_coco_stuff_semseg(root)
    register_coco_stuff_171(root)
    register_cityscapes_panoptic(root)
