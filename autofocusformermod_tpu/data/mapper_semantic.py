"""MaskFormer semantic dataset mapper.

Rebuild of reference mask2former/data/dataset_mappers/
mask_former_semantic_dataset_mapper.py:62-185: read image + semseg png ->
multi-scale ResizeShortestEdge -> category-constrained RandomCrop ->
ColorAugSSD -> flip -> pad to size_divisibility (img 128, gt 255) -> per-class
binary masks.

Static-shape addition for TPU: masks are padded to ``max_gt`` instance slots
with a validity mask, so every batch has identical shapes.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np
from PIL import Image

from . import transforms as T


def read_image(path: str) -> np.ndarray:
    return np.asarray(Image.open(path).convert("RGB"))


def read_sem_seg(path: str) -> np.ndarray:
    return np.asarray(Image.open(path)).astype(np.int64)


# Caffe-shifted dataset ids the COCO semantic mappers send to ignore
# (reference coco_semantic_dataset_mapper2.py:97-107: street sign, hat, shoe,
# eye glasses, plate, mirror, window, desk, door, blender, hair brush).
_COCO_STUFF_REMOVED_DATASET_IDS = (11, 25, 28, 29, 44, 65, 67, 68, 70, 82, 90)


def stuff_remap_lut(data_id_to_cont_id: Dict[int, int],
                    ignore_label: int = 255) -> np.ndarray:
    """256-entry lookup table mapping caffe-shifted COCO-stuff png values to
    contiguous train ids (reference coco_semantic_dataset_mapper2.py:92-107 +
    :163-169).  Unknown values (incl. the 11 removed classes and the ignore
    label itself) map to ignore."""
    lut = np.full(256, ignore_label, np.int64)
    for did, cid in data_id_to_cont_id.items():
        if 0 <= did < 256:
            lut[did] = cid
    for did in _COCO_STUFF_REMOVED_DATASET_IDS:
        lut[did] = ignore_label
    lut[ignore_label] = ignore_label
    return lut


def _remap_lut_from_cfg(cfg, is_train: bool) -> Optional[np.ndarray]:
    """Build the stuff remap LUT from the active dataset's metadata when the
    config selects a coco_semantic* mapper (those pngs carry raw dataset
    ids); None for every other pipeline."""
    if not cfg.INPUT.DATASET_MAPPER_NAME.startswith("coco_semantic"):
        return None
    from .catalog import MetadataCatalog

    names = cfg.DATASETS.TRAIN if is_train else cfg.DATASETS.TEST
    if not names:
        return None
    meta = MetadataCatalog.get(names[0])
    mapping = meta.get("stuff_dataset_id_to_contiguous_id")
    if not mapping:
        return None
    return stuff_remap_lut(mapping, meta.get("ignore_label", 255))


class MaskFormerSemanticDatasetMapper:
    def __init__(
        self,
        is_train: bool = True,
        *,
        min_size_train: Sequence[int] = (512,),
        max_size_train: int = 2048,
        min_size_test: int = 512,
        max_size_test: int = 2048,
        crop_enabled: bool = True,
        crop_size=(512, 512),
        single_category_max_area: float = 1.0,
        color_aug_ssd: bool = True,
        size_divisibility: int = 512,
        ignore_label: int = 255,
        max_gt: int = 100,
        seed: int = 0,
        dataset_id_remap: Optional[np.ndarray] = None,
    ):
        self.is_train = is_train
        self.min_size_train = list(min_size_train)
        self.max_size_train = max_size_train
        self.min_size_test = min_size_test
        self.max_size_test = max_size_test
        self.crop_enabled = crop_enabled
        self.crop_size = tuple(crop_size)
        self.single_category_max_area = single_category_max_area
        self.color_aug_ssd = color_aug_ssd
        self.size_divisibility = size_divisibility
        self.ignore_label = ignore_label
        self.max_gt = max_gt
        self.rng = np.random.default_rng(seed)
        self.dataset_id_remap = dataset_id_remap

    @classmethod
    def from_config(cls, cfg, is_train: bool = True, seed: int = 0):
        return cls(
            is_train=is_train,
            dataset_id_remap=_remap_lut_from_cfg(cfg, is_train),
            min_size_train=cfg.INPUT.MIN_SIZE_TRAIN,
            max_size_train=cfg.INPUT.MAX_SIZE_TRAIN,
            min_size_test=cfg.INPUT.MIN_SIZE_TEST,
            max_size_test=cfg.INPUT.MAX_SIZE_TEST,
            crop_enabled=cfg.INPUT.CROP.ENABLED,
            crop_size=cfg.INPUT.CROP.SIZE,
            single_category_max_area=cfg.INPUT.CROP.SINGLE_CATEGORY_MAX_AREA,
            color_aug_ssd=cfg.INPUT.COLOR_AUG_SSD,
            size_divisibility=cfg.INPUT.SIZE_DIVISIBILITY,
            ignore_label=cfg.MODEL.SEM_SEG_HEAD.IGNORE_VALUE,
            max_gt=cfg.TPU.MAX_GT_INSTANCES,
            seed=seed,
        )

    def __call__(self, dataset_dict: Dict) -> Dict:
        img = read_image(dataset_dict["file_name"])
        sem_seg = read_sem_seg(dataset_dict["sem_seg_file_name"])
        if self.dataset_id_remap is not None:
            # dataset png ids -> contiguous train ids, BEFORE any transform
            # (reference coco_semantic_dataset_mapper.py:144-153)
            sem_seg = self.dataset_id_remap[np.clip(sem_seg, 0, 255)]
        orig_h, orig_w = img.shape[:2]

        if self.is_train:
            short = int(self.rng.choice(self.min_size_train))
            img, sem_seg = T.resize_shortest_edge(
                img, sem_seg, short, self.max_size_train
            )
            if self.crop_enabled:
                img, sem_seg = T.random_crop_with_category_constraint(
                    self.rng, img, sem_seg, self.crop_size,
                    self.single_category_max_area, self.ignore_label,
                )
            if self.color_aug_ssd:
                img = T.color_aug_ssd(self.rng, img)
            img, sem_seg = T.hflip(self.rng, img, sem_seg)
            if self.size_divisibility > 0:
                # pad to the fixed crop size for static shapes, then to
                # divisibility (reference pads to size_divisibility only)
                img, sem_seg = T.pad_to_size(
                    img, sem_seg,
                    (max(self.crop_size[0], self.size_divisibility),
                     max(self.crop_size[1], self.size_divisibility)),
                    128, self.ignore_label,
                )
        else:
            img, sem_seg = T.resize_shortest_edge(
                img, sem_seg, self.min_size_test, self.max_size_test
            )

        image_hw = img.shape[:2]

        # north star "the host never touches float pixels": images stay uint8
        # until the jitted step casts+normalizes on device, and binary
        # per-class masks are DERIVED ON DEVICE from the uint8 sem_seg map
        # (the host ships H*W bytes instead of t*H*W floats)
        out = {
            "image": np.ascontiguousarray(img),          # uint8 HWC
            "height": dataset_dict.get("height", orig_h),
            "width": dataset_dict.get("width", orig_w),
            "image_hw": image_hw,
            "file_name": dataset_dict["file_name"],
        }

        if not self.is_train:
            out["sem_seg"] = sem_seg
            return out

        # per-class label list, padded to max_gt (reference :166-185); the
        # (t, H, W) mask stack is labels[:, None, None] == sem_seg on device
        out.update(_pack_class_targets(sem_seg, self.ignore_label, self.max_gt))
        return out


def _pack_class_targets(sem_seg: np.ndarray, ignore_label: int,
                        max_gt: int) -> Dict:
    classes = np.unique(sem_seg)
    classes = classes[classes != ignore_label]
    labels = np.zeros((max_gt,), np.int32)
    valid = np.zeros((max_gt,), bool)
    for i, c in enumerate(classes[:max_gt]):
        labels[i] = c
        valid[i] = True
    return {
        "labels": labels,
        "valid": valid,
        "sem_seg_map": sem_seg.astype(
            np.uint8 if ignore_label <= 255 else np.int32
        ),
    }


class COCOSemanticLSJDatasetMapper:
    """coco_semantic2 mapper (reference coco_semantic_dataset_mapper2.py):
    flip -> ResizeScale(min/max_scale to INPUT.IMAGE_SIZE) -> fixed-size
    random crop/pad — the LSJ recipe — with caffe-shifted dataset ids
    remapped to contiguous train ids before the transforms.  Train-only,
    like the reference (its __call__ asserts is_train)."""

    def __init__(
        self,
        *,
        image_size: int = 1024,
        min_scale: float = 0.1,
        max_scale: float = 2.0,
        random_flip: str = "horizontal",
        size_divisibility: int = 32,
        ignore_label: int = 255,
        max_gt: int = 100,
        seed: int = 0,
        dataset_id_remap: Optional[np.ndarray] = None,
    ):
        self.is_train = True
        self.image_size = image_size
        self.min_scale = min_scale
        self.max_scale = max_scale
        self.random_flip = random_flip
        self.size_divisibility = size_divisibility
        self.ignore_label = ignore_label
        self.max_gt = max_gt
        self.rng = np.random.default_rng(seed)
        self.dataset_id_remap = dataset_id_remap

    @classmethod
    def from_config(cls, cfg, is_train: bool = True, seed: int = 0):
        assert is_train, "coco_semantic2 only supports training augmentation"
        return cls(
            image_size=cfg.INPUT.IMAGE_SIZE,
            min_scale=cfg.INPUT.MIN_SCALE,
            max_scale=cfg.INPUT.MAX_SCALE,
            random_flip=cfg.INPUT.RANDOM_FLIP,
            size_divisibility=cfg.INPUT.SIZE_DIVISIBILITY,
            ignore_label=cfg.MODEL.SEM_SEG_HEAD.IGNORE_VALUE,
            max_gt=cfg.TPU.MAX_GT_INSTANCES,
            seed=seed,
            dataset_id_remap=_remap_lut_from_cfg(cfg, is_train),
        )

    def __call__(self, dataset_dict: Dict) -> Dict:
        img = read_image(dataset_dict["file_name"])
        sem_seg = read_sem_seg(dataset_dict["sem_seg_file_name"])
        if self.dataset_id_remap is not None:
            sem_seg = self.dataset_id_remap[np.clip(sem_seg, 0, 255)]
        orig_h, orig_w = img.shape[:2]

        if self.random_flip != "none":
            img, sem_seg = T.hflip(self.rng, img, sem_seg)
        img, sem_seg = T.large_scale_jitter(
            self.rng, img, sem_seg, self.image_size,
            self.min_scale, self.max_scale, seg_value=self.ignore_label,
        )
        if self.size_divisibility > 0:
            img, sem_seg = T.pad_to_divisibility(
                img, sem_seg, self.size_divisibility, 128, self.ignore_label
            )

        out = {
            "image": np.ascontiguousarray(img),
            "height": dataset_dict.get("height", orig_h),
            "width": dataset_dict.get("width", orig_w),
            "image_hw": img.shape[:2],
            "file_name": dataset_dict["file_name"],
        }
        out.update(_pack_class_targets(sem_seg, self.ignore_label, self.max_gt))
        return out
