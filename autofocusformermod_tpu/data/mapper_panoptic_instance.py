"""Panoptic and instance dataset mappers.

Rebuilds of reference mask2former/data/dataset_mappers/
mask_former_panoptic_dataset_mapper.py (panoptic png + segments_info ->
per-segment binary masks) and mask_former_instance_dataset_mapper.py
(polygon/bitmask instance gt), plus the COCO "new baseline" LSJ mappers
(coco_instance_new_baseline_dataset_mapper.py / panoptic: large-scale jitter
0.1-2.0 then fixed-size crop, config.py:148-150).

All emit the static-shape target dict {labels (t,), masks (t, H, W),
valid (t,)} padded to ``max_gt``.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np
from PIL import Image

from . import transforms as T
from .mapper_semantic import read_image


def rgb2id(color: np.ndarray) -> np.ndarray:
    """COCO panoptic png encoding (panopticapi.utils.rgb2id)."""
    color = color.astype(np.int64)
    return color[..., 0] + 256 * color[..., 1] + 256 * 256 * color[..., 2]


def polygons_to_mask(polygons: List, h: int, w: int) -> np.ndarray:
    import cv2

    mask = np.zeros((h, w), np.uint8)
    pts = [np.asarray(p, np.float64).reshape(-1, 2).round().astype(np.int32)
           for p in polygons]
    cv2.fillPoly(mask, pts, 1)
    return mask.astype(np.float32)


def _pad_targets(labels, masks, image_hw, max_gt):
    t = max_gt
    out_labels = np.zeros((t,), np.int32)
    # uint8: the jitted step casts on device (host never touches float pixels)
    out_masks = np.zeros((t,) + tuple(image_hw), np.uint8)
    out_valid = np.zeros((t,), bool)
    for i, (l, m) in enumerate(zip(labels[:t], masks[:t])):
        out_labels[i] = l
        out_masks[i] = m
        out_valid[i] = True
    return {"labels": out_labels, "masks": out_masks, "valid": out_valid}


class MaskFormerPanopticDatasetMapper:
    """Panoptic png + segments_info -> per-segment targets (reference
    mask_former_panoptic_dataset_mapper.py)."""

    def __init__(self, is_train=True, *, min_size_train=(512,), max_size_train=2048,
                 min_size_test=512, max_size_test=2048, crop_enabled=True,
                 crop_size=(512, 512), color_aug_ssd=True, size_divisibility=512,
                 ignore_label=255, max_gt=100, seed=0):
        self.is_train = is_train
        self.min_size_train = list(min_size_train)
        self.max_size_train = max_size_train
        self.min_size_test = min_size_test
        self.max_size_test = max_size_test
        self.crop_enabled = crop_enabled
        self.crop_size = tuple(crop_size)
        self.color_aug_ssd = color_aug_ssd
        self.size_divisibility = size_divisibility
        self.ignore_label = ignore_label
        self.max_gt = max_gt
        self.rng = np.random.default_rng(seed)

    @classmethod
    def from_config(cls, cfg, is_train=True, seed=0):
        return cls(
            is_train=is_train,
            min_size_train=cfg.INPUT.MIN_SIZE_TRAIN,
            max_size_train=cfg.INPUT.MAX_SIZE_TRAIN,
            min_size_test=cfg.INPUT.MIN_SIZE_TEST,
            max_size_test=cfg.INPUT.MAX_SIZE_TEST,
            crop_enabled=cfg.INPUT.CROP.ENABLED,
            crop_size=cfg.INPUT.CROP.SIZE,
            color_aug_ssd=cfg.INPUT.COLOR_AUG_SSD,
            size_divisibility=max(cfg.INPUT.SIZE_DIVISIBILITY, 0),
            ignore_label=cfg.MODEL.SEM_SEG_HEAD.IGNORE_VALUE,
            max_gt=cfg.TPU.MAX_GT_INSTANCES,
            seed=seed,
        )

    def __call__(self, dataset_dict: Dict) -> Dict:
        img = read_image(dataset_dict["file_name"])
        pan = np.asarray(Image.open(dataset_dict["pan_seg_file_name"]).convert("RGB"))
        pan_id = rgb2id(pan).astype(np.int64)
        segments_info = dataset_dict["segments_info"]
        orig_h, orig_w = img.shape[:2]

        if self.is_train:
            short = int(self.rng.choice(self.min_size_train))
            img, pan_id = T.resize_shortest_edge(
                img, pan_id.astype(np.int32), short, self.max_size_train
            )
            if self.crop_enabled:
                img, pan_id = T.random_crop_with_category_constraint(
                    self.rng, img, pan_id, self.crop_size
                )
            if self.color_aug_ssd:
                img = T.color_aug_ssd(self.rng, img)
            img, pan_id = T.hflip(self.rng, img, pan_id)
            target_hw = (
                max(self.crop_size[0], self.size_divisibility or 0),
                max(self.crop_size[1], self.size_divisibility or 0),
            )
            img, pan_id = T.pad_to_size(img, pan_id, target_hw, 128, 0)
        else:
            img, pan_id = T.resize_shortest_edge(
                img, pan_id.astype(np.int32), self.min_size_test, self.max_size_test
            )

        out = {
            "image": np.ascontiguousarray(img.astype(np.uint8)),
            "height": dataset_dict.get("height", orig_h),
            "width": dataset_dict.get("width", orig_w),
            "image_hw": img.shape[:2],
            "file_name": dataset_dict["file_name"],
        }
        if not self.is_train:
            out["pan_seg"] = pan_id
            out["segments_info"] = segments_info
            return out

        labels, masks = [], []
        for seg in segments_info:
            if seg.get("iscrowd", 0):
                continue
            m = (pan_id == seg["id"]).astype(np.float32)
            if m.sum() == 0:
                continue
            labels.append(seg["category_id"])
            masks.append(m)
        out.update(_pad_targets(labels, masks, img.shape[:2], self.max_gt))
        return out


class MaskFormerInstanceDatasetMapper:
    """Instance gt (polygons or bitmasks) -> targets (reference
    mask_former_instance_dataset_mapper.py)."""

    def __init__(self, is_train=True, *, min_size_train=(512,), max_size_train=2048,
                 min_size_test=512, max_size_test=2048, crop_enabled=True,
                 crop_size=(512, 512), color_aug_ssd=True, size_divisibility=512,
                 max_gt=100, seed=0):
        self.is_train = is_train
        self.min_size_train = list(min_size_train)
        self.max_size_train = max_size_train
        self.min_size_test = min_size_test
        self.max_size_test = max_size_test
        self.crop_enabled = crop_enabled
        self.crop_size = tuple(crop_size)
        self.color_aug_ssd = color_aug_ssd
        self.size_divisibility = size_divisibility
        self.max_gt = max_gt
        self.rng = np.random.default_rng(seed)

    def _annotation_masks(self, annos, h, w):
        labels, masks = [], []
        for a in annos:
            if a.get("iscrowd", 0):
                continue
            seg = a.get("segmentation")
            if seg is None:
                continue
            if isinstance(seg, list):
                m = polygons_to_mask(seg, h, w)
            elif isinstance(seg, dict):  # RLE
                m = rle_decode(seg).astype(np.float32)
            else:
                m = np.asarray(seg, np.float32)
            labels.append(a["category_id"])
            masks.append(m)
        return labels, masks

    def __call__(self, dataset_dict: Dict) -> Dict:
        img = read_image(dataset_dict["file_name"])
        orig_h, orig_w = img.shape[:2]
        labels, masks = self._annotation_masks(
            dataset_dict.get("annotations", []), orig_h, orig_w
        )
        import cv2

        if self.is_train:
            short = int(self.rng.choice(self.min_size_train))
            scale = short / min(orig_h, orig_w)
            if max(orig_h, orig_w) * scale > self.max_size_train:
                scale = self.max_size_train / max(orig_h, orig_w)
            nh, nw = int(round(orig_h * scale)), int(round(orig_w * scale))
            img = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
            masks = [
                cv2.resize(m, (nw, nh), interpolation=cv2.INTER_NEAREST) for m in masks
            ]
            if self.crop_enabled:
                ch = min(self.crop_size[0], nh)
                cw = min(self.crop_size[1], nw)
                y = int(self.rng.integers(0, nh - ch + 1))
                x = int(self.rng.integers(0, nw - cw + 1))
                img = img[y : y + ch, x : x + cw]
                masks = [m[y : y + ch, x : x + cw] for m in masks]
            if self.color_aug_ssd:
                img = T.color_aug_ssd(self.rng, img)
            if self.rng.integers(2):
                img = img[:, ::-1]
                masks = [m[:, ::-1] for m in masks]
            target_hw = (
                max(self.crop_size[0], self.size_divisibility or 0),
                max(self.crop_size[1], self.size_divisibility or 0),
            )
            img, _ = T.pad_to_size(img, None, target_hw, 128)
            masks = [
                np.pad(m, ((0, target_hw[0] - m.shape[0]), (0, target_hw[1] - m.shape[1])))
                for m in masks
            ]
            # drop emptied masks
            keep = [i for i, m in enumerate(masks) if m.sum() > 0]
            labels = [labels[i] for i in keep]
            masks = [masks[i] for i in keep]
        else:
            img, _ = T.resize_shortest_edge(img, None, self.min_size_test, self.max_size_test)

        out = {
            "image": np.ascontiguousarray(img.astype(np.uint8)),
            "height": dataset_dict.get("height", orig_h),
            "width": dataset_dict.get("width", orig_w),
            "image_hw": img.shape[:2],
            "file_name": dataset_dict["file_name"],
            "image_id": dataset_dict.get("image_id", 0),
        }
        if self.is_train:
            out.update(_pad_targets(labels, masks, img.shape[:2], self.max_gt))
        return out


class COCOInstanceLSJDatasetMapper(MaskFormerInstanceDatasetMapper):
    """COCO new-baseline mapper: large-scale jitter to a fixed square canvas
    (coco_instance_new_baseline_dataset_mapper.py; config.py:148-150)."""

    def __init__(self, is_train=True, *, image_size=1024, min_scale=0.1,
                 max_scale=2.0, max_gt=100, seed=0, **kw):
        super().__init__(is_train=is_train, max_gt=max_gt, seed=seed, **kw)
        self.image_size = image_size
        self.min_scale = min_scale
        self.max_scale = max_scale

    def __call__(self, dataset_dict: Dict) -> Dict:
        import cv2

        img = read_image(dataset_dict["file_name"])
        orig_h, orig_w = img.shape[:2]
        labels, masks = self._annotation_masks(
            dataset_dict.get("annotations", []), orig_h, orig_w
        )
        out_meta = {
            "height": dataset_dict.get("height", orig_h),
            "width": dataset_dict.get("width", orig_w),
            "file_name": dataset_dict["file_name"],
            "image_id": dataset_dict.get("image_id", 0),
        }
        if not self.is_train:
            img, _ = T.resize_shortest_edge(img, None, self.min_size_test, self.max_size_test)
            return {"image": np.ascontiguousarray(img.astype(np.uint8)), "image_hw": img.shape[:2], **out_meta}

        s = self.image_size
        scale = self.rng.uniform(self.min_scale, self.max_scale)
        ratio = s / max(orig_h, orig_w) * scale
        nh, nw = max(1, int(orig_h * ratio)), max(1, int(orig_w * ratio))
        img = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
        masks = [cv2.resize(m, (nw, nh), interpolation=cv2.INTER_NEAREST) for m in masks]
        if self.rng.integers(2):
            img = img[:, ::-1]
            masks = [m[:, ::-1] for m in masks]
        y = int(self.rng.integers(0, max(1, nh - s + 1)))
        x = int(self.rng.integers(0, max(1, nw - s + 1)))
        img = img[y : y + s, x : x + s]
        masks = [m[y : y + s, x : x + s] for m in masks]
        img, _ = T.pad_to_size(img, None, (s, s), 128)
        masks = [
            np.pad(m, ((0, s - m.shape[0]), (0, s - m.shape[1]))) for m in masks
        ]
        keep = [i for i, m in enumerate(masks) if m.sum() > 0]
        out = {"image": np.ascontiguousarray(img.astype(np.uint8)), "image_hw": (s, s), **out_meta}
        out.update(
            _pad_targets([labels[i] for i in keep], [masks[i] for i in keep],
                         (s, s), self.max_gt)
        )
        return out


def rle_decode(rle: Dict) -> np.ndarray:
    """Decode uncompressed COCO RLE {counts: [...], size: [h, w]}."""
    h, w = rle["size"]
    counts = rle["counts"]
    if isinstance(counts, str):
        counts = _decode_compressed_rle_counts(counts)
    flat = np.zeros(h * w, np.uint8)
    pos = 0
    val = 0
    for c in counts:
        if val:
            flat[pos : pos + c] = 1
        pos += c
        val ^= 1
    return flat.reshape(w, h).T  # COCO RLE is column-major


def _decode_compressed_rle_counts(s: str) -> List[int]:
    """LEB128-style COCO compressed RLE string decoder (pycocotools format)."""
    counts = []
    i = 0
    while i < len(s):
        x = 0
        k = 0
        more = True
        while more:
            c = ord(s[i]) - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            i += 1
            k += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k)
        if len(counts) > 2:
            x += counts[-2]
        counts.append(x)
    return counts
