"""Numpy/cv2 augmentations mirroring the detectron2 transforms the reference
mappers use (mask_former_semantic_dataset_mapper.py:62-185): multi-scale
ResizeShortestEdge, category-area-constrained RandomCrop, SSD color jitter,
horizontal flip, pad-to-divisibility, and large-scale jitter for the COCO
"new baseline" mappers (config.py:148-150).

All transforms are host-side numpy on uint8; the device never sees
un-normalized pixels after the batch leaves the loader.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import cv2
import numpy as np


def resize_shortest_edge(
    img: np.ndarray,
    sem_seg: Optional[np.ndarray],
    short_edge: int,
    max_size: int,
):
    h, w = img.shape[:2]
    scale = short_edge / min(h, w)
    if max(h, w) * scale > max_size:
        scale = max_size / max(h, w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    img = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
    if sem_seg is not None:
        sem_seg = cv2.resize(sem_seg, (nw, nh), interpolation=cv2.INTER_NEAREST)
    return img, sem_seg


def random_crop_with_category_constraint(
    rng: np.random.Generator,
    img: np.ndarray,
    sem_seg: Optional[np.ndarray],
    crop_hw: Tuple[int, int],
    single_category_max_area: float = 1.0,
    ignore_value: int = 255,
):
    """detectron2 RandomCrop_CategoryAreaConstraint: retry the crop up to 10
    times until no single category fills more than the given fraction."""
    h, w = img.shape[:2]
    ch, cw = min(crop_hw[0], h), min(crop_hw[1], w)

    def sample():
        y = rng.integers(0, h - ch + 1)
        x = rng.integers(0, w - cw + 1)
        return int(y), int(x)

    y, x = sample()
    if sem_seg is not None and single_category_max_area < 1.0:
        for _ in range(10):
            crop = sem_seg[y : y + ch, x : x + cw]
            labels, cnt = np.unique(crop, return_counts=True)
            cnt = cnt[labels != ignore_value]
            if len(cnt) > 1 and cnt.max() < single_category_max_area * cnt.sum():
                break
            y, x = sample()
    img = img[y : y + ch, x : x + cw]
    if sem_seg is not None:
        sem_seg = sem_seg[y : y + ch, x : x + cw]
    return img, sem_seg


def color_aug_ssd(rng: np.random.Generator, img: np.ndarray) -> np.ndarray:
    """SSD photometric distortion (detectron2 ColorAugSSDTransform): random
    brightness (+-32), contrast (0.5-1.5) applied first or last, saturation
    (0.5-1.5), hue (+-18 degrees).  img: uint8 RGB."""
    img = img.astype(np.float32)

    def brightness(x):
        if rng.integers(2):
            x = x + rng.uniform(-32, 32)
        return x

    def contrast(x):
        if rng.integers(2):
            x = x * rng.uniform(0.5, 1.5)
        return x

    def saturation_hue(x):
        x8 = np.clip(x, 0, 255).astype(np.uint8)
        hsv = cv2.cvtColor(x8, cv2.COLOR_RGB2HSV).astype(np.float32)
        if rng.integers(2):
            hsv[..., 1] *= rng.uniform(0.5, 1.5)
        if rng.integers(2):
            hsv[..., 0] = (hsv[..., 0] + rng.uniform(-18, 18)) % 180
        hsv[..., 1] = np.clip(hsv[..., 1], 0, 255)
        return cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2RGB).astype(np.float32)

    img = brightness(img)
    if rng.integers(2):
        img = contrast(img)
        img = saturation_hue(img)
    else:
        img = saturation_hue(img)
        img = contrast(img)
    return np.clip(img, 0, 255).astype(np.uint8)


def hflip(rng: np.random.Generator, img, sem_seg):
    if rng.integers(2):
        img = img[:, ::-1]
        if sem_seg is not None:
            sem_seg = sem_seg[:, ::-1]
    return img, sem_seg


def pad_to_size(
    img: np.ndarray,
    sem_seg: Optional[np.ndarray],
    size_hw: Tuple[int, int],
    img_value: int = 128,
    seg_value: int = 255,
):
    """Pad bottom/right to the target size (mapper pads image with 128 and gt
    with the ignore value)."""
    h, w = img.shape[:2]
    ph, pw = max(0, size_hw[0] - h), max(0, size_hw[1] - w)
    if ph or pw:
        img = np.pad(
            img, ((0, ph), (0, pw), (0, 0)), constant_values=img_value
        )
        if sem_seg is not None:
            sem_seg = np.pad(sem_seg, ((0, ph), (0, pw)), constant_values=seg_value)
    return img, sem_seg


def pad_to_divisibility(img, sem_seg, divisibility: int, img_value=128, seg_value=255):
    h, w = img.shape[:2]
    th = -(-h // divisibility) * divisibility
    tw = -(-w // divisibility) * divisibility
    return pad_to_size(img, sem_seg, (th, tw), img_value, seg_value)


def large_scale_jitter(
    rng: np.random.Generator,
    img: np.ndarray,
    sem_seg: Optional[np.ndarray],
    image_size: int,
    min_scale: float = 0.1,
    max_scale: float = 2.0,
    seg_value: int = 255,
):
    """LSJ augmentation for the COCO new-baseline mappers: random global scale,
    then fixed-size random crop/pad to image_size x image_size."""
    scale = rng.uniform(min_scale, max_scale)
    h, w = img.shape[:2]
    out = image_size
    ratio = out / max(h, w) * scale
    nh, nw = max(1, int(h * ratio)), max(1, int(w * ratio))
    img = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
    if sem_seg is not None:
        sem_seg = cv2.resize(sem_seg, (nw, nh), interpolation=cv2.INTER_NEAREST)
    img, sem_seg = random_crop_with_category_constraint(
        rng, img, sem_seg, (out, out)
    )
    return pad_to_size(img, sem_seg, (out, out), 128, seg_value)
