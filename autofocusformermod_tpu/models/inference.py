"""Inference post-processing: semantic / panoptic / instance.

Rebuild of reference maskformer_model.py:281-381.  The reference's panoptic
inference loops over queries in Python on the host (:310-341); here the loop
is vectorized exactly — pixels are partitioned by the prob-mask argmax, so
per-query bookkeeping (areas, overlap filtering, stuff merging, sequential
segment ids) reduces to cumulative array ops — and runs jitted on device.
Only the final segments_info list is assembled on host from small arrays.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def semantic_inference(mask_cls: jnp.ndarray, mask_pred: jnp.ndarray) -> jnp.ndarray:
    """(q, nc+1), (q, h, w) -> (nc, h, w) (maskformer_model.py:281-285)."""
    cls = jax.nn.softmax(mask_cls, axis=-1)[..., :-1]
    masks = jax.nn.sigmoid(mask_pred)
    return jnp.einsum("qc,qhw->chw", cls, masks)


@functools.partial(jax.jit, static_argnames=("num_classes",))
def panoptic_inference_arrays(
    mask_cls: jnp.ndarray,
    mask_pred: jnp.ndarray,
    is_thing: jnp.ndarray,
    num_classes: int,
    object_mask_threshold: float = 0.8,
    overlap_threshold: float = 0.8,
):
    """Vectorized panoptic inference for one image.

    mask_cls  - (q, nc+1) logits; mask_pred - (q, h, w) logits
    is_thing  - (nc,) bool lookup
    Returns (panoptic_seg (h, w) int32,
             seg_valid (q,) bool   - query opened a new segment,
             seg_id    (q,) int32  - the segment id each query maps to,
             seg_class (q,) int32, seg_isthing (q,) bool).
    """
    q = mask_cls.shape[0]
    probs = jax.nn.softmax(mask_cls, axis=-1)
    scores = jnp.max(probs, axis=-1)
    labels = jnp.argmax(probs, axis=-1)

    keep = (labels != num_classes) & (scores > object_mask_threshold)
    cur_masks = jax.nn.sigmoid(mask_pred)               # (q, h, w)
    # excluded queries must not win the argmax
    cur_prob_masks = jnp.where(
        keep[:, None, None], scores[:, None, None] * cur_masks, -1.0
    )
    cur_mask_ids = jnp.argmax(cur_prob_masks, axis=0)   # (h, w)
    any_kept = jnp.any(keep)

    binary = cur_masks >= 0.5                           # (q, h, w)
    one_hot_win = (
        cur_mask_ids[None, :, :] == jnp.arange(q)[:, None, None]
    )                                                    # (q, h, w)
    mask_area = jnp.sum(one_hot_win, axis=(1, 2)).astype(jnp.float32)
    original_area = jnp.sum(binary, axis=(1, 2)).astype(jnp.float32)
    inter = jnp.sum(one_hot_win & binary, axis=(1, 2))

    valid = (
        keep
        & (mask_area > 0)
        & (original_area > 0)
        & (inter > 0)
        & (mask_area / jnp.maximum(original_area, 1.0) >= overlap_threshold)
        & any_kept
    )

    cls = jnp.clip(labels, 0, num_classes - 1)
    isthing = is_thing[cls] & (labels != num_classes)

    # stuff merging: all valid stuff queries of one class share the first
    # valid query's segment (maskformer_model.py:324-331)
    qi = jnp.arange(q)
    same_class_valid = valid[None, :] & (labels[None, :] == labels[:, None])
    first_same = jnp.argmax(
        jnp.where(same_class_valid, 1, 0)
        * jnp.where(qi[None, :] <= qi[:, None], 1, 0)
        * (q - qi[None, :]),
        axis=1,
    )  # earliest valid same-class query index <= self
    rep = jnp.where(isthing, qi, jnp.where(valid, first_same, qi))

    is_new = valid & (rep == qi)
    seg_num = jnp.cumsum(is_new.astype(jnp.int32))      # 1-based ids at new segs
    seg_id_own = jnp.where(is_new, seg_num, 0)
    seg_id = jnp.where(valid, seg_id_own[rep], 0).astype(jnp.int32)

    pix_q = cur_mask_ids                                 # (h, w)
    pix_valid = (
        jnp.take(valid, pix_q)
        & jnp.take_along_axis(
            binary, pix_q[None], axis=0
        )[0]
    )
    panoptic = jnp.where(pix_valid, jnp.take(seg_id, pix_q), 0).astype(jnp.int32)
    return panoptic, is_new, seg_id, cls.astype(jnp.int32), isthing


def panoptic_inference(
    mask_cls,
    mask_pred,
    thing_ids: set,
    num_classes: int,
    object_mask_threshold: float = 0.8,
    overlap_threshold: float = 0.8,
) -> Tuple[np.ndarray, List[Dict]]:
    """Host wrapper returning (panoptic_seg, segments_info) like the reference."""
    is_thing = np.zeros((num_classes,), bool)
    for t in thing_ids:
        if 0 <= t < num_classes:
            is_thing[t] = True
    panoptic, is_new, seg_id, cls, isthing = panoptic_inference_arrays(
        jnp.asarray(mask_cls), jnp.asarray(mask_pred), jnp.asarray(is_thing),
        num_classes, object_mask_threshold, overlap_threshold,
    )
    is_new = np.asarray(is_new)
    seg_id = np.asarray(seg_id)
    cls = np.asarray(cls)
    isthing = np.asarray(isthing)
    segments_info = [
        {
            "id": int(seg_id[k]),
            "isthing": bool(isthing[k]),
            "category_id": int(cls[k]),
        }
        for k in np.nonzero(is_new)[0]
    ]
    return np.asarray(panoptic), segments_info


@functools.partial(jax.jit, static_argnames=("num_classes", "topk", "panoptic_on"))
def instance_inference(
    mask_cls: jnp.ndarray,
    mask_pred: jnp.ndarray,
    is_thing: jnp.ndarray,
    num_classes: int,
    topk: int = 100,
    panoptic_on: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Vectorized instance inference (maskformer_model.py:345-381).

    Returns dict with 'scores' (topk,), 'labels' (topk,), 'masks'
    (topk, h, w) bool, 'valid' (topk,) — invalid rows (thing-filtered) have
    score 0, mirroring the reference's boolean filtering with static shapes.
    """
    q = mask_cls.shape[0]
    scores = jax.nn.softmax(mask_cls, axis=-1)[:, :-1]   # (q, nc)
    flat = scores.reshape(-1)
    top_scores, top_idx = jax.lax.top_k(flat, topk)
    labels = top_idx % num_classes
    query_idx = top_idx // num_classes
    masks = jnp.take(mask_pred, query_idx, axis=0)       # (topk, h, w)

    valid = jnp.ones_like(top_scores, bool)
    if panoptic_on:
        valid = is_thing[labels]

    binary = (masks > 0).astype(jnp.float32)
    mask_probs = jax.nn.sigmoid(masks)
    mask_scores = jnp.sum(mask_probs * binary, axis=(1, 2)) / (
        jnp.sum(binary, axis=(1, 2)) + 1e-6
    )
    final_scores = jnp.where(valid, top_scores * mask_scores, 0.0)
    return {
        "scores": final_scores,
        "labels": labels.astype(jnp.int32),
        "masks": binary.astype(bool),
        "valid": valid,
    }


def sliding_window_grid(img_hw, crop_hw, stride_hw) -> List[Tuple[int, int, int, int]]:
    """Crop windows (y1, x1, y2, x2) covering the padded image, mirroring the
    reference grid (maskfiner_oracle_teacher_model_sw.py:217-243): when the
    crop exceeds the image the crop/stride collapse to min(h, w); edge crops
    are shifted inward so every window is exactly crop-sized (static shape —
    one XLA compilation covers all windows)."""
    h_img, w_img = int(img_hw[0]), int(img_hw[1])
    h_crop, w_crop = int(crop_hw[0]), int(crop_hw[1])
    h_stride, w_stride = int(stride_hw[0]), int(stride_hw[1])
    if h_crop > h_img or w_crop > w_img:
        sw = min(h_img, w_img)
        h_crop = w_crop = h_stride = w_stride = sw
    h_grids = max(h_img - h_crop + h_stride - 1, 0) // h_stride + 1
    w_grids = max(w_img - w_crop + w_stride - 1, 0) // w_stride + 1
    windows = []
    for h_idx in range(h_grids):
        for w_idx in range(w_grids):
            y2 = min(h_idx * h_stride + h_crop, h_img)
            x2 = min(w_idx * w_stride + w_crop, w_img)
            y1 = max(y2 - h_crop, 0)
            x1 = max(x2 - w_crop, 0)
            windows.append((y1, x1, y2, x2))
    return windows


def sliding_window_semantic_scores(score_fn, image: np.ndarray, crop_hw,
                                   stride_hw) -> np.ndarray:
    """Sliding-window semantic inference with count-normalized stitching
    (reference maskfiner_oracle_teacher_model_sw.py:207-292).

    ``score_fn(crop (hc, wc, 3)) -> (nc, hc, wc)`` per-crop semantic class
    scores; overlapping windows are summed into a full-image canvas and
    divided by the visit count.  All crops share one static shape, so the
    jitted model compiles once; accumulation happens on host in fp32.
    """
    h_img, w_img = image.shape[:2]
    windows = sliding_window_grid((h_img, w_img), crop_hw, stride_hw)
    preds = None
    count = np.zeros((1, h_img, w_img), np.float32)
    for (y1, x1, y2, x2) in windows:
        crop_scores = np.asarray(score_fn(image[y1:y2, x1:x2]), np.float32)
        if preds is None:
            preds = np.zeros((crop_scores.shape[0], h_img, w_img), np.float32)
        preds[:, y1:y2, x1:x2] += crop_scores
        count[:, y1:y2, x1:x2] += 1.0
    assert (count == 0).sum() == 0
    return preds / count


def sem_seg_postprocess(result: jnp.ndarray, img_hw, out_hw) -> jnp.ndarray:
    """Crop the padded prediction to the real image region and resize to the
    output size (detectron2 sem_seg_postprocess used at maskformer_model.py:241).
    result: (c, H_pad, W_pad)."""
    result = result[:, : img_hw[0], : img_hw[1]]
    c = result.shape[0]
    return jax.image.resize(result, (c, out_hw[0], out_hw[1]), method="bilinear")
