"""Test-time augmentation: multi-scale + horizontal-flip averaging.

Rebuild of reference mask2former/test_time_augmentation.py
SemanticSegmentorWithTTA:20-102 — run the model at cfg.TEST.AUG.MIN_SIZES
(+hflip), resize each semantic map back to the original size, average."""

from __future__ import annotations

from typing import Callable, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class SemanticSegmentorWithTTA:
    def __init__(
        self,
        predict_fn: Callable[[np.ndarray], np.ndarray],
        min_sizes: Sequence[int] = (256, 384, 512, 640, 768, 896),
        max_size: int = 3584,
        flip: bool = True,
    ):
        """predict_fn(image float32 HxWx3) -> (nc, h', w') class scores."""
        self.predict_fn = predict_fn
        self.min_sizes = list(min_sizes)
        self.max_size = max_size
        self.flip = flip

    def __call__(self, image: np.ndarray) -> np.ndarray:
        import cv2

        h, w = image.shape[:2]
        total = None
        count = 0
        for short in self.min_sizes:
            scale = short / min(h, w)
            if max(h, w) * scale > self.max_size:
                scale = self.max_size / max(h, w)
            nh, nw = int(round(h * scale)), int(round(w * scale))
            resized = cv2.resize(image, (nw, nh), interpolation=cv2.INTER_LINEAR)
            variants = [resized]
            if self.flip:
                variants.append(resized[:, ::-1].copy())
            for vi, img in enumerate(variants):
                sem = np.asarray(self.predict_fn(img))          # (nc, h', w')
                if vi == 1:
                    sem = sem[:, :, ::-1]
                sem = np.stack(
                    [
                        cv2.resize(s, (w, h), interpolation=cv2.INTER_LINEAR)
                        for s in sem
                    ]
                )
                total = sem if total is None else total + sem
                count += 1
        return total / count
