#!/usr/bin/env python
"""Inference demo — the reference demo/demo.py surface on the TPU stack:
read images, run the model, write visualized segmentations.

Usage:
  python demo/demo.py --config-file configs/... --input img1.jpg img2.jpg \
      --output out_dir [--blur] [--opts MODEL.WEIGHTS ckpt.pth ...]
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def get_parser():
    parser = argparse.ArgumentParser(description="autofocusformermod_tpu demo")
    parser.add_argument("--config-file", default="", metavar="FILE")
    parser.add_argument("--input", nargs="+", help="input images or globs")
    parser.add_argument("--webcam", action="store_true",
                        help="take inputs from the webcam (reference --webcam)")
    parser.add_argument("--video-input", default=None,
                        help="path to a video file (reference --video-input)")
    parser.add_argument("--output", default="demo_out")
    parser.add_argument("--blur", action="store_true",
                        help="visualize on blurred images (reference --blur)")
    parser.add_argument("--confidence-threshold", type=float, default=0.5)
    parser.add_argument("--opts", default=[], nargs=argparse.REMAINDER)
    return parser


def setup_cfg(args):
    from autofocusformermod_tpu.config import (
        add_deeplab_config, add_maskformer2_config, get_cfg,
    )

    cfg = get_cfg()
    add_deeplab_config(cfg)
    add_maskformer2_config(cfg)
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()
    return cfg


def color_map(n: int) -> np.ndarray:
    """Deterministic distinct colors for class visualization."""
    rng = np.random.default_rng(7)
    return rng.integers(40, 255, size=(n, 3), dtype=np.uint8)


class AsyncPredictor:
    """Ordered asynchronous prediction pipeline (reference
    demo/predictor.py:137-206).  The reference spawns one process per GPU;
    here one worker THREAD suffices: JAX dispatch is already asynchronous,
    so host pre/post-processing in the caller overlaps device compute while
    the worker keeps the accelerator queue fed.

    put(image) enqueues; get() returns results in submission order;
    __call__(image) is the synchronous convenience path."""

    class _StopToken:
        pass

    def __init__(self, predict_fn, buffer_size: int = 3):
        import queue
        import threading

        self._predict = predict_fn
        self._tasks = queue.Queue(maxsize=buffer_size)
        self._results = queue.Queue()
        self._put_idx = 0
        self._get_idx = 0
        self._result_buf = {}

        def _worker():
            while True:
                task = self._tasks.get()
                if isinstance(task, AsyncPredictor._StopToken):
                    break
                idx, data = task
                try:
                    self._results.put((idx, self._predict(data)))
                except Exception as e:  # surface errors at get()
                    self._results.put((idx, e))

        self._thread = threading.Thread(target=_worker, daemon=True)
        self._thread.start()

    def put(self, image):
        self._put_idx += 1
        self._tasks.put((self._put_idx, image))

    def get(self):
        self._get_idx += 1
        while self._get_idx not in self._result_buf:
            idx, res = self._results.get()
            self._result_buf[idx] = res
        res = self._result_buf.pop(self._get_idx)
        if isinstance(res, Exception):
            raise res
        return res

    def __len__(self):
        return self._put_idx - self._get_idx

    def __call__(self, image):
        self.put(image)
        return self.get()

    def shutdown(self):
        self._tasks.put(AsyncPredictor._StopToken())
        self._thread.join(timeout=10)

    @property
    def default_buffer_size(self):
        return self._tasks.maxsize


class VisualizationDemo:
    """Reference demo/predictor.py:19-73 equivalent."""

    def __init__(self, cfg):
        import jax
        import jax.numpy as jnp

        from autofocusformermod_tpu.models import upsample_masks
        from autofocusformermod_tpu.models.inference import semantic_inference
        from autofocusformermod_tpu.models.registry import build_model

        self.cfg = cfg
        # honor META_ARCHITECTURE (MaskFormer / MaskFiner* / swin variants)
        self.model = build_model(cfg)
        self.min_size = cfg.INPUT.MIN_SIZE_TEST
        self.max_size = cfg.INPUT.MAX_SIZE_TEST
        self.div = cfg.MODEL.MASK_FORMER.SIZE_DIVISIBILITY
        if cfg.MODEL.META_ARCHITECTURE.startswith("MaskFiner"):
            self.nc = cfg.MODEL.MR_SEM_SEG_HEAD.NUM_CLASSES
            # the cascade needs the canvas divisible by the coarsest patch
            self.div = max(self.div, max(cfg.MODEL.MR.PATCH_SIZES))
        else:
            self.nc = cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES
        self.colors = color_map(self.nc)
        self._variables = None
        self._jax = jax
        self._jnp = jnp
        self._upsample = upsample_masks
        self._seminf = semantic_inference

    def _ensure_variables(self, image_hw):
        import jax
        import jax.numpy as jnp

        if self._variables is not None:
            return
        dummy = jnp.zeros((1, *image_hw, 3), jnp.float32)
        self._variables = jax.jit(
            lambda: self.model.init(jax.random.PRNGKey(0), dummy, train=False)
        )()
        weights = self.cfg.MODEL.WEIGHTS
        if weights and os.path.exists(weights):
            from autofocusformermod_tpu.engine.convert_checkpoint import (
                load_reference_weights,
            )

            params = load_reference_weights(weights, self._variables["params"])
            if params is not None:
                self._variables = dict(self._variables, params=params)

    def run_on_image(self, img: np.ndarray):
        import cv2
        import jax.numpy as jnp

        h, w = img.shape[:2]
        scale = self.min_size / min(h, w)
        if max(h, w) * scale > self.max_size:
            scale = self.max_size / max(h, w)
        nh, nw = int(round(h * scale)), int(round(w * scale))
        resized = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
        ph = -(-nh // self.div) * self.div
        pw = -(-nw // self.div) * self.div
        padded = np.zeros((ph, pw, 3), np.float32)
        padded[:nh, :nw] = resized

        self._ensure_variables((ph, pw))
        out = self.model.apply(self._variables, jnp.asarray(padded)[None], train=False)
        masks = self._upsample(out["pred_masks"], (ph, pw))[0]
        sem = self._seminf(out["pred_logits"][0], masks)
        sem = np.asarray(sem[:, :nh, :nw])
        pred = sem.argmax(0)
        pred_full = cv2.resize(pred.astype(np.int32), (w, h),
                               interpolation=cv2.INTER_NEAREST)
        return pred_full

    def visualize(self, img: np.ndarray, pred: np.ndarray, blur: bool = False):
        import cv2

        base = cv2.GaussianBlur(img, (31, 31), 0) if blur else img
        overlay = self.colors[np.clip(pred, 0, self.nc - 1)]
        return (0.5 * base + 0.5 * overlay).astype(np.uint8)

    def run_on_video(self, video, blur: bool = False):
        """Frame iterator over a cv2.VideoCapture, keeping the device fed via
        the async pipeline (reference predictor.py:75-135 run_on_video).
        Yields visualized BGR frames in order."""
        pred_async = AsyncPredictor(self.run_on_image)
        pending = []

        def read():
            ok, frame = video.read()
            return frame[:, :, ::-1] if ok else None   # BGR -> RGB

        frame = read()
        while frame is not None and len(pending) < pred_async.default_buffer_size:
            pred_async.put(frame)
            pending.append(frame)
            frame = read()
        while pending:
            cur = pending.pop(0)
            pred = pred_async.get()
            if frame is not None:
                pred_async.put(frame)
                pending.append(frame)
                frame = read()
            yield self.visualize(cur, pred, blur=blur)[:, :, ::-1]
        pred_async.shutdown()


def _run_video(demo, args):
    """--webcam / --video-input loops (reference demo/demo.py:155-209; no
    interactive cv2 windows here — headless environments write files)."""
    import cv2

    if args.webcam:
        video = cv2.VideoCapture(0)
        writer = None
    else:
        assert os.path.isfile(args.video_input), args.video_input
        video = cv2.VideoCapture(args.video_input)
        w = int(video.get(cv2.CAP_PROP_FRAME_WIDTH))
        h = int(video.get(cv2.CAP_PROP_FRAME_HEIGHT))
        fps = video.get(cv2.CAP_PROP_FPS) or 30.0
        os.makedirs(args.output, exist_ok=True)
        base = os.path.splitext(os.path.basename(args.video_input))[0]
        out_path = os.path.join(args.output, base + "_vis.mp4")
        writer = cv2.VideoWriter(
            out_path, cv2.VideoWriter_fourcc(*"mp4v"), float(fps), (w, h), True
        )
        print(f"writing {out_path}")
    n = 0
    for frame in demo.run_on_video(video, blur=args.blur):
        n += 1
        if writer is not None:
            writer.write(frame)
        else:
            os.makedirs(args.output, exist_ok=True)
            cv2.imwrite(os.path.join(args.output, f"webcam_{n:06d}.png"), frame)
    video.release()
    if writer is not None:
        writer.release()
    print(f"processed {n} frames")


def main():
    args = get_parser().parse_args()
    cfg = setup_cfg(args)
    demo = VisualizationDemo(cfg)

    if args.webcam or args.video_input:
        assert not args.input, "--input cannot combine with --webcam/--video-input"
        return _run_video(demo, args)

    paths = []
    for pat in args.input or []:
        paths += glob.glob(pat) if any(c in pat for c in "*?[") else [pat]
    os.makedirs(args.output, exist_ok=True)

    from PIL import Image

    if len(paths) > 1:
        # pipeline prediction with IO/visualization (predictor.py:209-220)
        pred_async = AsyncPredictor(demo.run_on_image)
        imgs = []
        t0 = time.perf_counter()
        for p in paths:
            img = np.asarray(Image.open(p).convert("RGB"))
            imgs.append((p, img))
            pred_async.put(img)
        for p, img in imgs:
            pred = pred_async.get()
            vis = demo.visualize(img, pred, blur=args.blur)
            out_path = os.path.join(args.output, os.path.basename(p))
            Image.fromarray(vis).save(out_path)
            print(f"{p} -> {out_path}")
        pred_async.shutdown()
        print(f"{len(paths)} images in {time.perf_counter() - t0:.2f}s")
    else:
        for p in paths:
            img = np.asarray(Image.open(p).convert("RGB"))
            t0 = time.perf_counter()
            pred = demo.run_on_image(img)
            vis = demo.visualize(img, pred, blur=args.blur)
            out_path = os.path.join(args.output, os.path.basename(p))
            Image.fromarray(vis).save(out_path)
            print(f"{p}: {time.perf_counter() - t0:.2f}s -> {out_path}")


if __name__ == "__main__":
    main()
