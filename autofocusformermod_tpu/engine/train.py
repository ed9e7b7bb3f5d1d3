"""Trainer: config -> model/optimizer/loaders -> jitted train loop with
checkpointing, eval, NaN watchdog and metric logging.

Rebuild of the reference Trainer/DefaultTrainer usage (train_net.py:102-430)
on the TPU stack: one process per *host* (jax.distributed), one jitted step
over the data mesh, orbax auto-resume."""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CfgNode
from ..data import (
    DatasetCatalog,
    MetadataCatalog,
    MaskFormerSemanticDatasetMapper,
    TrainLoader,
    eval_loader,
    register_all_builtin,
)
from ..evaluation import InstanceSegEvaluator, PanopticEvaluator, SemSegEvaluator
from ..evaluation.sem_seg_evaluation import (
    MaskFinerSemSegEvaluator,
    MetaLossSemSegEvaluator,
)
from ..evaluation.distributed import merge_across_processes
from ..losses import set_criterion  # noqa: F401  (re-exported for users)
from ..models import build_model, upsample_masks
from ..models.inference import semantic_inference, sem_seg_postprocess
from ..parallel import TrainState, make_mesh, make_train_step, replicate, shard_batch
from .checkpoint import Checkpointer
from .hooks import MetricLogger, device_memory_stats, nan_check
from .optimizer import build_optimizer


class Trainer:
    def __init__(self, cfg: CfgNode, wandb_name: Optional[str] = None):
        self.cfg = cfg
        register_all_builtin()

        self.process_index = jax.process_index()
        self.process_count = jax.process_count()
        self.is_main = self.process_index == 0

        self.model = build_model(cfg)
        self.mesh = make_mesh()

        # init params on a dummy crop-shaped batch
        crop = self._train_crop_hw()
        dummy = jnp.zeros((1, crop[0], crop[1], 3), jnp.float32)
        variables = jax.jit(
            lambda: self.model.init(jax.random.PRNGKey(cfg.SEED), dummy, train=False)
        )()
        self.tx = build_optimizer(cfg, variables["params"])
        self.state = TrainState.create(
            variables["params"], variables.get("batch_stats", {}), self.tx
        )

        self.step_fn = make_train_step(
            self.model,
            cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES,
            eos_coef=cfg.MODEL.MASK_FORMER.NO_OBJECT_WEIGHT,
            class_weight=cfg.MODEL.MASK_FORMER.CLASS_WEIGHT,
            mask_weight=cfg.MODEL.MASK_FORMER.MASK_WEIGHT,
            dice_weight=cfg.MODEL.MASK_FORMER.DICE_WEIGHT,
            num_points=cfg.MODEL.MASK_FORMER.TRAIN_NUM_POINTS,
            oversample_ratio=cfg.MODEL.MASK_FORMER.OVERSAMPLE_RATIO,
            importance_sample_ratio=cfg.MODEL.MASK_FORMER.IMPORTANCE_SAMPLE_RATIO,
            metaloss_weight=(
                cfg.MODEL.MASK_FORMER.METALOSS_WEIGHT
                if cfg.MODEL.META_ARCHITECTURE == "MaskFormerML" else 0.0
            ),
            ml_min_patch_size=min(cfg.MODEL.MRML.PATCH_SIZES),
            amp=cfg.SOLVER.AMP.ENABLED,
        )

        self.checkpointer = Checkpointer(os.path.join(cfg.OUTPUT_DIR, "checkpoints"))
        self.logger = MetricLogger(
            cfg.OUTPUT_DIR if self.is_main else None,
            wandb_name=wandb_name if self.is_main else None,
        )
        self.start_step = 0

    def _train_crop_hw(self):
        if self.cfg.INPUT.CROP.ENABLED:
            size = self.cfg.INPUT.CROP.SIZE
            div = max(self.cfg.INPUT.SIZE_DIVISIBILITY, 1)
            return (max(size[0], div), max(size[1], div))
        return (self.cfg.INPUT.MIN_SIZE_TEST, self.cfg.INPUT.MIN_SIZE_TEST)

    # -------------------------------------------------------------- resume
    def resume_or_load(self, resume: bool = True) -> None:
        ckpt_state = {
            "params": self.state.params,
            "batch_stats": self.state.batch_stats,
            "opt_state": self.state.opt_state,
            "step": self.state.step,
        }
        if resume and self.checkpointer.latest_step() is not None:
            restored = self.checkpointer.restore(ckpt_state)
            self.state = self.state.replace(
                params=restored["params"],
                batch_stats=restored["batch_stats"],
                opt_state=restored["opt_state"],
                step=restored["step"],
            )
            self.start_step = int(restored["step"])
            if self.is_main:
                print(f"resumed from step {self.start_step}")
        elif self.cfg.MODEL.WEIGHTS:
            from .convert_checkpoint import load_reference_weights

            params = load_reference_weights(self.cfg.MODEL.WEIGHTS, self.state.params)
            if params is not None:
                self.state = self.state.replace(params=params)

    # --------------------------------------------------------------- train
    def build_train_loader(self) -> TrainLoader:
        cfg = self.cfg
        dataset = []
        for name in cfg.DATASETS.TRAIN:
            dataset += DatasetCatalog.get(name)
        mapper = self.build_mapper(is_train=True)
        return TrainLoader(
            dataset,
            mapper,
            cfg.SOLVER.IMS_PER_BATCH,
            seed=cfg.SEED,
            num_workers=cfg.DATALOADER.NUM_WORKERS,
            process_index=self.process_index,
            process_count=self.process_count,
        )

    def build_mapper(self, is_train: bool):
        """Mapper dispatch by INPUT.DATASET_MAPPER_NAME (reference
        Trainer.build_train_loader, train_net.py:214-244)."""
        cfg = self.cfg
        name = cfg.INPUT.DATASET_MAPPER_NAME
        seed = cfg.SEED + self.process_index
        if name == "coco_semantic2" and is_train:
            # fixed-size LSJ semantic recipe (reference
            # coco_semantic_dataset_mapper2.py); eval falls through to the
            # shortest-edge mapper like the reference test loader
            from ..data.mapper_semantic import COCOSemanticLSJDatasetMapper

            return COCOSemanticLSJDatasetMapper.from_config(
                cfg, is_train=True, seed=seed
            )
        if name == "mask_former_semantic" or name.startswith("coco_semantic"):
            return MaskFormerSemanticDatasetMapper.from_config(
                cfg, is_train=is_train, seed=seed
            )
        from ..data import (
            COCOInstanceLSJDatasetMapper,
            MaskFormerInstanceDatasetMapper,
            MaskFormerPanopticDatasetMapper,
        )

        if name == "mask_former_panoptic":
            return MaskFormerPanopticDatasetMapper.from_config(
                cfg, is_train=is_train, seed=seed
            )
        if name == "mask_former_instance":
            return MaskFormerInstanceDatasetMapper(
                is_train=is_train,
                min_size_train=cfg.INPUT.MIN_SIZE_TRAIN,
                max_size_train=cfg.INPUT.MAX_SIZE_TRAIN,
                min_size_test=cfg.INPUT.MIN_SIZE_TEST,
                max_size_test=cfg.INPUT.MAX_SIZE_TEST,
                crop_enabled=cfg.INPUT.CROP.ENABLED,
                crop_size=cfg.INPUT.CROP.SIZE,
                color_aug_ssd=cfg.INPUT.COLOR_AUG_SSD,
                size_divisibility=max(cfg.INPUT.SIZE_DIVISIBILITY, 0),
                max_gt=cfg.TPU.MAX_GT_INSTANCES,
                seed=seed,
            )
        if name in ("coco_instance_lsj", "coco_panoptic_lsj"):
            return COCOInstanceLSJDatasetMapper(
                is_train=is_train,
                image_size=cfg.INPUT.IMAGE_SIZE,
                min_scale=cfg.INPUT.MIN_SCALE,
                max_scale=cfg.INPUT.MAX_SCALE,
                max_gt=cfg.TPU.MAX_GT_INSTANCES,
                seed=seed,
            )
        raise ValueError(f"unknown mapper: {name}")

    def train(self) -> None:
        cfg = self.cfg
        loader = self.build_train_loader()
        state = replicate(self.mesh, self.state)
        key = jax.random.PRNGKey(cfg.SEED + 1)

        max_iter = cfg.SOLVER.MAX_ITER
        ckpt_period = cfg.SOLVER.CHECKPOINT_PERIOD
        eval_period = cfg.TEST.EVAL_PERIOD

        for step in range(self.start_step, max_iter):
            batch_np = next(loader)
            batch = shard_batch(
                self.mesh,
                {
                    k: batch_np[k]
                    for k in ("image", "labels", "masks", "valid",
                              "sem_seg_map", "sem_seg")
                    if k in batch_np
                },
            )
            key, sub = jax.random.split(key)
            state, metrics = self.step_fn(state, batch, sub)

            if self.is_main:
                metrics = dict(metrics)
                metrics.update(device_memory_stats())
                self.logger.log(step + 1, metrics)

            if not np.isfinite(float(metrics["total_loss"])):
                nan_check(state.params, "params")
                raise FloatingPointError(f"non-finite loss at step {step + 1}")

            if (step + 1) % ckpt_period == 0 or (step + 1) == max_iter:
                self.checkpointer.save(
                    step + 1,
                    {
                        "params": state.params,
                        "batch_stats": state.batch_stats,
                        "opt_state": state.opt_state,
                        "step": state.step,
                    },
                )
            if eval_period and (step + 1) % eval_period == 0:
                self.state = state
                self.test()

        self.state = state
        self.checkpointer.wait()
        loader.close()

    # ---------------------------------------------------------------- eval
    def test(self) -> Dict[str, Dict[str, float]]:
        """Evaluator dispatch by metadata evaluator_type (the reference's
        Trainer.build_evaluator, train_net.py:108-212)."""
        cfg = self.cfg
        results = {}
        for name in cfg.DATASETS.TEST:
            etype = MetadataCatalog.get(name).get("evaluator_type", "sem_seg")
            if "panoptic" in etype:
                results[name] = self._eval_panoptic(name)
            elif "instance" in etype:
                results[name] = self._eval_instance(name)
            else:
                results[name] = self._eval_sem_seg(name)
            if self.is_main:
                print(f"[eval {name}] " + ", ".join(
                    f"{k}={v:.2f}" for k, v in results[name].items()
                    if not k.startswith("IoU-")
                ))
        self.verify_results(results)
        return results

    def verify_results(self, results: Dict[str, Dict[str, float]]) -> bool:
        """Assert metrics against cfg.TEST.EXPECTED_RESULTS (reference
        train_net.py:396 / detectron2 verify_results).  Entries are
        [task, metric, expected, tolerance] where task matches a dataset
        name (or 'sem_seg'-style task key)."""
        expected = self.cfg.TEST.EXPECTED_RESULTS
        if not expected:
            return True
        flat = {}
        for ds, metrics in results.items():
            for k, v in metrics.items():
                flat[f"{ds}/{k}"] = v
                flat[k] = v
        ok = True
        for task, metric, ref_val, tol in expected:
            key = f"{task}/{metric}" if f"{task}/{metric}" in flat else metric
            actual = flat.get(key)
            if actual is None or abs(actual - ref_val) > tol:
                ok = False
                if self.is_main:
                    print(f"[verify_results] FAIL {task}/{metric}: "
                          f"got {actual}, expected {ref_val} +/- {tol}")
            elif self.is_main:
                print(f"[verify_results] OK {task}/{metric}: {actual:.3f} "
                      f"(expected {ref_val} +/- {tol})")
        assert ok, "verify_results failed (see log)"
        return ok

    def _pad_eval_image(self, img: np.ndarray) -> np.ndarray:
        """Pad bottom/right to the next multiple of SIZE_DIVISIBILITY with the
        (rounded) pixel mean: the reference batches eval images AFTER
        normalization and pads with zeros (ImageList.from_tensors,
        maskformer_model.py:196), i.e. the mean pixel in raw space.  Zero
        padding raw uint8 would put a black border (-mean/std normalized)
        under the backbone instead.  uint8 rounding costs <=0.5/58 normalized
        units, confined to the pad fringe."""
        div = self.cfg.MODEL.MASK_FORMER.SIZE_DIVISIBILITY
        h, w = img.shape[:2]
        ph = -(-h // div) * div
        pw = -(-w // div) * div
        out = np.empty((ph, pw, img.shape[2]), img.dtype)
        out[:] = np.round(np.asarray(self.cfg.MODEL.PIXEL_MEAN)).astype(img.dtype)
        out[:h, :w] = img
        return out

    def _predict_image(self, variables, img: np.ndarray):
        """Pad to divisibility, run the model, return (logits, masks at
        image resolution)."""
        import cv2  # noqa: F401 - parity with eval paths using cv2

        h, w = img.shape[:2]
        img_p = self._pad_eval_image(img)

        @jax.jit
        def predict(variables, image):
            from ..parallel.precision import amp_variables

            variables = amp_variables(
                variables,
                enabled=getattr(self.model, "compute_dtype", None) == jnp.bfloat16,
            )
            out = self.model.apply(variables, image[None], train=False)
            hh, ww = image.shape[:2]
            masks = upsample_masks(out["pred_masks"], (hh, ww))[0]
            return out["pred_logits"][0], masks

        logits, masks = predict(variables, jnp.asarray(img_p))
        return logits, masks[:, :h, :w]

    def _eval_panoptic(self, dataset_name: str) -> Dict[str, float]:
        from ..data.mapper_panoptic_instance import MaskFormerPanopticDatasetMapper
        from ..models.inference import panoptic_inference

        cfg = self.cfg
        meta = MetadataCatalog.get(dataset_name)
        nc = cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES
        thing_ids = set(meta.get("thing_dataset_id_to_contiguous_id", {}).values())
        evaluator = PanopticEvaluator(thing_ids, nc)
        mapper = MaskFormerPanopticDatasetMapper.from_config(cfg, is_train=False)
        variables = {"params": self.state.params, "batch_stats": self.state.batch_stats}
        for sample in eval_loader(
            DatasetCatalog.get(dataset_name), mapper,
            process_index=self.process_index, process_count=self.process_count,
        ):
            logits, masks = self._predict_image(variables, sample["image"])
            pan, info = panoptic_inference(
                logits, masks, thing_ids, nc,
                cfg.MODEL.MASK_FORMER.TEST.OBJECT_MASK_THRESHOLD,
                cfg.MODEL.MASK_FORMER.TEST.OVERLAP_THRESHOLD,
            )
            evaluator.process(pan, info, sample["pan_seg"], sample["segments_info"])
        merge_across_processes(evaluator)
        return evaluator.evaluate()

    def _eval_instance(self, dataset_name: str) -> Dict[str, float]:
        from ..data.mapper_panoptic_instance import (
            MaskFormerInstanceDatasetMapper,
            polygons_to_mask,
            rle_decode,
        )
        from ..models.inference import instance_inference

        cfg = self.cfg
        meta = MetadataCatalog.get(dataset_name)
        nc = cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES
        thing_ids = meta.get("thing_dataset_id_to_contiguous_id", {})
        is_thing = np.zeros((nc,), bool)
        for t in thing_ids.values():
            if 0 <= t < nc:
                is_thing[t] = True
        # protocol dispatch mirrors reference Trainer.build_evaluator
        # (train_net.py:170-178 CityscapesInstanceEvaluator subprocess,
        # :201-203 LVISEvaluator): official cityscapes matching/averaging for
        # cityscapes_instance, federated AP for lvis, COCO AP otherwise
        etype = meta.get("evaluator_type", "")
        if "cityscapes" in etype or "cityscapes" in dataset_name:
            from ..evaluation import CityscapesInstanceEvaluator as _EvCls
        elif "lvis" in etype or "lvis" in dataset_name:
            from ..evaluation import LVISInstanceSegEvaluator as _EvCls
        else:
            _EvCls = InstanceSegEvaluator
        evaluator = _EvCls(
            nc,
            output_dir=cfg.OUTPUT_DIR or None,
            contiguous_id_to_dataset_id={v: k for k, v in thing_ids.items()},
        )
        mapper = MaskFormerInstanceDatasetMapper(
            is_train=False,
            min_size_test=cfg.INPUT.MIN_SIZE_TEST,
            max_size_test=cfg.INPUT.MAX_SIZE_TEST,
        )
        variables = {"params": self.state.params, "batch_stats": self.state.batch_stats}
        dataset = DatasetCatalog.get(dataset_name)
        for d, sample in zip(
            dataset[self.process_index :: self.process_count],
            eval_loader(dataset, mapper,
                        process_index=self.process_index,
                        process_count=self.process_count),
        ):
            logits, masks = self._predict_image(variables, sample["image"])
            # reference order (maskformer_model.py:240-261): bilinear-resize
            # the mask LOGITS to the original size, THEN threshold/inference
            # — not nearest-resize of binarized masks
            oh, ow = d.get("height"), d.get("width")
            masks = sem_seg_postprocess(masks, masks.shape[-2:], (oh, ow))
            inst = instance_inference(
                logits, masks, jnp.asarray(is_thing), nc,
                topk=cfg.TEST.DETECTIONS_PER_IMAGE,
                panoptic_on=cfg.MODEL.MASK_FORMER.TEST.PANOPTIC_ON,
            )
            pm = np.asarray(inst["masks"]).astype(bool)
            gl, gm = [], []
            for a in d.get("annotations", []):
                if a.get("iscrowd", 0):
                    continue
                seg = a.get("segmentation")
                if isinstance(seg, list):
                    gm.append(polygons_to_mask(seg, oh, ow).astype(bool))
                elif isinstance(seg, dict):
                    gm.append(rle_decode(seg).astype(bool))
                else:
                    continue
                gl.append(a["category_id"])
            if not gl:
                continue
            evaluator.process(
                d.get("image_id", d["file_name"]),
                pm, np.asarray(inst["labels"]), np.asarray(inst["scores"]),
                np.stack(gm), np.asarray(gl),
            )
        merge_across_processes(evaluator)
        if self.is_main:
            evaluator.save_coco_results()
        return evaluator.evaluate()

    def _eval_sem_seg(self, dataset_name: str) -> Dict[str, float]:
        cfg = self.cfg
        meta = MetadataCatalog.get(dataset_name)
        nc = cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES
        arch = cfg.MODEL.META_ARCHITECTURE
        # evaluator dispatch mirrors reference Trainer.build_evaluator
        # (train_net.py:108-212): MaskFiner/ML variants save their extra maps
        ev_cls = SemSegEvaluator
        if "MaskFiner" in arch:
            ev_cls = MaskFinerSemSegEvaluator
        elif arch == "MaskFormerML":
            ev_cls = MetaLossSemSegEvaluator
        save_artifacts = bool(getattr(cfg.TEST, "SAVE_EVAL_ARTIFACTS", False))
        evaluator = ev_cls(
            nc,
            ignore_label=meta.get("ignore_label", 255),
            class_names=meta.get("stuff_classes"),
            output_dir=cfg.OUTPUT_DIR,
            save_predictions=save_artifacts and bool(cfg.OUTPUT_DIR),
        )
        mapper = MaskFormerSemanticDatasetMapper.from_config(cfg, is_train=False)
        dataset = DatasetCatalog.get(dataset_name)

        variables = {"params": self.state.params, "batch_stats": self.state.batch_stats}

        @jax.jit
        def predict(variables, image):
            from ..parallel.precision import amp_variables

            variables = amp_variables(
                variables,
                enabled=getattr(self.model, "compute_dtype", None) == jnp.bfloat16,
            )
            out = self.model.apply(variables, image[None], train=False)
            h, w = image.shape[:2]
            masks = upsample_masks(out["pred_masks"], (h, w))[0]
            return out["pred_logits"][0], masks

        # Sliding-window eval (reference
        # maskfiner_oracle_teacher_model_sw.py:207-292): per-crop forward +
        # count-normalized logit stitching.  The SW meta-arch always uses it;
        # other archs opt in via TEST.SW_ENABLED (set by the -SW base yamls).
        sw_enabled = (arch == "MaskFinerOracleTeacherSW"
                      or bool(getattr(cfg.TEST, "SW_ENABLED", False)))

        def predict_scores_crop(crop: np.ndarray) -> jnp.ndarray:
            logits, masks = predict(variables, jnp.asarray(crop))
            return semantic_inference(logits, masks)

        def predict_scores(img: np.ndarray) -> np.ndarray:
            """image (h, w, 3) -> semantic class scores (nc, h, w)."""
            h, w = img.shape[:2]
            img_p = self._pad_eval_image(img)
            if sw_enabled:
                from ..models.inference import sliding_window_semantic_scores

                sem = sliding_window_semantic_scores(
                    predict_scores_crop, img_p,
                    cfg.TEST.SW_CROP_SIZE, cfg.TEST.SW_STRIDE,
                )
            else:
                sem = predict_scores_crop(img_p)
            return sem[:, :h, :w]

        if cfg.TEST.AUG.ENABLED:
            # multi-scale + flip averaging (reference train_net.py:336-350 ->
            # SemanticSegmentorWithTTA)
            from ..models.tta import SemanticSegmentorWithTTA

            tta = SemanticSegmentorWithTTA(
                predict_scores,
                min_sizes=cfg.TEST.AUG.MIN_SIZES,
                max_size=cfg.TEST.AUG.MAX_SIZE,
                flip=cfg.TEST.AUG.FLIP,
            )

        for sample in eval_loader(
            dataset, mapper,
            process_index=self.process_index, process_count=self.process_count,
        ):
            img = sample["image"]
            h, w = img.shape[:2]
            if cfg.TEST.AUG.ENABLED:
                sem = jnp.asarray(tta(img))
            else:
                sem = predict_scores(img)
            sem = sem_seg_postprocess(sem, (h, w), (sample["height"], sample["width"]))
            pred = np.asarray(jnp.argmax(sem, axis=0))
            gt = sample["sem_seg"]
            if gt.shape != pred.shape:
                import cv2

                gt = cv2.resize(
                    gt.astype(np.int32), (pred.shape[1], pred.shape[0]),
                    interpolation=cv2.INTER_NEAREST,
                )
            evaluator.process(pred, gt, sample.get("file_name", ""))
        merge_across_processes(evaluator)
        return evaluator.evaluate()
