"""Training hooks: NaN detection, device-memory profiling, metric logging.

Rebuilds the reference's debug hooks (train_net.py:74-101): NanCheckHook scans
params + optimizer state for NaN/Inf; CUDAMemProfilerHook becomes TPU
memory_stats polling; EventStorage-style scalar logging goes to stdout and an
optional JSONL file."""

from __future__ import annotations

import json
import math
import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def nan_check(tree: Any, name: str = "state") -> bool:
    """Host-side NaN/Inf scan (reference NanCheckHook, train_net.py:74-88).
    Returns True if any leaf contains a non-finite value."""
    bad = []

    def check(path, leaf):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            if not bool(jnp.isfinite(leaf).all()):
                bad.append(jax.tree_util.keystr(path))

    jax.tree_util.tree_map_with_path(check, tree)
    if bad:
        print(f"[nan_check] non-finite values in {name}: {bad[:10]}")
    return bool(bad)


def device_memory_stats() -> Dict[str, int]:
    """Per-step device memory statistics (the CUDAMemProfilerHook equivalent)."""
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        return {
            k: int(v)
            for k, v in stats.items()
            if k in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit")
        }
    except Exception:  # noqa: BLE001 - memory_stats unsupported on some backends
        return {}


class MetricLogger:
    """Scalar logging: stdout every ``period`` steps + optional JSONL sink
    (the EventStorage/wandb-mirror surface, train_net.py:399-402)."""

    def __init__(self, output_dir: Optional[str] = None, period: int = 20,
                 tensorboard: bool = True, wandb_name: Optional[str] = None):
        self.period = period
        self.path = None
        self._tb = None
        self._wandb = None
        if output_dir:
            os.makedirs(output_dir, exist_ok=True)
            self.path = os.path.join(output_dir, "metrics.jsonl")
            if tensorboard:
                # mirrors the reference's wandb(sync_tensorboard=True) +
                # detectron2 EventStorage surface (train_net.py:399-402)
                try:
                    from torch.utils.tensorboard import SummaryWriter

                    self._tb = SummaryWriter(log_dir=os.path.join(output_dir, "tb"))
                except Exception:
                    self._tb = None
        if wandb_name:
            try:
                import wandb

                self._wandb = wandb
                wandb.init(project="CandidateNet", name=wandb_name,
                           sync_tensorboard=self._tb is not None)
            except Exception:
                self._wandb = None
        self._t0 = time.perf_counter()
        self._last_step = 0

    def log(self, step: int, metrics: Dict[str, Any]) -> None:
        scalars = {}
        for k, v in metrics.items():
            try:
                scalars[k] = float(v)
            except (TypeError, ValueError):
                continue
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps({"step": step, **scalars}) + "\n")
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, v, step)
        if self._wandb is not None:
            self._wandb.log(scalars, step=step)
        if step % self.period == 0:
            dt = time.perf_counter() - self._t0
            steps = max(step - self._last_step, 1)
            self._t0 = time.perf_counter()
            self._last_step = step
            brief = {k: round(v, 4) for k, v in scalars.items()
                     if not k.startswith("loss_") or k.endswith(("_ce", "_mask", "_dice"))}
            print(f"[step {step}] {brief} ({dt / steps:.3f}s/it)", flush=True)
