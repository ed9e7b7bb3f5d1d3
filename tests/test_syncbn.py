"""SyncBN equivalence under GSPMD.

The reference needs explicit SyncBatchNorm for multi-GPU cityscapes recipes
(Base-Cityscapes-InstanceSegmentation.yaml:14) because torch DDP computes BN
statistics per process.  Under this framework's single-jit GSPMD data
parallelism there is no per-shard program: flax BatchNorm's batch mean/var
reduce over the *global* (sharded) batch axis and XLA inserts the cross-device
all-reduce — SyncBN semantics by construction.  This test pins that claim:
batch_stats after a training step on an 8-device mesh must equal the stats of
the same global batch on one device.
"""

import numpy as np
import jax
import jax.numpy as jnp
from flax import traverse_util

from autofocusformermod_tpu.engine.optimizer import build_optimizer
from autofocusformermod_tpu.models import maskformer_from_config
from autofocusformermod_tpu.parallel import (
    TrainState,
    make_mesh,
    make_train_step,
    replicate,
    shard_batch,
)

from test_maskformer import tiny_cfg
from test_train_step import _tiny_batch


def _stats_after_step(mesh_devices, batch, cfg):
    model = maskformer_from_config(cfg)
    variables = model.init(jax.random.PRNGKey(0), batch["image"][:1], train=False)
    tx = build_optimizer(cfg, variables["params"])
    state = TrainState.create(variables["params"], variables["batch_stats"], tx)
    step_fn = make_train_step(
        model, cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES, num_points=64, donate=False
    )
    if mesh_devices > 1:
        mesh = make_mesh(mesh_devices)
        state = replicate(mesh, state)
        batch = shard_batch(mesh, batch)
    new_state, _ = step_fn(state, batch, jax.random.PRNGKey(0))
    return traverse_util.flatten_dict(jax.device_get(new_state.batch_stats))


def test_batch_stats_match_single_device():
    cfg = tiny_cfg()
    # per-sample distinct stats so per-shard-vs-global divergence is visible
    batch = _tiny_batch(b=8, seed=3)
    batch["image"] = batch["image"] * jnp.linspace(0.2, 2.0, 8)[:, None, None, None]

    stats_1 = _stats_after_step(1, batch, cfg)
    stats_8 = _stats_after_step(8, batch, cfg)

    assert stats_1.keys() == stats_8.keys() and len(stats_1) > 0
    for k in stats_1:
        np.testing.assert_allclose(
            np.asarray(stats_1[k]), np.asarray(stats_8[k]), rtol=1e-5, atol=1e-6,
            err_msg=f"batch_stats diverge across mesh sizes at {k} — "
                    "BN statistics are not global (SyncBN contract broken)",
        )
