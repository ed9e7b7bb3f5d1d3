"""Device mesh + sharding helpers.

The reference's distributed layer is one-process-per-GPU DDP over NCCL
(train_net.py:423-430).  The TPU-native equivalent: a single jitted train step
over a ``jax.sharding.Mesh`` with a ``data`` axis — batch sharded, params
replicated, gradients reduced by XLA-inserted collectives over ICI/DCN
(SURVEY.md section 2.3).  Multi-host entry goes through
``jax.distributed.initialize`` (engine/train.py).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, axis_name: str = DATA_AXIS) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim sharded over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch pytree with the batch dim sharded over ``data``."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


MODEL_AXIS = "model"


def make_mesh_2d(
    n_data: int, n_model: int, devices: Optional[Sequence] = None
) -> Mesh:
    """2-axis (data x model) mesh: batch sharded over ``data``, large weight
    matrices tensor-parallel over ``model`` (see tp_leaf_spec).  On real
    hardware lay ``model`` innermost so its all-gathers ride ICI."""
    if devices is None:
        devices = jax.devices()
    arr = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def tp_leaf_spec(x, n_model: int) -> P:
    """Tensor-parallel PartitionSpec for one param/optimizer leaf, by shape:
    kernels (ndim >= 2) shard their output-feature (last) dim over ``model``
    when it divides evenly with at least 2 rows per shard; everything else
    (biases, norms, scalars, BN stats) is replicated.  GSPMD then inserts the
    matching all-gathers/reduce-scatters — the model code never changes."""
    if (
        hasattr(x, "ndim")
        and x.ndim >= 2
        and x.shape[-1] % n_model == 0
        and x.shape[-1] >= 2 * n_model
    ):
        return P(*([None] * (x.ndim - 1) + [MODEL_AXIS]))
    return P()


def shard_state_tp(mesh: Mesh, tree):
    """Place a TrainState (or any pytree) with tensor-parallel leaf specs
    over a 2-axis mesh from make_mesh_2d.  Optimizer moments mirror their
    param's shape, so the same shape rule shards them consistently."""
    n_model = mesh.shape[MODEL_AXIS]

    def place(x):
        if not hasattr(x, "ndim"):
            return x
        return jax.device_put(x, NamedSharding(mesh, tp_leaf_spec(x, n_model)))

    return jax.tree_util.tree_map(place, tree)
