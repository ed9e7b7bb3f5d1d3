from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    make_mesh,
    make_mesh_2d,
    batch_sharding,
    replicated,
    shard_batch,
    replicate,
    shard_state_tp,
    tp_leaf_spec,
)
from .train_step import TrainState, make_train_step, make_maskfiner_train_step

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "make_mesh",
    "make_mesh_2d",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "replicate",
    "shard_state_tp",
    "tp_leaf_spec",
    "TrainState",
    "make_train_step",
    "make_maskfiner_train_step",
]
