from .mesh import (
    DATA_AXIS,
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch,
    replicate,
)
from .train_step import TrainState, make_train_step, make_maskfiner_train_step

__all__ = [
    "DATA_AXIS",
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "replicate",
    "TrainState",
    "make_train_step",
    "make_maskfiner_train_step",
]
