from .optimizer import build_optimizer, warmup_poly_schedule
from .checkpoint import Checkpointer
from .hooks import nan_check, device_memory_stats, MetricLogger
from .convert_checkpoint import (
    load_torch_state_dict,
    convert_reference_state_dict,
    load_reference_weights,
)

__all__ = [
    "build_optimizer",
    "warmup_poly_schedule",
    "Checkpointer",
    "nan_check",
    "device_memory_stats",
    "MetricLogger",
    "load_torch_state_dict",
    "convert_reference_state_dict",
    "load_reference_weights",
]
