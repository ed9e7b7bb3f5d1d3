from .sem_seg_evaluation import SemSegEvaluator
from .panoptic_evaluation import PanopticEvaluator
from .instance_evaluation import (
    CityscapesInstanceEvaluator,
    InstanceSegEvaluator,
    LVISInstanceSegEvaluator,
)

__all__ = [
    "SemSegEvaluator",
    "PanopticEvaluator",
    "InstanceSegEvaluator",
    "CityscapesInstanceEvaluator",
    "LVISInstanceSegEvaluator",
]
