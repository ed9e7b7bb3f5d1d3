from .sem_seg_evaluation import SemSegEvaluator
from .panoptic_evaluation import PanopticEvaluator
from .instance_evaluation import InstanceSegEvaluator

__all__ = ["SemSegEvaluator", "PanopticEvaluator", "InstanceSegEvaluator"]
