from .catalog import DatasetCatalog, MetadataCatalog
from .datasets import register_all_builtin
from .mapper_semantic import MaskFormerSemanticDatasetMapper
from .mapper_panoptic_instance import (
    MaskFormerPanopticDatasetMapper,
    MaskFormerInstanceDatasetMapper,
    COCOInstanceLSJDatasetMapper,
)
from .loader import TrainLoader, eval_loader

__all__ = [
    "DatasetCatalog",
    "MetadataCatalog",
    "register_all_builtin",
    "MaskFormerSemanticDatasetMapper",
    "MaskFormerPanopticDatasetMapper",
    "MaskFormerInstanceDatasetMapper",
    "COCOInstanceLSJDatasetMapper",
    "TrainLoader",
    "eval_loader",
]
