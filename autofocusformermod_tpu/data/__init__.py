from .catalog import DatasetCatalog, MetadataCatalog
from .datasets import register_all_builtin
from .mapper_semantic import MaskFormerSemanticDatasetMapper
from .loader import TrainLoader, eval_loader

__all__ = [
    "DatasetCatalog",
    "MetadataCatalog",
    "register_all_builtin",
    "MaskFormerSemanticDatasetMapper",
    "TrainLoader",
    "eval_loader",
]
