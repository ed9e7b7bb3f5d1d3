from .knn import knn
from .cluster import space_filling_cluster
from .sfc import calculate_peano_order, calculate_hilbert_order
from .shepard import (
    shepard_decay_weights,
    upsample_feature_shepard,
    find_pos_indices_in_pos,
)
from .rasterize import points2img, point2img

__all__ = [
    "knn",
    "space_filling_cluster",
    "calculate_peano_order",
    "calculate_hilbert_order",
    "shepard_decay_weights",
    "upsample_feature_shepard",
    "find_pos_indices_in_pos",
    "points2img",
    "point2img",
]
