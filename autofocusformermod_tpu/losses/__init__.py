from .point_sample import (
    point_sample,
    calculate_uncertainty,
    get_uncertain_point_coords_with_randomness,
)
from .matcher import hungarian_match, batch_dice_cost, batch_sigmoid_ce_cost
from .criterion import set_criterion, dice_loss, sigmoid_ce_loss

__all__ = [
    "point_sample",
    "calculate_uncertainty",
    "get_uncertain_point_coords_with_randomness",
    "hungarian_match",
    "batch_dice_cost",
    "batch_sigmoid_ce_cost",
    "set_criterion",
    "dice_loss",
    "sigmoid_ce_loss",
]
