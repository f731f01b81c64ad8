from .dice import (get_dice_score, get_dice_loss, get_iou_score,
                   compute_dice_coefficient)
from .surface import (compute_surface_distances,
                      compute_average_surface_distance,
                      compute_robust_hausdorff,
                      compute_surface_overlap_at_tolerance,
                      compute_surface_dice_at_tolerance,
                      neighbour_code_to_surface_area)

__all__ = [
    "get_dice_score", "get_dice_loss", "get_iou_score",
    "compute_dice_coefficient", "compute_surface_distances",
    "compute_average_surface_distance", "compute_robust_hausdorff",
    "compute_surface_overlap_at_tolerance", "compute_surface_dice_at_tolerance",
    "neighbour_code_to_surface_area",
]
