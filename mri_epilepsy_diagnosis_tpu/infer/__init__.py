from .sliding_window import (grid_locations, extract_patches,
                             sliding_window_predict, GridSampler,
                             GridAggregator)
from .detection import FCDMaskGenerator

__all__ = ["grid_locations", "extract_patches", "sliding_window_predict",
           "GridSampler", "GridAggregator", "FCDMaskGenerator"]
