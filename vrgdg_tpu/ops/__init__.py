"""Pure-jnp image/video ops (the L1 kernel layer of SURVEY.md §1)."""

from .adjust import apply_adjust
from .color_match import color_match, lab_statistics, transfer_lab_statistics
from .grade import GradeConfig, grade
from .grain import film_grain, grain_field
from .lut import apply_lut
from .resize import (FIT_CROP, FIT_LETTERBOX, FIT_STRETCH, resample,
                     resample_matrix, resize_batch, restore_batch)
from .sharpen import box_blur_3x3, laplacian_sharpen, sobel_sharpen, unsharp

__all__ = [
    "apply_adjust", "color_match", "lab_statistics",
    "transfer_lab_statistics", "GradeConfig", "grade", "film_grain",
    "grain_field", "apply_lut", "FIT_CROP", "FIT_LETTERBOX", "FIT_STRETCH",
    "resample", "resample_matrix", "resize_batch", "restore_batch",
    "box_blur_3x3", "laplacian_sharpen", "sobel_sharpen", "unsharp",
]
