from .reformat import (
    image_rgb_to_yuv,
    image_yuv_to_rgb,
    premultiply_alpha,
    rgb_to_yuv_arrays,
    unpremultiply_alpha,
    yuv_to_rgb_arrays,
)
from .colr import calc_yuv_coefficients, from_linear_fn, to_linear_fn
from .primaries import rgb_to_rgb_matrix, rgb_to_xyzd50_matrix

__all__ = [
    "image_rgb_to_yuv",
    "image_yuv_to_rgb",
    "premultiply_alpha",
    "rgb_to_yuv_arrays",
    "unpremultiply_alpha",
    "yuv_to_rgb_arrays",
    "calc_yuv_coefficients",
    "from_linear_fn",
    "to_linear_fn",
    "rgb_to_rgb_matrix",
    "rgb_to_xyzd50_matrix",
]
