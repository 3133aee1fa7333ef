from .deform_conv import deform_conv2d
from .decode import (
    argmax_probmap_decode_batch,
    dark_udp_refine_batch,
    expected_oks_decode_to_input_space,
    heatmap_expected_value_batch,
    subpixel_refine_batch,
)
from .heatmap import (
    batch_heatmap_nms,
    gather_hw,
    gaussian_blur_batch,
    heatmap_maximum_batch,
)
from .sparsemax import sparsemax
from .tta import flip_coordinates, flip_heatmaps, flip_vectors
from .encode import generate_probmaps_device, generate_udp_gaussian_device, probmap_encode_scales
from .warp import invert_affine, transform_points, warp_affine_batch, warp_affine_separable

__all__ = [
    "deform_conv2d",
    "argmax_probmap_decode_batch",
    "batch_heatmap_nms",
    "dark_udp_refine_batch",
    "expected_oks_decode_to_input_space",
    "flip_coordinates",
    "flip_heatmaps",
    "flip_vectors",
    "gather_hw",
    "gaussian_blur_batch",
    "heatmap_expected_value_batch",
    "heatmap_maximum_batch",
    "invert_affine",
    "sparsemax",
    "subpixel_refine_batch",
    "transform_points",
    "warp_affine_batch",
]
