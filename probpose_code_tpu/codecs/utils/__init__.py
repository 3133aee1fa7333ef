from .gaussian_heatmap import (
    generate_gaussian_heatmaps,
    generate_udp_gaussian_heatmaps,
    generate_unbiased_gaussian_heatmaps,
)
from .offset_heatmap import generate_offset_heatmap
from .oks_map import (
    COCO_KPT_SIGMAS,
    build_oks_kernels,
    generate_probmaps,
    oks_kernel_scales,
    padded_oks_kernels,
)
from .post_processing import (
    gaussian_blur,
    gaussian_blur1d,
    gaussian_kernel1d,
    get_heatmap_expected_value,
    get_heatmap_maximum,
    get_simcc_maximum,
    subpixel_refine,
)
from .refinement import (
    refine_keypoints,
    refine_keypoints_dark,
    refine_keypoints_dark_udp,
    refine_simcc_dark,
)

__all__ = [
    "COCO_KPT_SIGMAS",
    "build_oks_kernels",
    "generate_gaussian_heatmaps",
    "generate_offset_heatmap",
    "generate_probmaps",
    "generate_udp_gaussian_heatmaps",
    "generate_unbiased_gaussian_heatmaps",
    "gaussian_blur",
    "gaussian_blur1d",
    "gaussian_kernel1d",
    "get_heatmap_expected_value",
    "get_heatmap_maximum",
    "get_simcc_maximum",
    "oks_kernel_scales",
    "padded_oks_kernels",
    "refine_keypoints",
    "refine_keypoints_dark",
    "refine_keypoints_dark_udp",
    "refine_simcc_dark",
    "subpixel_refine",
]
