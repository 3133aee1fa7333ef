from .bottomup import BottomupRandomAffine, BottomupResize
from .converting import KeypointConverter
from .common import (
    FilterAnnotations,
    GenerateTarget,
    GetBBoxCenterScale,
    PhotometricDistortion,
    RandomBBoxTransform,
    RandomEdgesBlackout,
    RandomFlip,
    RandomHalfBody,
    RandomPatchesBlackout,
    YOLOXHSVRandomAug,
)
from .formatting import PackPoseInputs
from .loading import LoadImage
from .topdown import TopdownAffine

__all__ = [
    "BottomupRandomAffine",
    "BottomupResize",
    "FilterAnnotations",
    "KeypointConverter",
    "GenerateTarget",
    "GetBBoxCenterScale",
    "LoadImage",
    "PackPoseInputs",
    "PhotometricDistortion",
    "RandomBBoxTransform",
    "RandomEdgesBlackout",
    "RandomFlip",
    "RandomHalfBody",
    "RandomPatchesBlackout",
    "TopdownAffine",
    "YOLOXHSVRandomAug",
]
