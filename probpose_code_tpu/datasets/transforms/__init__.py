from .bottomup import (
    BottomupGetHeatmapMask,
    BottomupRandomAffine,
    BottomupRandomChoiceResize,
    BottomupRandomCrop,
    BottomupResize,
)
from .converting import KeypointConverter, SingleHandConverter
from .common import (
    Albumentation,
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
from .formatting import PackOneStageInputs, PackPoseInputs, collate_onestage
from .mix_img_transforms import Mosaic, YOLOXMixUp
from .pose3d_and_hand import HandRandomFlip, RandomFlipAroundRoot
from .loading import LoadImage
from .topdown import TopdownAffine

__all__ = [
    "Albumentation",
    "BottomupGetHeatmapMask",
    "BottomupRandomAffine",
    "BottomupRandomChoiceResize",
    "BottomupRandomCrop",
    "BottomupResize",
    "FilterAnnotations",
    "KeypointConverter",
    "SingleHandConverter",
    "GenerateTarget",
    "GetBBoxCenterScale",
    "HandRandomFlip",
    "LoadImage",
    "Mosaic",
    "PackOneStageInputs",
    "PackPoseInputs",
    "YOLOXMixUp",
    "collate_onestage",
    "PhotometricDistortion",
    "RandomBBoxTransform",
    "RandomEdgesBlackout",
    "RandomFlip",
    "RandomFlipAroundRoot",
    "RandomHalfBody",
    "RandomPatchesBlackout",
    "TopdownAffine",
    "YOLOXHSVRandomAug",
]
