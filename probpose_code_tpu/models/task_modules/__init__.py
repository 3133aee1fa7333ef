from .prior_generators import MlvlPointGenerator
from .assigners import (
    BBoxOverlaps2D,
    PoseOKS,
    SimOTAAssigner,
    bbox_overlaps,
    simota_assign,
)

__all__ = [
    "MlvlPointGenerator",
    "BBoxOverlaps2D",
    "PoseOKS",
    "SimOTAAssigner",
    "bbox_overlaps",
    "simota_assign",
]
