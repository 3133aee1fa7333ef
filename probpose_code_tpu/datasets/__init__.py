from .mocap import BaseMocapDataset, Human36mDataset  # noqa: F401
from .wholebody3d import H36MWholeBodyDataset, UBody3dDataset  # noqa: F401
from .hand3d import InterHand3DDataset  # noqa: F401
from .video import PoseTrack18VideoDataset  # noqa: F401
from .base_dataset import (
    BaseCocoStyleDataset,
    CocoCropDataset,
    CocoDataset,
    CombinedDataset,
    Compose,
)
from . import zoo  # noqa: F401  (registers the dataset zoo)
from .coco_api import COCO
from .samplers import MultiSourceSampler
from .loader import DataLoader, collate_pose_samples
from .metainfo import DATASET_METAINFO, parse_pose_metainfo
from .transforms import *  # noqa: F401,F403

__all__ = [
    "COCO",
    "BaseCocoStyleDataset",
    "CocoCropDataset",
    "CocoDataset",
    "CombinedDataset",
    "Compose",
    "DATASET_METAINFO",
    "DataLoader",
    "collate_pose_samples",
    "parse_pose_metainfo",
]
