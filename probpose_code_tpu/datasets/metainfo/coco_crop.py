"""CropCOCO metainfo — identical keypoint layout to COCO, different name.

Matches reference ``configs/_base_/datasets/coco_crop.py`` (which differs
from coco.py only in dataset_name/paper_info). CropCOCO is the ProbPose
cropped-COCO benchmark for out-of-image keypoints.
"""

import copy

from .coco import COCO_METAINFO

COCO_CROP_METAINFO = copy.deepcopy(COCO_METAINFO)
COCO_CROP_METAINFO["dataset_name"] = "coco_crop"
