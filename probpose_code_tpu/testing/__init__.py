from ._utils import (
    get_coco_sample,
    get_config_file,
    get_packed_inputs,
    make_synthetic_coco,
    get_pose_estimator_cfg,
)

__all__ = ["get_packed_inputs", "get_coco_sample", "get_config_file", "get_pose_estimator_cfg", "make_synthetic_coco"]
