from .inference import collect_multi_frames, inference_bottomup, inference_topdown, init_model, load_weights
from .inference_tracking import _track_by_iou, _track_by_oks
from .inferencers import Hand3DInferencer, MMPoseInferencer, Pose2DInferencer, Pose3DInferencer

__all__ = [
    "MMPoseInferencer",
    "Pose2DInferencer",
    "Hand3DInferencer",
    "Pose3DInferencer",
    "collect_multi_frames",
    "inference_bottomup",
    "inference_topdown",
    "init_model",
    "load_weights",
]
