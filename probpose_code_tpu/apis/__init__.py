from .inference import collect_multi_frames, inference_bottomup, inference_topdown, init_model, load_weights
from .inference_tracking import _track_by_iou, _track_by_oks
from .model_index import MODEL_INDEX, get_model_aliases, resolve_model_cfg
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
    "MODEL_INDEX",
    "get_model_aliases",
    "resolve_model_cfg",
]
