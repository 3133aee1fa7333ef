from .checkpoint import (
    convert_torch_state_dict,
    latest_checkpoint,
    load_checkpoint,
    load_torch_checkpoint,
    save_checkpoint,
)
from .hooks import (
    BadCaseAnalysisHook,
    ExpMomentumEMA,
    Hook,
    PoseVisualizationHook,
    RTMOModeSwitchHook,
    SyncBuffersHook,
    YOLOXPoseModeSwitchHook,
)
from .optim import build_optimizer, build_schedule
from .runner import Runner, attach_predictions

__all__ = [
    "Runner",
    "attach_predictions",
    "build_optimizer",
    "build_schedule",
    "convert_torch_state_dict",
    "latest_checkpoint",
    "load_checkpoint",
    "load_torch_checkpoint",
    "save_checkpoint",
]
