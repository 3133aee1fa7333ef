from .local_visualizer import (
    FastVisualizer,
    Pose3dLocalVisualizer,
    PoseLocalVisualizer,
    SimCCVisualizer,
)

from .vis_backends import (
    LocalVisBackend,
    TensorboardVisBackend,
    WandbVisBackend,
    build_vis_backends,
)

__all__ = [
    "FastVisualizer",
    "Pose3dLocalVisualizer",
    "PoseLocalVisualizer",
    "SimCCVisualizer",
    "LocalVisBackend",
    "TensorboardVisBackend",
    "WandbVisBackend",
    "build_vis_backends",
]
