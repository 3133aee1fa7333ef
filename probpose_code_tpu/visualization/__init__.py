from .local_visualizer import (
    FastVisualizer,
    Pose3dLocalVisualizer,
    PoseLocalVisualizer,
    SimCCVisualizer,
)

__all__ = ["FastVisualizer", "Pose3dLocalVisualizer", "PoseLocalVisualizer", "SimCCVisualizer"]
