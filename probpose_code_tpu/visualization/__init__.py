from .local_visualizer import FastVisualizer, PoseLocalVisualizer

__all__ = ["FastVisualizer", "PoseLocalVisualizer"]
