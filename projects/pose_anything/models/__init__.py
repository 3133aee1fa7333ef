from .pam import GraphTransformerHead, PoseAnythingModel, pose_anything_loss

__all__ = ["GraphTransformerHead", "PoseAnythingModel", "pose_anything_loss"]
