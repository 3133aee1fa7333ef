"""2D->3D pose-lifting codecs.

Parity targets: reference ``mmpose/codecs/image_pose_lifting.py`` (266 LoC)
and ``video_pose_lifting.py`` (234 LoC): root-center the 3D target
(optionally removing the root joint), optional mean/std normalization of the
2D inputs and 3D targets, keypoints reshaped to (K*D, N) sequence form, and
the inverse decode (denormalize + re-add root).
"""

from __future__ import annotations

from typing import List, Optional, Tuple, Union

import numpy as np

from probpose_code_tpu.registry import KEYPOINT_CODECS

from .base import BaseKeypointCodec


@KEYPOINT_CODECS.register_module()
class ImagePoseLifting(BaseKeypointCodec):

    auxiliary_encode_keys = {"lifting_target", "lifting_target_visible"}
    instance_mapping_table = dict(
        lifting_target="lifting_target",
        lifting_target_visible="lifting_target_visible",
    )
    label_mapping_table = dict(
        trajectory_weights="trajectory_weights",
        lifting_target_label="lifting_target_label",
        lifting_target_weight="lifting_target_weight",
    )

    def __init__(
        self,
        num_keypoints: int,
        root_index: Union[int, List] = 0,
        remove_root: bool = False,
        save_index: bool = False,
        reshape_keypoints: bool = True,
        concat_vis: bool = False,
        keypoints_mean: Optional[np.ndarray] = None,
        keypoints_std: Optional[np.ndarray] = None,
        target_mean: Optional[np.ndarray] = None,
        target_std: Optional[np.ndarray] = None,
    ):
        super().__init__()
        self.num_keypoints = num_keypoints
        self.root_index = [root_index] if isinstance(root_index, int) else list(root_index)
        self.remove_root = remove_root
        self.save_index = save_index
        self.reshape_keypoints = reshape_keypoints
        self.concat_vis = concat_vis
        if keypoints_mean is not None:
            assert keypoints_std is not None
            keypoints_mean = np.array(keypoints_mean, np.float32).reshape(1, num_keypoints, -1)
            keypoints_std = np.array(keypoints_std, np.float32).reshape(1, num_keypoints, -1)
        if target_mean is not None:
            assert target_std is not None
            dim = num_keypoints - 1 if remove_root else num_keypoints
            target_mean = np.array(target_mean, np.float32).reshape(1, dim, -1)
            target_std = np.array(target_std, np.float32).reshape(1, dim, -1)
        self.keypoints_mean = keypoints_mean
        self.keypoints_std = keypoints_std
        self.target_mean = target_mean
        self.target_std = target_std

    def encode(
        self,
        keypoints: np.ndarray,
        keypoints_visible: Optional[np.ndarray] = None,
        lifting_target: Optional[np.ndarray] = None,
        lifting_target_visible: Optional[np.ndarray] = None,
    ) -> dict:
        if keypoints_visible is None:
            keypoints_visible = np.ones(keypoints.shape[:2], dtype=np.float32)
        if lifting_target is None:
            lifting_target = np.stack([keypoints[0]])
        if lifting_target_visible is None:
            lifting_target_visible = np.ones(lifting_target.shape[:-1], dtype=np.float32)
        valid = lifting_target_visible > 0.5
        lifting_target_weight = np.where(valid, 1.0, 0.0).astype(np.float32)
        trajectory_weights = lifting_target_weight

        encoded: dict = {}
        root = np.mean(lifting_target[..., self.root_index, :], axis=-2, dtype=np.float32)
        lifting_target_label = lifting_target - root[np.newaxis, ...]

        if self.remove_root and len(self.root_index) == 1:
            ri = self.root_index[0]
            lifting_target_label = np.delete(lifting_target_label, ri, axis=-2)
            lifting_target_visible = np.delete(lifting_target_visible, ri, axis=-2)
            axis = -2 if lifting_target_weight.ndim == 3 else -1
            lifting_target_weight = np.delete(lifting_target_weight, ri, axis=axis)
            encoded["target_root_removed"] = True
            if self.save_index:
                encoded["target_root_index"] = ri

        keypoint_labels = keypoints.copy().astype(np.float32)
        if self.keypoints_mean is not None:
            keypoint_labels = (keypoint_labels - self.keypoints_mean) / self.keypoints_std
        if self.target_mean is not None:
            lifting_target_label = (lifting_target_label - self.target_mean) / self.target_std

        if self.concat_vis:
            vis = keypoints_visible[..., None] if keypoints_visible.ndim == 2 else keypoints_visible
            keypoint_labels = np.concatenate((keypoint_labels, vis), axis=2)

        if self.reshape_keypoints:
            N = keypoint_labels.shape[0]
            keypoint_labels = keypoint_labels.transpose(1, 2, 0).reshape(-1, N)

        encoded.update(
            keypoint_labels=keypoint_labels,
            keypoint_labels_visible=keypoints_visible,
            lifting_target_label=lifting_target_label,
            lifting_target_weight=lifting_target_weight,
            trajectory_weights=trajectory_weights,
            target_root=root,
        )
        return encoded

    def decode(self, encoded: np.ndarray, target_root: Optional[np.ndarray] = None) -> Tuple[np.ndarray, np.ndarray]:
        """(N, K, C) normalized 3D coords -> camera-space coords."""
        keypoints = encoded.copy()
        if self.target_mean is not None:
            keypoints = keypoints * self.target_std + self.target_mean
        if target_root is not None and target_root.size > 0:
            keypoints = keypoints + target_root
            if self.remove_root and len(self.root_index) == 1:
                keypoints = np.insert(keypoints, self.root_index[0], target_root, axis=1)
        scores = np.ones(keypoints.shape[:-1], dtype=np.float32)
        return keypoints, scores


@KEYPOINT_CODECS.register_module()
class VideoPoseLifting(ImagePoseLifting):
    """Sequence variant (VideoPose3D): identical root-centering contract plus
    optional normalization by image size handled in the pipeline; the
    temporal dimension rides the instance axis."""

    def __init__(self, num_keypoints: int, zero_center: bool = True, root_index: int = 0,
                 remove_root: bool = False, save_index: bool = False,
                 reshape_keypoints: bool = True, concat_vis: bool = False, normalize_camera: bool = False):
        super().__init__(
            num_keypoints=num_keypoints,
            root_index=root_index,
            remove_root=remove_root,
            save_index=save_index,
            reshape_keypoints=reshape_keypoints,
            concat_vis=concat_vis,
        )
        self.zero_center = zero_center
        self.normalize_camera = normalize_camera
