"""3D-lifting and hand-specific augmentations.

Parity targets:
- ``RandomFlipAroundRoot`` — reference
  ``mmpose/datasets/transforms/pose3d_transforms.py:12-140``: horizontal
  joint flip of the 2D inputs and the 3D lifting target around a static x
  or a root joint, used by every pose-lifting train recipe (H36M TCN /
  VideoPose / MotionBERT).
- ``HandRandomFlip`` — reference
  ``mmpose/datasets/transforms/hand_transforms.py:10-67``: image-level
  RandomFlip plus hand-type swap and root-depth negation (Interhand 3D).
"""

from __future__ import annotations

from copy import deepcopy
from typing import Dict, List, Union

import numpy as np

from probpose_code_tpu.registry import TRANSFORMS
from probpose_code_tpu.structures.keypoint import flip_keypoints_custom_center

from .common import RandomFlip


@TRANSFORMS.register_module()
class RandomFlipAroundRoot:
    """Random horizontal joint flip around a root joint (3D lifting).

    ``keypoints_flip_cfg`` / ``target_flip_cfg`` configure
    :func:`flip_keypoints_custom_center` for the 2D input sequence and the
    3D target respectively (``center_mode`` static/root, ``center_x``,
    ``center_index``). ``flip_camera`` negates the principal point /
    tangential distortion x components; ``flip_label`` operates on the
    encoded ``keypoint_labels`` instead of raw keypoints.
    """

    def __init__(
        self,
        keypoints_flip_cfg: dict,
        target_flip_cfg: dict,
        flip_prob: float = 0.5,
        flip_camera: bool = False,
        flip_label: bool = False,
    ):
        self.keypoints_flip_cfg = keypoints_flip_cfg
        self.target_flip_cfg = target_flip_cfg
        self.flip_prob = flip_prob
        self.flip_camera = flip_camera
        self.flip_label = flip_label

    def __call__(self, results: Dict) -> dict:
        if np.random.rand() > self.flip_prob:
            return results

        if self.flip_label:
            assert "keypoint_labels" in results
            assert "lifting_target_label" in results
            keypoints_key = "keypoint_labels"
            keypoints_visible_key = "keypoint_labels_visible"
            target_key = "lifting_target_label"
        else:
            assert "keypoints" in results
            assert "lifting_target" in results
            keypoints_key = "keypoints"
            keypoints_visible_key = "keypoints_visible"
            target_key = "lifting_target"

        keypoints = results[keypoints_key]
        keypoints_visible = results.get(
            keypoints_visible_key, np.ones(keypoints.shape[:-1], dtype=np.float32)
        )
        lifting_target = results[target_key]
        lifting_target_visible = results.get(
            "lifting_target_visible", np.ones(lifting_target.shape[:-1], dtype=np.float32)
        )
        flip_indices = results.get("flip_indices", list(range(keypoints.shape[-2])))

        _camera_param = deepcopy(results.get("camera_param", {}))

        keypoints, keypoints_visible = flip_keypoints_custom_center(
            keypoints,
            keypoints_visible,
            flip_indices,
            center_mode=self.keypoints_flip_cfg.get("center_mode", "static"),
            center_x=self.keypoints_flip_cfg.get("center_x", 0.5),
            center_index=self.keypoints_flip_cfg.get("center_index", 0),
        )
        lifting_target, lifting_target_visible = flip_keypoints_custom_center(
            lifting_target,
            lifting_target_visible,
            flip_indices,
            center_mode=self.target_flip_cfg.get("center_mode", "static"),
            center_x=self.target_flip_cfg.get("center_x", 0.5),
            center_index=self.target_flip_cfg.get("center_index", 0),
        )

        results[keypoints_key] = keypoints
        results[keypoints_visible_key] = keypoints_visible
        results[target_key] = lifting_target
        results["lifting_target_visible"] = lifting_target_visible

        if self.flip_camera:
            assert "camera_param" in results, "Camera parameters are missing."
            assert "c" in _camera_param
            _camera_param["c"][0] *= -1
            if "p" in _camera_param:
                _camera_param["p"][0] *= -1
            results["camera_param"].update(_camera_param)
        return results


@TRANSFORMS.register_module()
class HandRandomFlip(RandomFlip):
    """Horizontal flip + hand-type swap + root-depth negation (3D hands)."""

    def __init__(self, prob: Union[float, List[float]] = 0.5) -> None:
        super().__init__(prob=prob, direction="horizontal")

    def __call__(self, results: dict) -> dict:
        results = super().__call__(results)
        hand_type = results["hand_type"]
        rel_root_depth = results["rel_root_depth"]
        if results["flip"]:
            hand_type[..., [0, 1]] = hand_type[..., [1, 0]]
            rel_root_depth = -rel_root_depth
        results["hand_type"] = hand_type
        results["rel_root_depth"] = rel_root_depth
        return results
