"""KeypointConverter: cross-dataset keypoint index remapping.

Parity target: reference ``mmpose/datasets/transforms/converting.py:11``.
Supports 1-to-1 mappings and 2-to-1 midpoint interpolation; remaps
flip_indices accordingly and emits ``keypoints_visible_weights`` marking the
covered target slots.
"""

from __future__ import annotations

from typing import List, Tuple, Union

import numpy as np

from probpose_code_tpu.registry import TRANSFORMS


@TRANSFORMS.register_module()
class KeypointConverter:
    def __init__(self, num_keypoints: int, mapping: Union[List[Tuple[int, int]], List[Tuple[Tuple, int]]]):
        self.num_keypoints = num_keypoints
        self.mapping = mapping
        if len(mapping):
            source_index, target_index = zip(*mapping)
        else:
            source_index, target_index = [], []

        src1, src2 = [], []
        interpolation = False
        for x in source_index:
            if isinstance(x, (list, tuple)):
                assert len(x) == 2
                src1.append(x[0])
                src2.append(x[1])
                interpolation = True
            else:
                src1.append(x)
                src2.append(x)
        if interpolation:
            self.source_index2 = src2
        self.source_index = src1
        self.target_index = list(target_index)
        self.interpolation = interpolation

    def __call__(self, results: dict) -> dict:
        num_instances = results["keypoints"].shape[0]
        if "keypoints_visible" not in results:
            results["keypoints_visible"] = np.ones((num_instances, results["keypoints"].shape[1]))
        if results["keypoints_visible"].ndim > 2:
            results["keypoints_visible"] = results["keypoints_visible"][:, :, 0]

        key = "keypoints_3d" if "keypoints_3d" in results else "keypoints"
        c = results[key].shape[-1]
        keypoints = np.zeros((num_instances, self.num_keypoints, c))
        keypoints_visible = np.zeros((num_instances, self.num_keypoints))
        flip_indices = results.get("flip_indices", None)

        keypoints_visible_weights = keypoints_visible.copy()
        keypoints_visible_weights[:, self.target_index] = 1.0

        if self.interpolation:
            keypoints[:, self.target_index] = 0.5 * (
                results[key][:, self.source_index] + results[key][:, self.source_index2]
            )
            keypoints_visible[:, self.target_index] = (
                results["keypoints_visible"][:, self.source_index]
                * results["keypoints_visible"][:, self.source_index2]
            )
            if flip_indices is not None:
                flip_indices = [
                    x1 if x1 == x2 else -1
                    for x1, x2 in zip(self.source_index, self.source_index2)
                ]
                flip_indices = [self.source_index.index(x) if x in self.source_index else i
                                for i, x in enumerate(flip_indices)]
        else:
            keypoints[:, self.target_index] = results[key][:, self.source_index]
            keypoints_visible[:, self.target_index] = results["keypoints_visible"][:, self.source_index]
            if flip_indices is not None:
                new_flip = list(range(self.num_keypoints))
                src_to_tgt = {s: t for s, t in zip(self.source_index, self.target_index)}
                for s, t in zip(self.source_index, self.target_index):
                    swapped_src = flip_indices[s] if s < len(flip_indices) else s
                    new_flip[t] = src_to_tgt.get(swapped_src, t)
                flip_indices = new_flip

        results["keypoints"] = keypoints if key == "keypoints" else results["keypoints"]
        if key == "keypoints_3d":
            results["keypoints_3d"] = keypoints
        results["keypoints_visible"] = np.stack(
            [keypoints_visible, keypoints_visible_weights], axis=2
        )
        if flip_indices is not None:
            results["flip_indices"] = flip_indices
        return results


@TRANSFORMS.register_module()
class SingleHandConverter:
    """Map single-hand keypoints into a double-hand layout by hand type
    (reference ``converting.py:153-213``): left hands route through the
    left mapping, right hands through the right one.

    The reference compares hand types with a plain ``sum(hand_type - x)``,
    which is 0 for BOTH one-hot types, so its right-hand branch is
    unreachable; this port uses the absolute difference (the evident
    intent)."""

    def __init__(self, num_keypoints: int, left_hand_mapping, right_hand_mapping):
        self.num_keypoints = num_keypoints
        self.left_hand_converter = KeypointConverter(num_keypoints, left_hand_mapping)
        self.right_hand_converter = KeypointConverter(num_keypoints, right_hand_mapping)

    def __call__(self, results: dict) -> dict:
        assert "hand_type" in results, "hand_type should be provided in results"
        hand_type = np.asarray(results["hand_type"])
        if np.sum(np.abs(hand_type - [[0, 1]])) <= 1e-6:
            return self.left_hand_converter(results)
        if np.sum(np.abs(hand_type - [[1, 0]])) <= 1e-6:
            return self.right_hand_converter(results)
        raise ValueError("hand_type should be left or right")
