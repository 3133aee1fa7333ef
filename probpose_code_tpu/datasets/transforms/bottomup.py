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
from probpose_code_tpu.structures.bbox import (
    bbox_clip_border,
    get_pers_warp_matrix,
    get_udp_warp_matrix,
    get_warp_matrix,
)
from probpose_code_tpu.structures.keypoint import keypoint_clip_border
from probpose_code_tpu.datasets.transforms.loading import materialize_image


@TRANSFORMS.register_module()
class BottomupRandomAffine:
    """Whole-image random affine/perspective into a fixed input size.

    Behavioral parity with reference ``bottomup_transforms.py:147-400``:
    trunc-norm or uniform jitter of shift/scale/rotate (+shear in
    perspective mode), aspect-fixed scale, pad_val border, keypoints/bbox
    transformed through the same matrix, ``area`` scaled by the matrix
    determinant, ``warp_mat`` recorded for mask generation.
    """

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
        shear_factor: float = 2.0,
        shear_prob: float = 1.0,
        use_udp: bool = False,
        pad_val: object = 0,
        distribution: str = "trunc_norm",
        transform_mode: str = "affine",
        bbox_keep_corner: bool = True,
        clip_border: bool = False,
    ):
        assert transform_mode in ("affine", "affine_udp", "perspective")
        assert distribution in ("trunc_norm", "uniform")
        self.input_size = input_size
        self.shift_factor = shift_factor
        self.shift_prob = shift_prob
        self.scale_factor = scale_factor
        self.scale_prob = scale_prob
        self.scale_type = scale_type
        self.rotate_factor = rotate_factor
        self.rotate_prob = rotate_prob
        self.shear_factor = shear_factor
        self.shear_prob = shear_prob
        self.distribution = distribution
        self.transform_mode = "affine_udp" if use_udp and transform_mode == "affine" else transform_mode
        self.bbox_keep_corner = bbox_keep_corner
        self.clip_border = clip_border
        if isinstance(pad_val, (int, float)):
            pad_val = (pad_val, pad_val, pad_val)
        self.pad_val = tuple(pad_val)

    def _random(self, size=(1,)):
        if self.distribution == "trunc_norm":
            # normal clipped to [-1, 1]
            return np.clip(np.random.randn(*size).astype(np.float32) * 0.5, -1, 1)
        return (np.random.rand(*size).astype(np.float32) * 2 - 1)

    def _fix_aspect_ratio(self, scale: np.ndarray, aspect_ratio: float) -> np.ndarray:
        w, h = scale
        if w / h > aspect_ratio:
            if self.scale_type == "long":
                _w, _h = w, w / aspect_ratio
            else:
                _w, _h = h * aspect_ratio, h
        else:
            if self.scale_type == "short":
                _w, _h = w, w / aspect_ratio
            else:
                _w, _h = h * aspect_ratio, h
        return np.array([_w, _h], dtype=np.float32)

    def __call__(self, results: Dict) -> Optional[dict]:
        materialize_image(results)  # lazy-loaded images carry bytes, not pixels
        img_h, img_w = results["img"].shape[:2]
        w, h = self.input_size

        offset_rate = (
            self._random(size=(2,)) * self.shift_factor
            if np.random.rand() < self.shift_prob
            else np.zeros(2, np.float32)
        )
        if np.random.rand() < self.scale_prob:
            smin, smax = self.scale_factor
            scale_rate = smin + (smax - smin) * (self._random(size=(1,)) + 1) / 2
        else:
            scale_rate = np.ones(1, np.float32)
        rotate = float(self._random()[0] * self.rotate_factor) if np.random.rand() < self.rotate_prob else 0.0
        if "perspective" in self.transform_mode and np.random.rand() < self.shear_prob:
            shear = self._random(size=(2,)) * self.shear_factor
        else:
            shear = np.zeros(2, np.float32)

        if "affine" in self.transform_mode:
            offset = offset_rate * [img_w, img_h]
            scale = self._fix_aspect_ratio(scale_rate * [img_w, img_h], aspect_ratio=w / h)
            if self.transform_mode == "affine_udp":
                center = np.array([(img_w - 1.0) / 2, (img_h - 1.0) / 2], np.float32)
                warp_mat = get_udp_warp_matrix(center + offset, scale, rotate, output_size=(w, h))
            else:
                center = np.array([img_w / 2, img_h / 2], np.float32)
                warp_mat = get_warp_matrix(center + offset, scale, rotate, output_size=(w, h))
            results["img"] = cv2.warpAffine(
                results["img"], warp_mat, (int(w), int(h)), flags=cv2.INTER_LINEAR, borderValue=self.pad_val
            )
        else:
            offset = offset_rate * [w, h]
            center = np.array([w / 2, h / 2], np.float32)
            warp_mat = get_pers_warp_matrix(center, offset, float(scale_rate[0]), rotate, shear)
            results["img"] = cv2.warpPerspective(
                results["img"], warp_mat, (int(w), int(h)), borderValue=self.pad_val
            )
        warp_mat = warp_mat.astype(np.float32)

        def _apply(points):
            pts = np.asarray(points, np.float32)
            out = pts @ warp_mat[:2, :2].T + warp_mat[:2, 2]
            if warp_mat.shape[0] == 3:
                z = pts @ warp_mat[2, :2].T + warp_mat[2, 2]
                out = out / z[..., None]
            return out

        if results.get("keypoints", None) is not None:
            kpts = results["keypoints"].copy()
            kpts[..., :2] = _apply(kpts[..., :2])
            results["keypoints"] = kpts
            if self.clip_border and results.get("keypoints_visible", None) is not None:
                results["keypoints"], results["keypoints_visible"] = keypoint_clip_border(
                    results["keypoints"], results["keypoints_visible"], (w, h)
                )
        if results.get("bbox", None) is not None:
            bbox = np.asarray(results["bbox"], np.float32)
            if bbox.ndim == 3 or bbox.shape[-1] == 8:  # already corner form
                corners = bbox.reshape(-1, 4, 2)
            else:
                bbox = bbox.reshape(-1, 4)
                corners = np.stack(
                    [bbox[:, [0, 1]], bbox[:, [2, 1]], bbox[:, [2, 3]], bbox[:, [0, 3]]], axis=1
                )  # (N, 4, 2)
            corners = _apply(corners)
            if self.bbox_keep_corner:
                # reference bottomup_transforms.py:376-380 default: keep the
                # warped 4-corner form — DecoupledHeatmap's instance-wise
                # sigmas depend on true (possibly rotated) corner boxes
                bbox = corners
            else:
                bbox = np.concatenate([corners.min(1), corners.max(1)], axis=-1)
            if self.clip_border:
                bbox = bbox_clip_border(bbox, (w, h))
            results["bbox"] = bbox
        if results.get("area", None) is not None:
            m = warp_mat if warp_mat.shape[0] == 3 else np.concatenate(
                [warp_mat, np.array([[0.0, 0.0, 1.0]], np.float32)]
            )
            results["area"] = np.asarray(results["area"], np.float32) * float(np.linalg.det(m))

        results["input_size"] = (w, h)
        results["warp_mat"] = warp_mat
        results["img_shape"] = (int(h), int(w))
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
        pad_val: object = 0,
    ):
        self.input_size = input_size
        self.aux_scales = aux_scales
        self.size_factor = size_factor
        self.resize_mode = resize_mode
        self.use_udp = use_udp
        if isinstance(pad_val, (int, float)):
            pad_val = (pad_val, pad_val, pad_val)
        self.pad_val = tuple(pad_val)

    @staticmethod
    def _ceil_to(value, factor):
        return int(np.ceil(value / factor)) * factor

    def __call__(self, results: Dict) -> Optional[dict]:
        materialize_image(results)  # lazy-loaded images carry bytes, not pixels
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
            padded = np.full((new_h, new_w, img.shape[2]), self.pad_val[: img.shape[2]], dtype=img.dtype)
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


@TRANSFORMS.register_module()
class BottomupGetHeatmapMask:
    """Valid-region mask from (invalid) segmentations, warped to input space.

    Behavioral parity with reference ``bottomup_transforms.py:27-146``: decode
    the COCO segmentations in ``invalid_segs`` to a binary mask, apply the
    recorded ``warp_mat`` and flip, and store ``heatmap_mask`` at input
    resolution (1 = ignore when ``get_invalid``).
    """

    def __init__(self, get_invalid: bool = False):
        self.get_invalid = get_invalid

    def _segs_to_mask(self, segs, img_shape) -> np.ndarray:
        h, w = img_shape
        mask = np.zeros((h, w), dtype=np.uint8)
        try:
            from probpose_code_tpu.evaluation.functional.mask import decode as rle_decode, frPoly
        except Exception:
            return mask
        for seg in segs or []:
            try:
                if isinstance(seg, (tuple, list)):
                    for r in frPoly(list(seg), h, w):
                        mask |= rle_decode(r).astype(np.uint8)
                elif isinstance(seg, dict):
                    mask |= rle_decode(seg).astype(np.uint8)
            except Exception:
                continue
        return mask

    def __call__(self, results: Dict) -> Optional[dict]:
        materialize_image(results)  # lazy-loaded images carry bytes, not pixels
        invalid_segs = results.get("invalid_segs", [])
        img_shape = results.get("ori_shape") or results["img"].shape[:2]
        mask = self._segs_to_mask(invalid_segs, img_shape)
        if not self.get_invalid:
            mask = 1 - mask  # valid-region convention
        warp_mat = results.get("warp_mat")
        w, h = results.get("input_size", (mask.shape[1], mask.shape[0]))
        if warp_mat is not None:
            if warp_mat.shape[0] == 2:
                mask = cv2.warpAffine(mask, warp_mat, (int(w), int(h)))
            else:
                mask = cv2.warpPerspective(mask, warp_mat, (int(w), int(h)))
        if results.get("flip", False):
            mask = mask[:, ::-1]
        mask = mask.astype(np.float32)
        # reference bottomup_transforms.py:121-139: when the heatmap targets
        # are already present (GenerateTarget runs before this transform in
        # the dekr/cid recipes) the mask is resized to the heatmap grid and
        # binarized, so the loss can multiply it into (B, K, Hh, Wh) weights
        if "heatmaps" in results:
            heatmaps = results["heatmaps"]
            if isinstance(heatmaps, list):
                mask = [
                    (cv2.resize(mask, (hm.shape[-1], hm.shape[-2]),
                                interpolation=cv2.INTER_LINEAR) > 0.5).astype(np.float32)
                    for hm in heatmaps
                ]
            else:
                mask = (cv2.resize(mask, (heatmaps.shape[-1], heatmaps.shape[-2]),
                                   interpolation=cv2.INTER_LINEAR) > 0.5).astype(np.float32)
        results["heatmap_mask"] = mask
        return results


@TRANSFORMS.register_module()
class BottomupRandomCrop:
    """Random absolute/relative crop of the whole image with instance
    filtering.

    Behavioral parity with reference ``bottomup_transforms.py:587-832``:
    the crop window is sampled per ``crop_type``; bboxes/keypoints shift by
    the offset and clip to the window; instances whose clipped box has no
    area inside the crop are dropped (returning ``None`` to skip the sample
    when nothing survives and ``allow_negative_crop`` is False); keypoints
    leaving the window get their visibility zeroed; the translation is
    composed into ``warp_mat``.
    """

    def __init__(
        self,
        crop_size: Tuple[int, int],
        crop_type: str = "absolute",
        allow_negative_crop: bool = False,
        recompute_bbox: bool = False,
        bbox_clip_border: bool = True,
    ):
        if crop_type not in ("relative_range", "relative", "absolute", "absolute_range"):
            raise ValueError(f"Invalid crop_type {crop_type}.")
        if crop_type in ("absolute", "absolute_range"):
            assert crop_size[0] > 0 and crop_size[1] > 0
            if crop_type == "absolute_range":
                assert crop_size[0] <= crop_size[1]
        else:
            assert 0 < crop_size[0] <= 1 and 0 < crop_size[1] <= 1
        self.crop_size = crop_size
        self.crop_type = crop_type
        self.allow_negative_crop = allow_negative_crop
        self.bbox_clip_border = bbox_clip_border

    def _get_crop_size(self, image_size: Tuple[int, int]) -> Tuple[int, int]:
        """(h, w) -> absolute (crop_h, crop_w), reference :790-815."""
        h, w = image_size
        if self.crop_type == "absolute":
            return min(self.crop_size[1], h), min(self.crop_size[0], w)
        if self.crop_type == "absolute_range":
            crop_h = np.random.randint(min(h, self.crop_size[0]), min(h, self.crop_size[1]) + 1)
            crop_w = np.random.randint(min(w, self.crop_size[0]), min(w, self.crop_size[1]) + 1)
            return crop_h, crop_w
        if self.crop_type == "relative":
            crop_w, crop_h = self.crop_size
            return int(h * crop_h + 0.5), int(w * crop_w + 0.5)
        crop_size = np.asarray(self.crop_size, dtype=np.float32)
        crop_h, crop_w = crop_size + np.random.rand(2) * (1 - crop_size)
        return int(h * crop_h + 0.5), int(w * crop_w + 0.5)

    def __call__(self, results: Dict) -> Optional[dict]:
        materialize_image(results)  # lazy-loaded images carry bytes, not pixels
        img = results["img"]
        crop_h, crop_w = self._get_crop_size(img.shape[:2])
        margin_h = max(img.shape[0] - crop_h, 0)
        margin_w = max(img.shape[1] - crop_w, 0)
        offset_h = np.random.randint(0, margin_h + 1)
        offset_w = np.random.randint(0, margin_w + 1)

        warp_mat = np.array([[1, 0, -offset_w], [0, 1, -offset_h], [0, 0, 1]], np.float32)
        prev = results.get("warp_mat")
        results["warp_mat"] = warp_mat if prev is None else warp_mat @ prev

        img = img[offset_h : offset_h + crop_h, offset_w : offset_w + crop_w, ...]
        results["img"] = img
        results["img_shape"] = img.shape[:2]

        if results.get("bbox") is not None:
            bboxes = results["bbox"] + np.tile([-offset_w, -offset_h], 2).astype(np.float32)
            if self.bbox_clip_border:
                bboxes[..., 0::2] = bboxes[..., 0::2].clip(0, img.shape[1])
                bboxes[..., 1::2] = bboxes[..., 1::2].clip(0, img.shape[0])
            valid = (
                (bboxes[..., 0] < img.shape[1]) & (bboxes[..., 1] < img.shape[0])
                & (bboxes[..., 2] > 0) & (bboxes[..., 3] > 0)
            )
            if not valid.any() and not self.allow_negative_crop:
                return None
            results["bbox"] = bboxes[valid]
            for key in ("bbox_score", "id", "category_id", "raw_ann_info", "iscrowd"):
                if results.get(key) is not None and len(results[key]) == len(valid):
                    if isinstance(results[key], list):
                        results[key] = [v for v, ok in zip(results[key], valid) if ok]
                    else:
                        results[key] = results[key][valid]
            if results.get("keypoints") is not None:
                kpts = results["keypoints"] + np.asarray([-offset_w, -offset_h], np.float32)
                if self.bbox_clip_border:
                    outside = (
                        (kpts[..., 0] < 0) | (kpts[..., 1] < 0)
                        | (kpts[..., 0] > img.shape[1]) | (kpts[..., 1] > img.shape[0])
                    )
                    results["keypoints_visible"] = results["keypoints_visible"] * (~outside)
                kpts[..., 0] = kpts[..., 0].clip(0, img.shape[1])
                kpts[..., 1] = kpts[..., 1].clip(0, img.shape[0])
                results["keypoints"] = kpts[valid]
                results["keypoints_visible"] = results["keypoints_visible"][valid]
            if results.get("segmentation") is not None:
                results["segmentation"] = results["segmentation"][
                    offset_h : offset_h + crop_h, offset_w : offset_w + crop_w
                ]
        return results


@TRANSFORMS.register_module()
class BottomupRandomChoiceResize:
    """Resize to a scale sampled from ``scales`` (reference
    ``bottomup_transforms.py:833-973``). With ``keep_ratio`` the long/short
    edges fit inside ``max(scale)``/``min(scale)`` (mmcv ``imrescale``
    semantics; an int scale means a square (s, s) target);
    bboxes/keypoints follow the per-axis scale factors;
    ``input_center``/``input_scale`` refer to the original image frame.
    """

    def __init__(self, scales, keep_ratio: bool = False, clip_object_border: bool = True, **kwargs):
        self.scales = scales if isinstance(scales, list) else [scales]
        self.keep_ratio = keep_ratio
        self.clip_object_border = clip_object_border

    def __call__(self, results: Dict) -> Optional[dict]:
        materialize_image(results)  # lazy-loaded images carry bytes, not pixels
        idx = np.random.randint(len(self.scales))
        scale = self.scales[idx]
        if isinstance(scale, (int, float)):  # int scale -> square (s, s)
            scale = (scale, scale)
        img = results["img"]
        h, w = img.shape[:2]
        if self.keep_ratio:
            sf = min(max(scale) / max(h, w), min(scale) / min(h, w))
            new_w, new_h = int(w * sf + 0.5), int(h * sf + 0.5)
        else:
            new_w, new_h = int(scale[0]), int(scale[1])
        img = cv2.resize(img, (new_w, new_h), interpolation=cv2.INTER_LINEAR)
        w_scale, h_scale = new_w / w, new_h / h

        results["img"] = img
        results["img_shape"] = img.shape[:2]
        results["scale_factor"] = (w_scale, h_scale)
        results["scale_idx"] = idx
        # (w, h) like every other transform in this framework (the reference
        # stores img.shape[:2] here and compensates in its EDPose decode;
        # our decode paths take (h, w) explicitly where they need it)
        results["input_size"] = (new_w, new_h)
        oh, ow = results.get("ori_shape", (h, w))  # (h, w) convention
        results["input_center"] = np.array([ow / 2, oh / 2], np.float32)
        results["input_scale"] = np.array([ow, oh], np.float32)

        if results.get("bbox") is not None:
            bboxes = results["bbox"] * np.tile([w_scale, h_scale], 2)
            if self.clip_object_border:
                bboxes[..., 0::2] = np.clip(bboxes[..., 0::2], 0, new_w)
                bboxes[..., 1::2] = np.clip(bboxes[..., 1::2], 0, new_h)
            results["bbox"] = bboxes.astype(np.float32)
        if results.get("keypoints") is not None:
            kpts = results["keypoints"].copy()
            kpts[..., :2] = kpts[..., :2] * np.asarray([w_scale, h_scale], np.float32)
            if self.clip_object_border:
                kpts[..., 0] = np.clip(kpts[..., 0], 0, new_w)
                kpts[..., 1] = np.clip(kpts[..., 1], 0, new_h)
            results["keypoints"] = kpts
        return results
