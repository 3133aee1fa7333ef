"""Common pipeline transforms (host-side NumPy).

Parity targets in reference ``mmpose/datasets/transforms/common_transforms.py``:
GetBBoxCenterScale:32, RandomFlip:98, RandomHalfBody:276,
RandomPatchesBlackout:491, RandomEdgesBlackout:593, RandomBBoxTransform:823,
PhotometricDistortion:1093, GenerateTarget:1277, YOLOXHSVRandomAug:1472,
FilterAnnotations:1527.

Transforms are plain callables registered into TRANSFORMS; they mutate/return
the results dict, and return None to drop a sample.
"""

from __future__ import annotations

import copy
from typing import Dict, List, Optional, Sequence, Tuple, Union

import cv2
import numpy as np

from probpose_code_tpu.registry import KEYPOINT_CODECS, TRANSFORMS
from probpose_code_tpu.structures.bbox import bbox_cs2xyxy, bbox_xyxy2cs, flip_bbox
from probpose_code_tpu.structures.keypoint import flip_keypoints
from probpose_code_tpu.datasets.transforms.loading import materialize_image


@TRANSFORMS.register_module()
class GetBBoxCenterScale:
    """bbox (xyxy) -> bbox_center / bbox_scale with padding; stores
    ``bbox_xyxy_wrt_input`` for the ProbPose activation-window logic."""

    def __init__(self, padding: float = 1.25):
        self.padding = padding

    def __call__(self, results: Dict) -> Optional[dict]:
        results["bbox_xyxy_wrt_input"] = results["bbox"]
        if "bbox_center" in results and "bbox_scale" in results:
            results["bbox_scale"] = results["bbox_scale"] * self.padding
        else:
            center, scale = bbox_xyxy2cs(results["bbox"], padding=self.padding)
            results["bbox_center"] = center
            results["bbox_scale"] = scale
        return results


@TRANSFORMS.register_module()
class RandomFlip:
    """Random horizontal/vertical/diagonal flip of image + boxes + keypoints."""

    def __init__(self, prob: Union[float, List[float]] = 0.5, direction: Union[str, List[str]] = "horizontal"):
        self.prob = prob
        self.direction = direction

    def _choose_direction(self) -> Optional[str]:
        if isinstance(self.direction, str):
            direction_list = [self.direction, None]
        else:
            direction_list = list(self.direction) + [None]
        if isinstance(self.prob, list):
            prob_list = list(self.prob) + [1 - sum(self.prob)]
        else:
            single = self.prob / (len(direction_list) - 1)
            prob_list = [single] * (len(direction_list) - 1) + [1.0 - self.prob]
        return np.random.choice(direction_list, p=prob_list)

    def __call__(self, results: dict) -> dict:
        flip_dir = self._choose_direction()
        if flip_dir is None:
            results["flip"] = False
            results["flip_direction"] = None
            return results

        results["flip"] = True
        results["flip_direction"] = flip_dir
        h, w = results.get("input_size", results["img_shape"])

        def _imflip(img):
            if flip_dir == "horizontal":
                return np.flip(img, axis=1)
            if flip_dir == "vertical":
                return np.flip(img, axis=0)
            return np.flip(img, axis=(0, 1))

        if isinstance(results["img"], list):
            results["img"] = [_imflip(im) for im in results["img"]]
        else:
            results["img"] = _imflip(results["img"])
        if "img_mask" in results:
            results["img_mask"] = _imflip(results["img_mask"])

        if results.get("bbox", None) is not None:
            results["bbox"] = flip_bbox(results["bbox"], image_size=(w, h), bbox_format="xyxy", direction=flip_dir)
        if results.get("bbox_xyxy_wrt_input", None) is not None:
            results["bbox_xyxy_wrt_input"] = flip_bbox(
                results["bbox_xyxy_wrt_input"], image_size=(w, h), bbox_format="xyxy", direction=flip_dir
            )
        if results.get("bbox_center", None) is not None:
            results["bbox_center"] = flip_bbox(
                results["bbox_center"], image_size=(w, h), bbox_format="center", direction=flip_dir
            )

        if results.get("keypoints", None) is not None:
            keypoints, keypoints_visible = flip_keypoints(
                results["keypoints"],
                results.get("keypoints_visible", None),
                image_size=(w, h),
                flip_indices=results["flip_indices"],
                direction=flip_dir,
            )
            _, keypoints_visibility = flip_keypoints(
                results["keypoints"],
                results.get("keypoints_visibility", None),
                image_size=(w, h),
                flip_indices=results["flip_indices"],
                direction=flip_dir,
            )
            results["keypoints"] = keypoints
            results["keypoints_visible"] = keypoints_visible
            results["keypoints_visibility"] = keypoints_visibility
        return results


@TRANSFORMS.register_module()
class RandomHalfBody:
    """Random crop to upper/lower body when enough keypoints are visible."""

    def __init__(
        self,
        min_total_keypoints: int = 9,
        min_upper_keypoints: int = 2,
        min_lower_keypoints: int = 3,
        padding: float = 1.5,
        prob: float = 0.3,
        upper_prioritized_prob: float = 0.7,
    ):
        self.min_total_keypoints = min_total_keypoints
        self.min_upper_keypoints = min_upper_keypoints
        self.min_lower_keypoints = min_lower_keypoints
        self.padding = padding
        self.prob = prob
        self.upper_prioritized_prob = upper_prioritized_prob

    def _half_body_bbox(self, keypoints, half_body_ids):
        selected = keypoints[half_body_ids]
        center = selected.mean(axis=0)[:2]
        x1, y1 = selected.min(axis=0)
        x2, y2 = selected.max(axis=0)
        scale = np.array([x2 - x1, y2 - y1], dtype=center.dtype) * self.padding
        return center, scale

    def _half_body_exact_bbox(self, keypoints, half_body_ids, bbox):
        center, scale = self._half_body_bbox(keypoints, half_body_ids)
        x1, y1 = center - scale / 2
        x2, y2 = center + scale / 2
        return np.array(
            [max(x1, bbox[0]), max(y1, bbox[1]), min(x2, bbox[2]), min(y2, bbox[3])]
        )

    def _select(self, keypoints_visible, upper_body_ids, lower_body_ids):
        if keypoints_visible.ndim == 3:
            keypoints_visible = keypoints_visible[..., 0]
        out = []
        for visible in keypoints_visible:
            if visible.sum() < self.min_total_keypoints or np.random.rand() > self.prob:
                out.append(None)
                continue
            upper = [i for i in upper_body_ids if visible[i] > 0]
            lower = [i for i in lower_body_ids if visible[i] > 0]
            prefer_upper = np.random.rand() < self.upper_prioritized_prob
            if len(upper) < self.min_upper_keypoints and len(lower) < self.min_lower_keypoints:
                out.append(None)
            elif len(lower) < self.min_lower_keypoints:
                out.append(upper)
            elif len(upper) < self.min_upper_keypoints:
                out.append(lower)
            else:
                out.append(upper if prefer_upper else lower)
        return out

    def __call__(self, results: Dict) -> Optional[dict]:
        half_body_ids = self._select(
            results["keypoints_visible"], results["upper_body_ids"], results["lower_body_ids"]
        )
        centers, scales, bboxes_wrt = [], [], []
        for i, indices in enumerate(half_body_ids):
            if indices is None:
                centers.append(results["bbox_center"][i])
                scales.append(results["bbox_scale"][i])
                bboxes_wrt.append(np.asarray(results["bbox_xyxy_wrt_input"]).reshape(-1, 4)[i])
            else:
                c, s = self._half_body_bbox(results["keypoints"][i], indices)
                centers.append(c)
                scales.append(s)
                bboxes_wrt.append(
                    self._half_body_exact_bbox(
                        results["keypoints"][i], indices, np.asarray(results["bbox_xyxy_wrt_input"]).reshape(-1, 4)[i]
                    )
                )
        results["bbox_center"] = np.stack(centers)
        results["bbox_scale"] = np.stack(scales)
        results["bbox_xyxy_wrt_input"] = np.stack(bboxes_wrt)
        return results


@TRANSFORMS.register_module()
class RandomBBoxTransform:
    """Truncated-normal shift/scale/rotate jitter of the bbox."""

    def __init__(
        self,
        shift_factor: float = 0.16,
        shift_prob: float = 0.3,
        scale_factor: Tuple[float, float] = (0.5, 1.5),
        scale_prob: float = 1.0,
        rotate_factor: float = 80.0,
        rotate_prob: float = 0.6,
    ):
        self.shift_factor = shift_factor
        self.shift_prob = shift_prob
        self.scale_factor = scale_factor
        self.scale_prob = scale_prob
        self.rotate_factor = rotate_factor
        self.rotate_prob = rotate_prob

    @staticmethod
    def _truncnorm_rvs(shape) -> np.ndarray:
        """Standard normal truncated to [-1, 1] by rejection — identical
        distribution to ``scipy.stats.truncnorm.rvs(-1, 1)`` without its
        ~0.6 ms/call ppf machinery (this runs per pipeline sample)."""
        out = np.random.randn(*shape)
        bad = np.abs(out) > 1.0
        while bad.any():
            out[bad] = np.random.randn(int(bad.sum()))
            bad = np.abs(out) > 1.0
        return out

    def _params(self, n: int):
        rv = self._truncnorm_rvs((n, 4)).astype(np.float32)
        offset = rv[:, :2] * self.shift_factor
        offset = np.where(np.random.rand(n, 1) < self.shift_prob, offset, 0.0)
        lo, hi = self.scale_factor
        scale = rv[:, 2:3] * (hi - lo) * 0.5 + (hi + lo) * 0.5
        scale = np.where(np.random.rand(n, 1) < self.scale_prob, scale, 1.0)
        rotate = rv[:, 3] * self.rotate_factor
        rotate = np.where(np.random.rand(n) < self.rotate_prob, rotate, 0.0)
        return offset, scale, rotate

    def __call__(self, results: Dict) -> Optional[dict]:
        bbox_scale = results["bbox_scale"]
        n = bbox_scale.shape[0]
        offset, scale, rotate = self._params(n)
        results["bbox_center"] = results["bbox_center"] + offset * bbox_scale
        results["bbox_scale"] = results["bbox_scale"] * scale
        results["bbox_rotation"] = rotate

        bbox_wrt = results.get("bbox_xyxy_wrt_input")
        if bbox_wrt is not None:
            _c, _s = bbox_xyxy2cs(bbox_wrt, padding=1.0)
            _c = _c + offset * _s
            _s = _s * scale
            results["bbox_xyxy_wrt_input"] = bbox_cs2xyxy(_c, _s).flatten()
        return results


@TRANSFORMS.register_module()
class RandomPatchesBlackout:
    """Hide-and-seek grid masking; zeroes visibility of hidden keypoints
    (ProbPose occlusion augmentation, reference :491)."""

    def __init__(self, grid_size: Tuple[int, int] = (8, 6), mask_ratio: float = 0.3, prob: float = 0.8):
        self.grid_size = grid_size
        self.mask_ratio = mask_ratio
        self.prob = prob

    def __call__(self, results: Dict) -> Optional[dict]:
        materialize_image(results)  # lazy-loaded images carry bytes, not pixels
        img = results["img"]
        kpts = (results.get("transformed_keypoints", results["keypoints"])).reshape(-1, 2)
        h, w = img.shape[:2]
        grid_h, grid_w = self.grid_size
        dh = int(np.ceil(h / grid_h))
        dw = int(np.ceil(w / grid_w))

        if np.random.rand() < self.prob:
            n = grid_h * grid_w
            black = np.random.choice([0, 1], n, p=[1 - self.mask_ratio, self.mask_ratio]).reshape(
                grid_h, grid_w
            ).astype(bool)
        else:
            black = np.zeros((grid_h, grid_w), dtype=bool)

        for i in range(grid_h):
            for j in range(grid_w):
                if black[i, j]:
                    img[i * dh:(i + 1) * dh, j * dw:(j + 1) * dw, :] = 0
                    in_black = (
                        (kpts[:, 0] >= j * dw)
                        & (kpts[:, 0] < (j + 1) * dw)
                        & (kpts[:, 1] >= i * dh)
                        & (kpts[:, 1] < (i + 1) * dh)
                    )
                    results["keypoints_visibility"][:, in_black] = 0
        return results


@TRANSFORMS.register_module()
class RandomEdgesBlackout:
    """Keep a random sub-rectangle of the (padded) bbox, black out the rest;
    updates visibility + crops the activation window (reference :593)."""

    def __init__(
        self,
        mask_ratio_range: Tuple[float, float] = (0.1, 0.3),
        prob: float = 0.8,
        texture_prob: float = 0.0,
        context_size: float = 1.25,
    ):
        self.mask_ratio_range = mask_ratio_range
        self.prob = prob
        self.texture_prob = texture_prob
        self.context_size = context_size

    def _random_mask(self, w, h, bbox_xyxy):
        mask = np.zeros((h, w), dtype=bool)
        c, s = bbox_xyxy2cs(bbox_xyxy, padding=self.context_size)
        x0, y0, x1, y1 = bbox_cs2xyxy(c, s)
        x0 = int(max(x0, 0))
        y0 = int(max(y0, 0))
        x1 = int(min(x1, w))
        y1 = int(min(y1, h))
        x, y, dw, dh = 0, 0, w, h
        if np.random.rand() < self.prob:
            rh, rw = np.random.uniform(1 - self.mask_ratio_range[1], 1 - self.mask_ratio_range[0], 2)
            dh = int((y1 - y0) * rh)
            dw = int((x1 - x0) * rw)
            x_end = x1 - dw if x1 - dw > x0 else x0 + 1
            y_end = y1 - dh if y1 - dh > y0 else y0 + 1
            x = np.random.randint(x0, x_end)
            y = np.random.randint(y0, y_end)
            mask[y:y + dh, x:x + dw] = True
            mask = ~mask
        return mask, (x, y, x + dw, y + dh)

    def __call__(self, results: Dict) -> Optional[dict]:
        materialize_image(results)  # lazy-loaded images carry bytes, not pixels
        img = results["img"]
        kpts = (results.get("transformed_keypoints", results["keypoints"])).reshape(-1, 2)
        mask, (x1, y1, x2, y2) = self._random_mask(
            img.shape[1], img.shape[0], np.asarray(results["bbox_xyxy_wrt_input"]).flatten()
        )
        img[mask, :] = 0
        results["img"] = img

        in_rect = (kpts[:, 0] >= x1) & (kpts[:, 0] < x2) & (kpts[:, 1] >= y1) & (kpts[:, 1] < y2)
        results["keypoints_visibility"][:, ~in_rect] = 0
        results["keypoints_in_image"] = in_rect.squeeze().astype(int)

        bbox_xyxy = np.asarray(results["bbox_xyxy_wrt_input"]).flatten()
        bbox_xyxy[0] = max(bbox_xyxy[0], x1)
        bbox_xyxy[1] = max(bbox_xyxy[1], y1)
        bbox_xyxy[2] = min(bbox_xyxy[2], x2)
        bbox_xyxy[3] = min(bbox_xyxy[3], y2)
        results["bbox_xyxy_wrt_input"] = bbox_xyxy.reshape(-1, 4)
        return results


@TRANSFORMS.register_module()
class PhotometricDistortion:
    """Random brightness / contrast / saturation / hue / channel swap
    (reference :1093, SSD-style)."""

    def __init__(
        self,
        brightness_delta: int = 32,
        contrast_range: Tuple[float, float] = (0.5, 1.5),
        saturation_range: Tuple[float, float] = (0.5, 1.5),
        hue_delta: int = 18,
    ):
        self.brightness_delta = brightness_delta
        self.contrast_lower, self.contrast_upper = contrast_range
        self.saturation_lower, self.saturation_upper = saturation_range
        self.hue_delta = hue_delta

    def __call__(self, results: Dict) -> Optional[dict]:
        materialize_image(results)  # lazy-loaded images carry bytes, not pixels
        img = results["img"].astype(np.float32)

        if np.random.randint(2):
            img += np.random.uniform(-self.brightness_delta, self.brightness_delta)
        contrast_first = np.random.randint(2)
        if contrast_first and np.random.randint(2):
            img *= np.random.uniform(self.contrast_lower, self.contrast_upper)

        hsv = cv2.cvtColor(np.clip(img, 0, 255).astype(np.uint8), cv2.COLOR_BGR2HSV).astype(np.float32)
        if np.random.randint(2):
            hsv[..., 1] *= np.random.uniform(self.saturation_lower, self.saturation_upper)
        if np.random.randint(2):
            hsv[..., 0] = (hsv[..., 0] + np.random.uniform(-self.hue_delta, self.hue_delta)) % 180
        img = cv2.cvtColor(np.clip(hsv, 0, 255).astype(np.uint8), cv2.COLOR_HSV2BGR).astype(np.float32)

        if not contrast_first and np.random.randint(2):
            img *= np.random.uniform(self.contrast_lower, self.contrast_upper)
        if np.random.randint(2):
            img = img[..., np.random.permutation(3)]
        results["img"] = np.clip(img, 0, 255).astype(np.uint8)
        return results


@TRANSFORMS.register_module()
class CoarseDropout:
    """Zero out random rectangular holes (native counterpart of the
    Albumentations ``CoarseDropout`` the reference wires through its
    ``Albumentation`` wrapper in
    ``configs/body_2d_keypoint/topdown_heatmap/coco/td-hm_hrnet-w32_coarsedropout-*.py``)."""

    def __init__(
        self,
        max_holes: int = 8,
        max_height: int = 40,
        max_width: int = 40,
        min_holes: int = 1,
        min_height: int = 10,
        min_width: int = 10,
        prob: float = 0.5,
    ):
        self.max_holes = max_holes
        self.max_height = max_height
        self.max_width = max_width
        self.min_holes = min_holes
        self.min_height = min_height
        self.min_width = min_width
        self.prob = prob

    def __call__(self, results: Dict) -> Optional[dict]:
        if np.random.rand() >= self.prob:
            return results
        materialize_image(results)  # lazy-loaded images carry bytes, not pixels
        img = results["img"]
        h, w = img.shape[:2]
        n = np.random.randint(self.min_holes, self.max_holes + 1)
        for _ in range(n):
            hh = np.random.randint(self.min_height, self.max_height + 1)
            hw = np.random.randint(self.min_width, self.max_width + 1)
            y = np.random.randint(0, max(1, h - hh))
            x = np.random.randint(0, max(1, w - hw))
            img[y : y + hh, x : x + hw] = 0
        results["img"] = img
        return results


@TRANSFORMS.register_module()
class GridMask:
    """GridMask occlusion aug (native counterpart of the Albumentations
    ``GridDropout`` used by the reference gridmask recipe)."""

    def __init__(self, prob: float = 0.5, ratio: float = 0.5, rotate: int = 15,
                 d_range: Tuple[float, float] = (0.2, 0.5)):
        self.prob = prob
        self.ratio = ratio
        self.rotate = rotate
        self.d_range = d_range

    def __call__(self, results: Dict) -> Optional[dict]:
        if np.random.rand() >= self.prob:
            return results
        materialize_image(results)  # lazy-loaded images carry bytes, not pixels
        img = results["img"]
        h, w = img.shape[:2]
        d = int(np.random.uniform(*self.d_range) * min(h, w))
        d = max(d, 2)
        keep = max(1, int(d * self.ratio))
        # build an oversized tile mask so a random rotation still covers the image
        size = int(np.ceil(np.hypot(h, w)))
        yy, xx = np.mgrid[0:size, 0:size]
        mask = ((yy % d) < keep) | ((xx % d) < keep)  # True = keep pixel
        if self.rotate:
            angle = np.random.uniform(-self.rotate, self.rotate)
            rot = cv2.getRotationMatrix2D((size / 2, size / 2), angle, 1.0)
            mask = cv2.warpAffine(mask.astype(np.uint8), rot, (size, size), flags=cv2.INTER_NEAREST,
                                  borderMode=cv2.BORDER_CONSTANT, borderValue=1).astype(bool)
        y0 = (size - h) // 2
        x0 = (size - w) // 2
        mask = mask[y0 : y0 + h, x0 : x0 + w]
        img[~mask] = 0
        results["img"] = img
        return results


@TRANSFORMS.register_module()
class YOLOXHSVRandomAug:
    """HSV gain jitter used by YOLOX-style training (reference :1472)."""

    def __init__(self, hue_delta: int = 5, saturation_delta: int = 30, value_delta: int = 30):
        self.hue_delta = hue_delta
        self.saturation_delta = saturation_delta
        self.value_delta = value_delta

    def __call__(self, results: Dict) -> Optional[dict]:
        materialize_image(results)  # lazy-loaded images carry bytes, not pixels
        img = results["img"]
        hsv_gains = np.random.uniform(-1, 1, 3) * [self.hue_delta, self.saturation_delta, self.value_delta]
        hsv_gains *= np.random.randint(0, 2, 3)
        hsv_gains = hsv_gains.astype(np.int16)
        img_hsv = cv2.cvtColor(img, cv2.COLOR_BGR2HSV).astype(np.int16)
        img_hsv[..., 0] = (img_hsv[..., 0] + hsv_gains[0]) % 180
        img_hsv[..., 1] = np.clip(img_hsv[..., 1] + hsv_gains[1], 0, 255)
        img_hsv[..., 2] = np.clip(img_hsv[..., 2] + hsv_gains[2], 0, 255)
        results["img"] = cv2.cvtColor(img_hsv.astype(np.uint8), cv2.COLOR_HSV2BGR)
        return results


@TRANSFORMS.register_module()
class FilterAnnotations:
    """Drop instances with tiny bboxes / few keypoints (reference :1527)."""

    def __init__(
        self,
        min_gt_bbox_wh: Tuple[int, int] = (1, 1),
        min_kpt_vis: int = 1,
        by_box: bool = False,
        by_area: bool = False,
        by_kpt: bool = True,
        min_gt_area: int = 1,
        keep_empty: bool = True,
    ):
        self.min_gt_bbox_wh = min_gt_bbox_wh
        self.min_kpt_vis = min_kpt_vis
        self.by_box = by_box
        self.by_area = by_area
        self.by_kpt = by_kpt
        self.min_gt_area = min_gt_area
        self.keep_empty = keep_empty

    def __call__(self, results: Dict) -> Optional[dict]:
        assert "keypoints" in results
        kpts = results["keypoints"]
        if kpts.shape[0] == 0:
            return results

        tests = []
        if self.by_box and "bbox" in results:
            bbox = results["bbox"]
            tests.append(
                ((bbox[..., 2] - bbox[..., 0] > self.min_gt_bbox_wh[0])
                 & (bbox[..., 3] - bbox[..., 1] > self.min_gt_bbox_wh[1]))
            )
        if self.by_area and "area" in results:
            tests.append(np.asarray(results["area"]) >= self.min_gt_area)
        if self.by_kpt:
            kpts_vis = results["keypoints_visible"]
            if kpts_vis.ndim == 3:
                kpts_vis = kpts_vis[..., 0]
            tests.append(kpts_vis.sum(axis=1) >= self.min_kpt_vis)

        keep = tests[0]
        for t in tests[1:]:
            keep = keep & t
        if not keep.any() and not self.keep_empty:
            return None
        keys = ("bbox", "bbox_score", "category_id", "keypoints", "keypoints_visible",
                "keypoints_visibility", "area")
        for key in keys:
            if key in results and hasattr(results[key], "__len__") and len(results[key]) == len(keep):
                results[key] = results[key][keep]
        return results


@TRANSFORMS.register_module()
class GenerateTarget:
    """Run the keypoint codec(s) to generate training targets
    (reference :1277)."""

    _DEVICE_ENCODERS = ("ProbMap", "ArgMaxProbMap", "UDPHeatmap")

    def __init__(
        self,
        encoder,
        target_type: Optional[str] = None,
        multilevel: bool = False,
        use_dataset_keypoint_weights: bool = False,
        device: bool = False,
    ):
        self.encoder_cfg = copy.deepcopy(encoder)
        self.multilevel = multilevel
        self.use_dataset_keypoint_weights = use_dataset_keypoint_weights
        self.device = device
        if isinstance(self.encoder_cfg, list):
            self.encoder = [KEYPOINT_CODECS.build(cfg) for cfg in self.encoder_cfg]
            assert not device, "device target generation supports a single encoder"
        else:
            assert not multilevel
            self.encoder = KEYPOINT_CODECS.build(self.encoder_cfg)
            if device:
                etype = self.encoder_cfg.get("type")
                if etype not in self._DEVICE_ENCODERS or (
                    getattr(self.encoder, "heatmap_type", "gaussian") != "gaussian"
                ):
                    raise ValueError(
                        f"device target generation supports {self._DEVICE_ENCODERS} "
                        f"(gaussian heatmap_type), got {etype}"
                    )

    def _device_defer(self, results, keypoints, keypoints_visible, keypoints_visibility) -> Dict:
        """Defer the heatmap rendering to the device encode (ops.encode):
        emit the heatmap-space keypoints plus every auxiliary output the host
        encoder would have produced (identical formulas, no (K, H, W) maps).
        """
        enc = self.encoder
        etype = self.encoder_cfg.get("type")
        assert keypoints.shape[0] == 1, "device target generation is per-instance (topdown)"
        if keypoints_visible is None:
            keypoints_visible = np.ones(keypoints.shape[:2], dtype=np.float32)
        kpts_hm = (keypoints[..., :2] / enc.scale_factor).astype(np.float32)

        if etype == "UDPHeatmap":
            # weight gate: visible keypoints whose 3*sigma window misses the
            # map are dropped (gaussian_heatmap.py:146-150 semantics)
            W, H = enc.heatmap_size
            radius = enc.sigma * 3
            mu = np.trunc(kpts_hm + 0.5)
            lt = np.trunc(mu - radius)
            rb = np.trunc(mu + radius + 1)
            in_bounds = ~((lt[..., 0] >= W) | (lt[..., 1] >= H) | (rb[..., 0] < 0) | (rb[..., 1] < 0))
            weights = np.asarray(keypoints_visible, np.float32).copy()
            weights[(keypoints_visible >= 0.5) & ~in_bounds] = 0
            encoded = dict(keypoint_weights=weights)
        else:  # ProbMap family: exp(-finite) > 0, so weight = 1 where visible
            weights = np.asarray(keypoints_visible, np.float32).copy()
            weights[keypoints_visible >= 0.5] = 1
            annotated = keypoints_visible > 0
            in_image = (
                (keypoints[:, :, 0] >= 0)
                & (keypoints[:, :, 0] < enc.input_size[0])
                & (keypoints[:, :, 1] >= 0)
                & (keypoints[:, :, 1] < enc.input_size[1])
            )
            encoded = dict(
                keypoint_weights=weights,
                annotated=annotated,
                in_image=in_image,
                keypoints_scaled=keypoints,
                heatmap_keypoints=kpts_hm,
            )
        encoded["device_kpts_hm"] = kpts_hm
        encoded["device_kpts_visible"] = np.asarray(keypoints_visible, np.float32)
        if enc.label_mapping_table:
            encoded["label_mapping_table"] = enc.label_mapping_table
        if enc.instance_mapping_table:
            encoded["instance_mapping_table"] = enc.instance_mapping_table
        return encoded

    def _encode_single(self, encoder, results, keypoints, keypoints_visible, keypoints_visibility):
        aux = {key: results[key] for key in encoder.auxiliary_encode_keys if key in results}
        kwargs = dict(keypoints=keypoints, keypoints_visible=keypoints_visible)
        import inspect

        sig = inspect.signature(encoder.encode)
        if "keypoints_visibility" in sig.parameters:
            kwargs["keypoints_visibility"] = keypoints_visibility
        kwargs.update({k: v for k, v in aux.items() if k not in kwargs})
        return encoder.encode(**kwargs)

    def __call__(self, results: Dict) -> Optional[dict]:
        if results.get("transformed_keypoints", None) is not None:
            keypoints = results["transformed_keypoints"]
        elif results.get("keypoints", None) is not None:
            keypoints = results["keypoints"]
        else:
            raise ValueError("GenerateTarget requires 'transformed_keypoints' or 'keypoints'")

        keypoints_visible = results["keypoints_visible"]
        if keypoints_visible.ndim == 3 and keypoints_visible.shape[2] == 2:
            keypoints_visible, keypoints_visible_weights = (
                keypoints_visible[..., 0],
                keypoints_visible[..., 1],
            )
            results["keypoints_visible"] = keypoints_visible
            results["keypoints_visible_weights"] = keypoints_visible_weights
        keypoints_visibility = results.get("keypoints_visibility", None)

        if self.device:
            encoded = self._device_defer(results, keypoints, keypoints_visible, keypoints_visibility)
            if self.use_dataset_keypoint_weights and "keypoint_weights" in encoded:
                encoded["keypoint_weights"] = encoded["keypoint_weights"] * results["dataset_keypoint_weights"]
            results.update(encoded)
            return results

        if not isinstance(self.encoder, list):
            encoded = self._encode_single(
                self.encoder, results, keypoints, keypoints_visible, keypoints_visibility
            )
            # only override PackPoseInputs' default tables when non-empty
            if self.encoder.field_mapping_table:
                encoded["field_mapping_table"] = self.encoder.field_mapping_table
            if self.encoder.instance_mapping_table:
                encoded["instance_mapping_table"] = self.encoder.instance_mapping_table
            if self.encoder.label_mapping_table:
                encoded["label_mapping_table"] = self.encoder.label_mapping_table
        else:
            encoded_list = [
                self._encode_single(enc, results, keypoints, keypoints_visible, keypoints_visibility)
                for enc in self.encoder
            ]
            field_tab, inst_tab, label_tab = {}, {}, {}
            for enc in self.encoder:
                field_tab.update(enc.field_mapping_table)
                inst_tab.update(enc.instance_mapping_table)
                label_tab.update(enc.label_mapping_table)
            field_tab = field_tab or None
            inst_tab = inst_tab or None
            label_tab = label_tab or None

            if self.multilevel:
                keys = encoded_list[0].keys()
                encoded = {k: [e[k] for e in encoded_list] for k in keys}
            else:
                encoded = {}
                keypoint_weights = []
                for e in encoded_list:
                    for key, value in e.items():
                        if key == "keypoint_weights":
                            keypoint_weights.append(value)
                        elif key in encoded:
                            raise ValueError(f"Overlapping encoded key {key}")
                        else:
                            encoded[key] = value
                if keypoint_weights:
                    encoded["keypoint_weights"] = keypoint_weights
            if field_tab:
                encoded["field_mapping_table"] = field_tab
            if inst_tab:
                encoded["instance_mapping_table"] = inst_tab
            if label_tab:
                encoded["label_mapping_table"] = label_tab

        if self.use_dataset_keypoint_weights and "keypoint_weights" in encoded:
            if isinstance(encoded["keypoint_weights"], list):
                encoded["keypoint_weights"] = [
                    w * results["dataset_keypoint_weights"] for w in encoded["keypoint_weights"]
                ]
            else:
                encoded["keypoint_weights"] = encoded["keypoint_weights"] * results["dataset_keypoint_weights"]

        results.update(encoded)
        return results


@TRANSFORMS.register_module()
class Albumentation:
    """Image-only photometric/occlusion augs with the albumentations config
    schema (reference ``common_transforms.py:962`` wraps the albumentations
    package; every shipped recipe uses only the small op set implemented
    natively here — Blur, MedianBlur, GaussianBlur, GaussNoise,
    CoarseDropout, GridDropout, RandomBrightnessContrast,
    HueSaturationValue). If the albumentations package IS installed it is
    used instead, preserving exact upstream semantics.

    Each op fires independently with its probability ``p``; parameter
    sampling follows albumentations' conventions (odd blur kernels in
    ``[3, blur_limit]``, fractional hole sizes relative to the image, HSV
    shifts in ``[-limit, limit]``).
    """

    _NATIVE_OPS = (
        "Blur", "MedianBlur", "GaussianBlur", "GaussNoise", "CoarseDropout",
        "GridDropout", "RandomBrightnessContrast", "HueSaturationValue",
    )

    def __init__(self, transforms=None, keymap=None):
        self.transforms = [dict(t) for t in (transforms or [])]
        self.keymap = keymap
        try:
            import albumentations  # noqa: F401
            self._have_pkg = True
        except ImportError:
            self._have_pkg = False
            unsupported = [t["type"] for t in self.transforms if t["type"] not in self._NATIVE_OPS]
            if unsupported:
                raise ImportError(
                    f"Albumentation ops {unsupported} need the 'albumentations' "
                    "package (not installed); natively supported ops: "
                    f"{list(self._NATIVE_OPS)}")

    # -- native op implementations (albumentations semantics) ------------

    @staticmethod
    def _odd_ksize(rng, blur_limit):
        lo, hi = (3, blur_limit) if np.isscalar(blur_limit) else blur_limit
        k = int(rng.integers(lo // 2, hi // 2 + 1)) * 2 + 1
        return max(3, min(k, hi if hi % 2 else hi - 1))

    def _apply_native(self, img: np.ndarray, t: dict, rng) -> np.ndarray:
        kind = t["type"]
        if kind == "Blur":
            k = self._odd_ksize(rng, t.get("blur_limit", 7))
            return cv2.blur(img, (k, k))
        if kind == "MedianBlur":
            k = self._odd_ksize(rng, t.get("blur_limit", 7))
            return cv2.medianBlur(np.ascontiguousarray(img), k)
        if kind == "GaussianBlur":
            k = self._odd_ksize(rng, t.get("blur_limit", 7))
            sig = t.get("sigma_limit", 0)
            sigma = float(rng.uniform(*sig)) if isinstance(sig, (tuple, list)) else float(sig)
            return cv2.GaussianBlur(img, (k, k), sigmaX=sigma)
        if kind == "GaussNoise":
            lo, hi = t.get("var_limit", (10.0, 50.0))
            std = float(np.sqrt(rng.uniform(lo, hi)))
            noise = rng.normal(t.get("mean", 0.0), std, img.shape).astype(np.float32)
            return np.clip(img.astype(np.float32) + noise, 0, 255).astype(img.dtype)
        if kind == "RandomBrightnessContrast":
            b = t.get("brightness_limit", 0.2)
            c = t.get("contrast_limit", 0.2)
            b = (-b, b) if np.isscalar(b) else b
            c = (-c, c) if np.isscalar(c) else c
            alpha = 1.0 + float(rng.uniform(*c))
            beta = float(rng.uniform(*b)) * (255.0 if t.get("brightness_by_max", True) else float(img.mean()))
            return np.clip(img.astype(np.float32) * alpha + beta, 0, 255).astype(img.dtype)
        if kind == "HueSaturationValue":
            lims = [t.get("hue_shift_limit", 20), t.get("sat_shift_limit", 30), t.get("val_shift_limit", 20)]
            lims = [(-v, v) if np.isscalar(v) else v for v in lims]
            hsv = cv2.cvtColor(np.ascontiguousarray(img), cv2.COLOR_BGR2HSV).astype(np.int32)
            hsv[..., 0] = (hsv[..., 0] + int(rng.uniform(*lims[0]))) % 180
            hsv[..., 1] = np.clip(hsv[..., 1] + int(rng.uniform(*lims[1])), 0, 255)
            hsv[..., 2] = np.clip(hsv[..., 2] + int(rng.uniform(*lims[2])), 0, 255)
            return cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2BGR)
        if kind == "CoarseDropout":
            H, W = img.shape[:2]
            def _px(v, full):
                return int(round(v * full)) if isinstance(v, float) and v < 1.0 else int(v)
            max_h = _px(t.get("max_height", 8), H)
            max_w = _px(t.get("max_width", 8), W)
            min_h = _px(t.get("min_height", max_h), H)
            min_w = _px(t.get("min_width", max_w), W)
            n = int(rng.integers(t.get("min_holes", t.get("max_holes", 8)), t.get("max_holes", 8) + 1))
            out = img.copy()
            for _ in range(n):
                hh = int(rng.integers(min_h, max_h + 1))
                ww = int(rng.integers(min_w, max_w + 1))
                y = int(rng.integers(0, max(H - hh, 0) + 1))
                x = int(rng.integers(0, max(W - ww, 0) + 1))
                out[y:y + hh, x:x + ww] = t.get("fill_value", 0)
            return out
        if kind == "GridDropout":
            H, W = img.shape[:2]
            ratio = float(t.get("ratio", 0.5))
            lo = t.get("unit_size_min")
            hi = t.get("unit_size_max")
            if lo and hi:
                unit = int(rng.integers(int(lo), int(hi) + 1))
            else:
                unit = int(lo or max(min(H, W) // 10, 2))
            hole = max(1, int(unit * ratio))
            oy = int(rng.integers(0, unit)) if t.get("random_offset") else 0
            ox = int(rng.integers(0, unit)) if t.get("random_offset") else 0
            out = img.copy()
            for y in range(oy - unit, H, unit):
                for x in range(ox - unit, W, unit):
                    out[max(y, 0):max(y + hole, 0), max(x, 0):max(x + hole, 0)] = t.get("fill_value", 0)
            return out
        raise KeyError(kind)

    def __call__(self, results):
        materialize_image(results)  # lazy-loaded images carry bytes, not pixels
        img = results["img"]
        if self._have_pkg:  # pragma: no cover - albumentations not in image
            import albumentations as A

            aug = A.Compose([A.__dict__[t.pop("type")](**t) for t in map(dict, self.transforms)])
            results["img"] = aug(image=img)["image"]
            return results
        rng = np.random.default_rng(np.random.randint(0, 2**31))
        for t in self.transforms:
            if rng.uniform() < t.get("p", 0.5):
                img = self._apply_native(img, t, rng)
        results["img"] = img
        return results
