"""Mixed-image augmentations for one-stage training (YOLOX-Pose / RTMO).

Behavioral parity with reference
``mmpose/datasets/transforms/mix_img_transforms.py`` (Mosaic :81-286,
YOLOXMixUp :289-478). Host-side NumPy/cv2 — these run in the input pipeline,
off the device. Aux samples are drawn through ``results['dataset']`` which
the dataset injects in bottomup mode.
"""

from __future__ import annotations

import copy
import random
from collections import defaultdict
from typing import Optional, Sequence, Tuple

import cv2
import numpy as np

from probpose_code_tpu.registry import TRANSFORMS
from probpose_code_tpu.structures.bbox import bbox_clip_border, flip_bbox
from probpose_code_tpu.structures.keypoint import flip_keypoints, keypoint_clip_border
from probpose_code_tpu.datasets.transforms.loading import materialize_image


class MixImageTransform:
    """Base: sample aux images from the dataset, run pre_transform, mix."""

    num_aux_image = 1

    def __init__(self, pre_transform: Optional[Sequence[dict]] = None, prob: float = 1.0):
        self.prob = prob
        if pre_transform is None:
            self.pre_transform = None
        else:
            from probpose_code_tpu.datasets.base_dataset import Compose

            self.pre_transform = Compose(pre_transform)

    def __call__(self, results: dict) -> dict:
        materialize_image(results)  # lazy-loaded images carry bytes, not pixels
        if random.uniform(0, 1) < self.prob and results.get("dataset") is not None:
            dataset = results.pop("dataset")
            results["mixed_data_list"] = self._get_mixed_data_list(dataset)
            results = self.apply_mix(results)
            results.pop("mixed_data_list", None)
            results["dataset"] = dataset
        return results

    def _get_mixed_data_list(self, dataset):
        indexes = [random.randint(0, len(dataset) - 1) for _ in range(self.num_aux_image)]
        mixed = [copy.deepcopy(dataset.get_data_info(i)) for i in indexes]
        if self.pre_transform is not None:
            for i, data in enumerate(mixed):
                data["dataset"] = dataset
                out = self.pre_transform(data)
                out.pop("dataset", None)
                mixed[i] = out
        # aux samples are consumed by raw pixel reads (cv2.resize of
        # results['img']) — a lazily-loaded aux image would be the all-zero
        # dummy, silently blacking out mosaic tiles / the mixup partner
        return [materialize_image(m) for m in mixed]


def _ensure_fields(data: dict) -> dict:
    """Default bbox_score/category_id/area like the reference parse."""
    n = len(data.get("bbox", []))
    data.setdefault("bbox_score", np.ones(n, dtype=np.float32))
    data.setdefault("category_id", np.ones(n, dtype=np.int64))
    if "area" not in data or data["area"] is None:
        b = np.asarray(data.get("bbox", np.zeros((0, 4))))
        data["area"] = np.clip((b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1]) * 0.53, 1, None)
    return data


@TRANSFORMS.register_module()
class Mosaic(MixImageTransform):
    """4-image mosaic (reference :81-286): each image resized by its
    min-fit ratio, pasted into one quadrant of a 2x-scale canvas around a
    random center; annotations rescaled + translated, then clipped."""

    num_aux_image = 3

    def __init__(
        self,
        img_scale: Tuple[int, int] = (640, 640),
        center_range: Tuple[float, float] = (0.5, 1.5),
        pad_val: float = 114.0,
        pre_transform: Optional[Sequence[dict]] = None,
        prob: float = 1.0,
    ):
        super().__init__(pre_transform=pre_transform, prob=prob)
        self.img_scale = tuple(img_scale)
        self.center_range = center_range
        self.pad_val = pad_val

    def apply_mix(self, results: dict) -> dict:
        mixed = results.pop("mixed_data_list")
        img, annos = self._create_mosaic_image(results, mixed)
        bboxes = bbox_clip_border(annos["bboxes"], (2 * self.img_scale[0], 2 * self.img_scale[1]))
        kpts, kvis = keypoint_clip_border(
            annos["keypoints"], annos["keypoints_visible"], (2 * self.img_scale[0], 2 * self.img_scale[1])
        )
        results.update(
            img=img, img_shape=img.shape, bbox=bboxes, category_id=annos["category_id"],
            bbox_score=annos["bbox_scores"], keypoints=kpts, keypoints_visible=kvis, area=annos["area"],
        )
        return results

    def _create_mosaic_image(self, results, mixed):
        w_s, h_s = self.img_scale
        canvas = np.full((h_s * 2, w_s * 2, 3), self.pad_val, dtype=results["img"].dtype)
        center = (
            int(random.uniform(*self.center_range) * w_s),
            int(random.uniform(*self.center_range) * h_s),
        )
        annos = defaultdict(list)
        for loc, data in zip(("top_left", "top_right", "bottom_left", "bottom_right"), (results, *mixed)):
            data = _ensure_fields(data)
            img = data["img"]
            h, w = img.shape[:2]
            ratio = min(h_s / h, w_s / w)
            img = cv2.resize(img, (int(w * ratio), int(h * ratio)))
            paste, crop = self._mosaic_combine(loc, center, img.shape[:2][::-1])
            x1p, y1p, x2p, y2p = paste
            x1c, y1c, x2c, y2c = crop
            canvas[y1p:y2p, x1p:x2p] = img[y1c:y2c, x1c:x2c]
            padw, padh = x1p - x1c, y1p - y1c
            if "bbox" in data and len(data["bbox"]):
                b = np.asarray(data["bbox"], np.float32) * ratio
                b[..., ::2] += padw
                b[..., 1::2] += padh
                annos["bboxes"].append(b)
                annos["bbox_scores"].append(data["bbox_score"])
                annos["category_id"].append(data["category_id"])
                k = np.asarray(data["keypoints"], np.float32) * ratio
                k[..., 0] += padw
                k[..., 1] += padh
                annos["keypoints"].append(k)
                annos["keypoints_visible"].append(np.asarray(data["keypoints_visible"], np.float32))
                annos["area"].append(np.asarray(data["area"], np.float32) * ratio**2)
        for key in annos:
            annos[key] = np.concatenate(annos[key]) if annos[key] else np.zeros((0,))
        return canvas, annos

    def _mosaic_combine(self, loc, center, img_shape):
        cx, cy = center
        w, h = img_shape
        if loc == "top_left":
            x1, y1, x2, y2 = max(cx - w, 0), max(cy - h, 0), cx, cy
            crop = (w - (x2 - x1), h - (y2 - y1), w, h)
        elif loc == "top_right":
            x1, y1, x2, y2 = cx, max(cy - h, 0), min(cx + w, self.img_scale[0] * 2), cy
            crop = (0, h - (y2 - y1), min(w, x2 - x1), h)
        elif loc == "bottom_left":
            x1, y1, x2, y2 = max(cx - w, 0), cy, cx, min(self.img_scale[1] * 2, cy + h)
            crop = (w - (x2 - x1), 0, w, min(y2 - y1, h))
        else:
            x1, y1, x2, y2 = cx, cy, min(cx + w, self.img_scale[0] * 2), min(self.img_scale[1] * 2, cy + h)
            crop = (0, 0, min(w, x2 - x1), min(y2 - y1, h))
        return (x1, y1, x2, y2), crop


@TRANSFORMS.register_module()
class YOLOXMixUp(MixImageTransform):
    """Two-image 0.5/0.5 mixup with jittered/flipped aux image
    (reference :289-478)."""

    num_aux_image = 1

    def __init__(
        self,
        img_scale: Tuple[int, int] = (640, 640),
        ratio_range: Tuple[float, float] = (0.5, 1.5),
        flip_ratio: float = 0.5,
        pad_val: float = 114.0,
        pre_transform: Optional[Sequence[dict]] = None,
        prob: float = 1.0,
    ):
        super().__init__(pre_transform=pre_transform, prob=prob)
        self.img_scale = tuple(img_scale)
        self.ratio_range = ratio_range
        self.flip_ratio = flip_ratio
        self.pad_val = pad_val

    def apply_mix(self, results: dict) -> dict:
        mixed = results.pop("mixed_data_list")
        aux = _ensure_fields(mixed[0])
        if len(aux.get("keypoints", [])) == 0:
            return results
        results = _ensure_fields(results)
        img, annos = self._create_mixup_image(results, aux)
        h, w = img.shape[:2]
        bboxes = bbox_clip_border(annos["bboxes"], (w, h))
        kpts, kvis = keypoint_clip_border(annos["keypoints"], annos["keypoints_visible"], (w, h))
        results.update(
            img=img.astype(np.uint8), img_shape=img.shape, bbox=bboxes,
            category_id=annos["category_id"], bbox_score=annos["bbox_scores"],
            keypoints=kpts, keypoints_visible=kvis, area=annos["area"],
        )
        return results

    def _create_mixup_image(self, results, aux):
        aux_img = aux["img"]
        out = np.full((self.img_scale[1], self.img_scale[0], 3), self.pad_val, dtype=aux_img.dtype)
        ratio = min(self.img_scale[1] / aux_img.shape[0], self.img_scale[0] / aux_img.shape[1])
        aux_rs = cv2.resize(aux_img, (int(aux_img.shape[1] * ratio), int(aux_img.shape[0] * ratio)))
        out[: aux_rs.shape[0], : aux_rs.shape[1]] = aux_rs

        jit = random.uniform(*self.ratio_range)
        ratio *= jit
        out = cv2.resize(out, (int(out.shape[1] * jit), int(out.shape[0] * jit)))
        is_flip = random.uniform(0, 1) > self.flip_ratio
        if is_flip:
            out = out[:, ::-1, :]

        ori = results["img"]
        ah, aw = out.shape[:2]
        h, w = ori.shape[:2]
        padded = np.full((max(ah, h), max(aw, w), 3), self.pad_val, dtype=np.uint8)
        padded[:ah, :aw] = out
        dy = random.randint(0, max(0, padded.shape[0] - h))
        dx = random.randint(0, max(0, padded.shape[1] - w))
        crop = padded[dy:dy + h, dx:dx + w]
        mix = 0.5 * ori + 0.5 * crop

        annos = defaultdict(list)
        b = np.asarray(aux["bbox"], np.float32) * ratio
        b = bbox_clip_border(b, (aw, ah))
        if is_flip:
            b = flip_bbox(b, [aw, ah], "xyxy")
        b[..., ::2] -= dx
        b[..., 1::2] -= dy
        annos["bboxes"] = [np.asarray(results["bbox"], np.float32), b]
        annos["bbox_scores"] = [results["bbox_score"], aux["bbox_score"]]
        annos["category_id"] = [results["category_id"], aux["category_id"]]

        k = np.asarray(aux["keypoints"], np.float32) * ratio
        kv = np.asarray(aux["keypoints_visible"], np.float32)
        k, kv = keypoint_clip_border(k, kv, (aw, ah))
        if is_flip:
            k, kv = flip_keypoints(k, kv, (aw, ah), aux["flip_indices"])
        k[..., 0] -= dx
        k[..., 1] -= dy
        annos["keypoints"] = [np.asarray(results["keypoints"], np.float32), k]
        annos["keypoints_visible"] = [np.asarray(results["keypoints_visible"], np.float32), kv]
        annos["area"] = [np.asarray(results["area"], np.float32), np.asarray(aux["area"], np.float32) * ratio**2]
        return mix, {key: np.concatenate(v) for key, v in annos.items()}
