"""Remaining codecs: MotionBERTLabel, EDPoseLabel, Hand3DHeatmap.

Behavioral parity targets:
- MotionBERTLabel: reference ``mmpose/codecs/motionbert_label.py:14-232`` —
  2D inputs normalized to [-1, 1] by image width, 3D targets converted to
  image coordinates (camera intrinsics), root-centered, scaled by the
  2.5D factor at test time.
- EDPoseLabel: reference ``edpose_label.py:12-147`` — normalize keypoints/
  boxes/areas by image size; decode selects top-k scored queries and
  denormalizes.
- Hand3DHeatmap: reference ``hand_3d_heatmap.py:13-208`` — 3D gaussian
  heatmaps over (D, H, W) with root-relative depth binning, plus root
  depth and hand-type labels.
"""

from __future__ import annotations

from copy import deepcopy
from typing import Optional, Tuple

import numpy as np

from probpose_code_tpu.registry import KEYPOINT_CODECS
from .base import BaseKeypointCodec


def camera_to_image_coord(root_index: int, kpts_3d: np.ndarray, camera_param: dict):
    """Project camera-space 3D keypoints to image coords + 2.5D factor
    (reference ``codecs/utils/camera_image_projection.py``)."""
    root = kpts_3d[..., root_index, :]
    tl_kpt = root.copy()
    tl_kpt[..., :2] -= 1.0
    br_kpt = root.copy()
    br_kpt[..., :2] += 1.0
    tl = _camera_to_pixel(tl_kpt, camera_param)
    br = _camera_to_pixel(br_kpt, camera_param)
    rectangle_3d_size = 2.0
    ratio = (br[..., 0] - tl[..., 0] + 0.001) / rectangle_3d_size
    factor = rectangle_3d_size / (br[..., 0] - tl[..., 0] + 0.001)

    kpts_3d_image = np.zeros_like(kpts_3d)
    kpts_3d_image[..., :2] = _camera_to_pixel(kpts_3d, camera_param)[..., :2]
    kpts_3d_depth = ratio[..., None] * (kpts_3d[..., 2] - kpts_3d[..., root_index:root_index + 1, 2])
    kpts_3d_image[..., 2] = kpts_3d_depth
    return kpts_3d_image, factor


def _camera_to_pixel(kpts_3d: np.ndarray, camera_param: dict) -> np.ndarray:
    f = np.asarray(camera_param["f"], np.float64).reshape(-1)
    c = np.asarray(camera_param["c"], np.float64).reshape(-1)
    out = kpts_3d.copy()
    z = np.clip(kpts_3d[..., 2], 1e-8, None)
    out[..., 0] = kpts_3d[..., 0] / z * f[0] + c[0]
    out[..., 1] = kpts_3d[..., 1] / z * f[-1] + c[-1]
    return out


@KEYPOINT_CODECS.register_module()
class MotionBERTLabel(BaseKeypointCodec):
    auxiliary_encode_keys = {"lifting_target", "lifting_target_visible", "camera_param", "factor"}

    label_mapping_table = dict(
        trajectory_weights="trajectory_weights",
        lifting_target_label="lifting_target_label",
        lifting_target_weight="lifting_target_weight",
    )

    def __init__(self, num_keypoints: int, root_index: int = 0, remove_root: bool = False,
                 save_index: bool = False, concat_vis: bool = False, rootrel: bool = False,
                 mode: str = "test"):
        super().__init__()
        self.num_keypoints = num_keypoints
        self.root_index = root_index
        self.remove_root = remove_root
        self.save_index = save_index
        self.concat_vis = concat_vis
        self.rootrel = rootrel
        assert mode.lower() in ("train", "test")
        self.mode = mode.lower()

    def encode(self, keypoints, keypoints_visible=None, lifting_target=None,
               lifting_target_visible=None, camera_param=None, factor=None) -> dict:
        assert lifting_target is not None
        if keypoints_visible is None:
            keypoints_visible = np.ones(keypoints.shape[:2], np.float32)
        if lifting_target_visible is None:
            lifting_target_weight = np.ones(lifting_target.shape[:-1], np.float32)
        else:
            lifting_target_weight = (lifting_target_visible > 0.5).astype(np.float32)
        camera_param = dict(camera_param or {})

        kpt_labels = keypoints.copy().astype(np.float32)
        if kpt_labels.ndim == 2:
            kpt_labels = kpt_labels[None]
        target_label = lifting_target.copy().astype(np.float32)

        assert "w" in camera_param and "h" in camera_param
        w, h = camera_param["w"], camera_param["h"]
        kpt_labels[..., :2] = kpt_labels[..., :2] / w * 2 - np.array([1, h / w], np.float32)

        T = kpt_labels.shape[0]
        factor_ = np.full(T, 4, np.float32)
        if "f" in camera_param and "c" in camera_param:
            target_label, factor_ = camera_to_image_coord(self.root_index, target_label, camera_param)
        if self.mode == "train":
            w_, h_ = w / 1000, h / 1000
            target_label[..., :2] = target_label[..., :2] / w_ * 2 - np.array([1, h_ / w_], np.float32)
            target_label[..., 2] = target_label[..., 2] / w_ * 2
        target_label = target_label - target_label[..., self.root_index:self.root_index + 1, :]
        if factor is None or np.asarray(factor).reshape(-1)[0] == 0:
            factor = factor_
        factor = np.asarray(factor, np.float32)
        if factor.ndim == 1:
            factor = factor[:, None]
        if self.mode == "test":
            target_label = target_label * factor[..., None]

        if self.concat_vis:
            vis = keypoints_visible[..., None] if keypoints_visible.ndim == 2 else keypoints_visible
            kpt_labels = np.concatenate([kpt_labels[..., :2], vis], axis=-1)

        return dict(
            keypoint_labels=kpt_labels,
            keypoint_labels_visible=keypoints_visible,
            lifting_target_label=target_label,
            lifting_target_weight=lifting_target_weight,
            factor=factor,
        )

    def decode(self, encoded: np.ndarray, w: Optional[np.ndarray] = None, h: Optional[np.ndarray] = None,
               factor: Optional[np.ndarray] = None) -> Tuple[np.ndarray, np.ndarray]:
        """Denormalize (reference :182-232): scale by w/1000 and /2, divide by
        the 2.5D factor, root-center."""
        kpts = encoded.copy()
        scores = np.ones(kpts.shape[:-1], np.float32)
        if self.rootrel:
            kpts[..., 0, :] = 0
        if w is not None and np.asarray(w).size > 0:
            w = np.asarray(w, np.float32)
            h = np.asarray(h, np.float32)
            trans = np.append(np.ones(w.size), h / w)  # (2T,)? keep reference broadcast
            kpts[..., :2] = (kpts[..., :2] + trans.reshape(-1, 2)[None, None]) * w.reshape(-1)[None, None, None] / 2
            kpts[..., 2:] = kpts[..., 2:] * w.reshape(-1)[None, None, None] / 2
        if factor is not None and np.asarray(factor).size > 0:
            kpts = kpts / np.asarray(factor, np.float32)[..., None]
        kpts = kpts / 1000.0
        kpts = kpts - kpts[..., self.root_index:self.root_index + 1, :]
        return kpts, scores


@KEYPOINT_CODECS.register_module()
class EDPoseLabel(BaseKeypointCodec):
    auxiliary_encode_keys = {"area", "bboxes", "img_shape"}

    def __init__(self, num_select: int = 100, num_keypoints: int = 17):
        super().__init__()
        self.num_select = num_select
        self.num_keypoints = num_keypoints

    def encode(self, img_shape, keypoints, keypoints_visible=None, area=None, bboxes=None) -> dict:
        from probpose_code_tpu.structures.bbox import bbox_xyxy2cs

        w, h = img_shape
        if keypoints_visible is None:
            keypoints_visible = np.ones(keypoints.shape[:2], np.float32)
        if bboxes is not None:
            center, scale = bbox_xyxy2cs(bboxes)
            bboxes = np.concatenate([center, scale], axis=-1) / np.array([w, h, w, h], np.float32)
        if area is not None:
            area = np.asarray(area, np.float32) / float(w * h)
        if keypoints is not None:
            keypoints = keypoints / np.array([w, h], np.float32)
        return dict(keypoints=keypoints, area=area, bbox=bboxes, keypoints_visible=keypoints_visible)

    def decode(self, input_shapes, pred_logits, pred_boxes, pred_keypoints):
        """Top-``num_select`` flat (query, class) scores denormalized to
        input pixels (reference ``edpose_label.py:102-147``).

        ``input_shapes`` is (h, w) of the resized model input — the
        reference's BottomupRandomChoiceResize stores ``input_size`` as
        ``img.shape[:2]`` (``bottomup_transforms.py:926``), which is what
        EDPoseHead.predict forwards. ``pred_logits`` (nq, num_classes) are
        sigmoided scores; ``pred_keypoints`` (nq, 3K) is the head's
        xyxy..zz layout. Returns (bboxes, keypoints, keypoint_scores)."""
        K = self.num_keypoints
        logits = np.asarray(pred_logits)
        if logits.ndim == 1:
            logits = logits[:, None]
        prob = logits.reshape(-1)
        topk = np.argsort(-prob, kind="stable")[: self.num_select]
        scores = np.tile(prob[topk][:, None], (1, K))
        topk_q = topk // logits.shape[1]
        boxes = np.asarray(pred_boxes).reshape(-1, 4)
        xyxy = np.concatenate(
            [boxes[:, :2] - boxes[:, 2:] / 2, boxes[:, :2] + boxes[:, 2:] / 2], axis=-1
        )[topk_q]
        h, w = np.asarray(input_shapes).reshape(-1)[:2]
        scale_fct = np.asarray([w, h, w, h], np.float32)
        bboxes = xyxy * scale_fct
        kpts = np.asarray(pred_keypoints).reshape(len(boxes), -1)[topk_q]
        kpts = (kpts[:, : K * 2] * np.tile(np.asarray([w, h], np.float32), K)).reshape(-1, K, 2)
        return bboxes, kpts, scores


@KEYPOINT_CODECS.register_module()
class Hand3DHeatmap(BaseKeypointCodec):
    """3D gaussian heatmaps + root depth + hand type (InterHand)."""

    auxiliary_encode_keys = {
        "dataset_keypoint_weights", "rel_root_depth", "rel_root_valid",
        "hand_type", "hand_type_valid", "focal", "principal_pt",
    }

    label_mapping_table = dict(
        keypoint_weights="keypoint_weights", root_depth_weight="root_depth_weight",
        type_weight="type_weight", root_depth="root_depth", type="type",
    )

    def __init__(self, image_size=(256, 256), root_heatmap_size: int = 64,
                 heatmap_size=(64, 64, 64), heatmap3d_depth_bound: float = 400.0,
                 heatmap_size_root: int = 64, root_depth_bound: float = 400.0,
                 depth_size: int = 64, use_different_joint_weights: bool = False,
                 sigma: int = 2, joint_indices=None, max_bound: float = 1.0):
        super().__init__()
        self.image_size = np.array(image_size)
        self.root_heatmap_size = root_heatmap_size
        self.heatmap_size = np.array(heatmap_size)
        self.heatmap3d_depth_bound = heatmap3d_depth_bound
        self.heatmap_size_root = heatmap_size_root
        self.root_depth_bound = root_depth_bound
        self.depth_size = depth_size
        self.use_different_joint_weights = use_different_joint_weights
        self.sigma = sigma
        self.joint_indices = joint_indices
        self.max_bound = max_bound
        self.scale_factor = (np.array(image_size) / self.heatmap_size[:-1]).astype(np.float32)

    def encode(self, keypoints, keypoints_visible=None, dataset_keypoint_weights=None,
               rel_root_depth=0.0, rel_root_valid=1.0, hand_type=None, hand_type_valid=None,
               focal=None, principal_pt=None) -> dict:
        N, K, _ = keypoints.shape
        if keypoints_visible is None:
            keypoints_visible = np.ones((N, K), np.float32)
        W, H, D = self.heatmap_size
        # keypoints: (N, K, 3) with z in mm relative to root
        kpts = keypoints.copy().astype(np.float64)
        kpts[..., 0] = kpts[..., 0] / self.image_size[0] * W
        kpts[..., 1] = kpts[..., 1] / self.image_size[1] * H
        kpts[..., 2] = (kpts[..., 2] / self.heatmap3d_depth_bound + 0.5) * D

        heatmaps = np.zeros((K, D, H, W), np.float32)
        weights = keypoints_visible.copy()
        zz, yy, xx = np.meshgrid(np.arange(D), np.arange(H), np.arange(W), indexing="ij")
        for n in range(N):
            for k in range(K):
                if keypoints_visible[n, k] < 0.5:
                    continue
                mu = kpts[n, k]
                if not (0 <= mu[0] < W and 0 <= mu[1] < H and 0 <= mu[2] < D):
                    weights[n, k] = 0
                    continue
                g = np.exp(-((xx - mu[0]) ** 2 + (yy - mu[1]) ** 2 + (zz - mu[2]) ** 2) / (2 * self.sigma**2))
                heatmaps[k] = np.maximum(heatmaps[k], g * self.max_bound)
        if self.use_different_joint_weights and dataset_keypoint_weights is not None:
            weights = weights * dataset_keypoint_weights[None]

        root_depth = np.array([(rel_root_depth / self.root_depth_bound + 0.5) * self.heatmap_size_root], np.float32)
        return dict(
            heatmaps=heatmaps.reshape(K * D, H, W),
            keypoint_weights=weights,
            root_depth=root_depth,
            root_depth_weight=np.array([rel_root_valid], np.float32),
            type=np.asarray(hand_type if hand_type is not None else [0, 0], np.float32).reshape(1, -1),
            type_weight=np.asarray(hand_type_valid if hand_type_valid is not None else 0, np.float32).reshape(1, -1),
        )

    def decode(self, heatmaps: np.ndarray, root_depth: np.ndarray = None,
               hand_type: np.ndarray = None) -> Tuple[np.ndarray, np.ndarray]:
        """3D argmax -> image-space xy + metric depth (reference :171-208)."""
        W, H, D = self.heatmap_size
        K = heatmaps.shape[0] // D
        hm = heatmaps.reshape(K, D, H, W)
        flat = hm.reshape(K, -1)
        idx = flat.argmax(-1)
        scores = flat[np.arange(K), idx]
        z = idx // (H * W)
        y = (idx % (H * W)) // W
        x = idx % W
        kpts = np.stack([
            x / W * self.image_size[0],
            y / H * self.image_size[1],
            (z / D - 0.5) * self.heatmap3d_depth_bound,
        ], -1).astype(np.float32)
        return kpts[None], scores[None].astype(np.float32)


@KEYPOINT_CODECS.register_module()
class YOLOXPoseAnnotationProcessor(BaseKeypointCodec):
    """Annotation-space preprocessing for YOLOX-Pose/RTMO training
    (reference ``codecs/annotation_processors.py``): optionally expand each
    bbox to cover its visible keypoints, and convert COCO category ids to
    0-based labels. ``decode`` is a no-op (detection-style heads decode in
    their own predict programs)."""

    auxiliary_encode_keys = {"category_id", "bbox"}
    label_mapping_table = dict(
        bbox="bboxes", bbox_labels="labels", keypoints="keypoints",
        keypoints_visible="keypoints_visible", area="areas",
    )
    instance_mapping_table = dict(
        bbox="bboxes", bbox_score="bbox_scores", keypoints="keypoints",
        keypoints_visible="keypoints_visible",
    )

    def __init__(self, expand_bbox: bool = False, input_size=None):
        super().__init__()
        self.expand_bbox = expand_bbox

    def encode(self, keypoints=None, keypoints_visible=None, bbox=None, category_id=None):
        results = {}
        if self.expand_bbox and bbox is not None:
            vis = keypoints_visible
            if vis is not None and vis.ndim == 3:
                vis = vis[..., 0]
            kmin = keypoints.copy()
            kmin[vis == 0] = np.inf
            bbox = bbox.copy()
            bbox[..., :2] = np.minimum(bbox[..., :2], kmin.min(axis=1))
            kmax = keypoints.copy()
            kmax[vis == 0] = -np.inf
            bbox[..., 2:] = np.maximum(bbox[..., 2:], kmax.max(axis=1))
            results["bbox"] = bbox
        if category_id is not None:
            results["bbox_labels"] = np.asarray(category_id).astype(np.int8) - 1
        return results

    def decode(self, *args, **kwargs):
        pass
