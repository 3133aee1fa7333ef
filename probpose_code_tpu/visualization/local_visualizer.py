"""Pose visualization (OpenCV backend).

Parity target: reference ``mmpose/visualization/local_visualizer.py:45``
(PoseLocalVisualizer: keypoint/skeleton/bbox drawing :215, heatmap overlay
:487, add_datasample :693) and FastVisualizer. The reference draws through
mmengine's matplotlib visualizer; here drawing is direct cv2 (faster, no GUI
dependency), with the same metainfo-driven colors and skeleton links.
"""

from __future__ import annotations

import os
import os.path as osp
from typing import Optional

import cv2
import numpy as np

from probpose_code_tpu.registry import VISUALIZERS


@VISUALIZERS.register_module()
class PoseLocalVisualizer:
    def __init__(
        self,
        name: str = "visualizer",
        radius: int = 3,
        line_width: int = 1,
        kpt_thr: float = 0.3,
        alpha: float = 0.8,
        show_keypoint_weight: bool = False,
        vis_backends=None,
        save_dir: Optional[str] = None,
        **kwargs,
    ):
        self.name = name
        self.radius = radius
        self.line_width = line_width
        self.kpt_thr = kpt_thr
        self.alpha = alpha
        self.show_keypoint_weight = show_keypoint_weight
        self.save_dir = save_dir
        self.dataset_meta: Optional[dict] = None

    def set_dataset_meta(self, dataset_meta: dict) -> None:
        self.dataset_meta = dataset_meta

    # ------------------------------------------------------------------

    def draw_instances(
        self,
        image: np.ndarray,
        keypoints: np.ndarray,
        keypoint_scores: Optional[np.ndarray] = None,
        bboxes: Optional[np.ndarray] = None,
        kpt_thr: Optional[float] = None,
    ) -> np.ndarray:
        """Draw keypoints + skeleton (+ bboxes) on a BGR image."""
        img = image.copy()
        kpt_thr = self.kpt_thr if kpt_thr is None else kpt_thr
        meta = self.dataset_meta or {}
        kpt_colors = meta.get("keypoint_colors")
        links = meta.get("skeleton_links", [])
        link_colors = meta.get("skeleton_link_colors")

        keypoints = np.asarray(keypoints)
        if keypoints.ndim == 2:
            keypoints = keypoints[None]
        N, K, _ = keypoints.shape
        if keypoint_scores is None:
            keypoint_scores = np.ones((N, K), dtype=np.float32)
        keypoint_scores = np.asarray(keypoint_scores).reshape(N, K)

        if bboxes is not None:
            for bbox in np.asarray(bboxes).reshape(-1, 4):
                x1, y1, x2, y2 = bbox.astype(int)
                cv2.rectangle(img, (x1, y1), (x2, y2), (0, 255, 0), self.line_width)

        for n in range(N):
            for li, (a, b) in enumerate(links):
                if keypoint_scores[n, a] < kpt_thr or keypoint_scores[n, b] < kpt_thr:
                    continue
                color = tuple(int(c) for c in (link_colors[li] if link_colors is not None else (0, 255, 0)))
                pa = tuple(np.round(keypoints[n, a]).astype(int))
                pb = tuple(np.round(keypoints[n, b]).astype(int))
                cv2.line(img, pa, pb, color, self.line_width + 1)
            for k in range(K):
                if keypoint_scores[n, k] < kpt_thr:
                    continue
                color = tuple(int(c) for c in (kpt_colors[k] if kpt_colors is not None else (0, 0, 255)))
                center = tuple(np.round(keypoints[n, k]).astype(int))
                cv2.circle(img, center, self.radius, color, -1)
        return img

    def draw_heatmaps(self, image: np.ndarray, heatmaps: np.ndarray) -> np.ndarray:
        """Overlay the max-projected heatmap as a JET colormap."""
        hm = np.asarray(heatmaps)
        if hm.ndim == 3:
            hm = hm.max(axis=0)
        hm = hm / max(hm.max(), 1e-6)
        hm_img = cv2.applyColorMap((hm * 255).astype(np.uint8), cv2.COLORMAP_JET)
        hm_img = cv2.resize(hm_img, (image.shape[1], image.shape[0]))
        return cv2.addWeighted(image, 1 - self.alpha * 0.6, hm_img, self.alpha * 0.6, 0)

    def add_datasample(
        self,
        name: str,
        image: np.ndarray,
        data_sample=None,
        draw_gt: bool = False,
        draw_pred: bool = True,
        draw_heatmap: bool = False,
        show: bool = False,
        out_file: Optional[str] = None,
        kpt_thr: float = 0.3,
        **kwargs,
    ) -> np.ndarray:
        img = image.copy()
        if data_sample is not None:
            if draw_pred and "pred_instances" in data_sample:
                inst = data_sample.pred_instances
                img = self.draw_instances(
                    img,
                    np.asarray(inst.keypoints),
                    np.asarray(inst.get("keypoint_scores")) if "keypoint_scores" in inst else None,
                    np.asarray(inst.get("bboxes")) if "bboxes" in inst else None,
                    kpt_thr=kpt_thr,
                )
                if draw_heatmap and "pred_fields" in data_sample._fields and "heatmaps" in data_sample.pred_fields:
                    img = self.draw_heatmaps(img, np.asarray(data_sample.pred_fields.heatmaps))
            if draw_gt and "gt_instances" in data_sample._fields and "keypoints" in data_sample.gt_instances:
                inst = data_sample.gt_instances
                img = self.draw_instances(
                    img,
                    np.asarray(inst.keypoints),
                    np.asarray(inst.get("keypoints_visible")) if "keypoints_visible" in inst else None,
                    kpt_thr=0.5,
                )
        if out_file:
            os.makedirs(osp.dirname(osp.abspath(out_file)), exist_ok=True)
            cv2.imwrite(out_file, img)
        elif self.save_dir:
            os.makedirs(self.save_dir, exist_ok=True)
            cv2.imwrite(osp.join(self.save_dir, f"{name}.jpg"), img)
        return img


@VISUALIZERS.register_module()
class FastVisualizer:
    """Minimal overlay drawer for streaming/webcam use (reference
    ``visualization/fast_visualizer.py``)."""

    def __init__(self, metainfo: dict, radius: int = 6, line_width: int = 3, kpt_thr: float = 0.3):
        self.metainfo = metainfo
        self.radius = radius
        self.line_width = line_width
        self.kpt_thr = kpt_thr

    def draw_pose(self, img: np.ndarray, instances) -> None:
        keypoints = np.asarray(instances.keypoints)
        scores = np.asarray(instances.keypoint_scores)
        links = self.metainfo.get("skeleton_links", [])
        for n in range(keypoints.shape[0]):
            for a, b in links:
                if scores[n, a] > self.kpt_thr and scores[n, b] > self.kpt_thr:
                    cv2.line(
                        img,
                        tuple(keypoints[n, a].astype(int)),
                        tuple(keypoints[n, b].astype(int)),
                        (0, 255, 0),
                        self.line_width,
                    )
            for k in range(keypoints.shape[1]):
                if scores[n, k] > self.kpt_thr:
                    cv2.circle(img, tuple(keypoints[n, k].astype(int)), self.radius, (0, 0, 255), -1)


@VISUALIZERS.register_module()
class SimCCVisualizer:
    """Render SimCC x/y 1-D label vectors as a 2D map beside the image
    (reference ``visualization/simcc_vis.py:10``)."""

    def draw_instance_xy_heatmap(self, simcc_xy, image: np.ndarray, n: int = 20) -> np.ndarray:
        simcc_x, simcc_y = simcc_xy
        simcc_x = np.asarray(simcc_x)
        simcc_y = np.asarray(simcc_y)
        # outer-product 2D map per keypoint, max-composited
        maps = np.einsum("kx,ky->kyx", simcc_x.reshape(simcc_x.shape[-2], -1),
                         simcc_y.reshape(simcc_y.shape[-2], -1))
        hm = maps.max(0)
        hm = (hm - hm.min()) / max(hm.max() - hm.min(), 1e-6)
        hm8 = (hm * 255).astype(np.uint8)
        color = cv2.applyColorMap(hm8, cv2.COLORMAP_JET)
        color = cv2.resize(color, (image.shape[1], image.shape[0]))
        return cv2.addWeighted(image, 0.5, color, 0.5, 0)


@VISUALIZERS.register_module()
class Pose3dLocalVisualizer(PoseLocalVisualizer):
    """3D skeleton rendering (reference ``local_visualizer_3d.py:19``):
    orthographic projection of the lifted pose next to the 2D overlay."""

    def draw_3d_instances(self, image: np.ndarray, keypoints_3d: np.ndarray,
                          axis_azimuth: float = 70.0, panel_size: int = 512) -> np.ndarray:
        kpts = np.asarray(keypoints_3d).reshape(-1, 3)
        # normalize to the panel, simple rotation about the z axis
        a = np.deg2rad(axis_azimuth)
        rot = np.array([[np.cos(a), -np.sin(a)], [np.sin(a), np.cos(a)]])
        xy = kpts[:, :2] @ rot.T
        proj = np.stack([xy[:, 0], -kpts[:, 2]], -1)
        lo, hi = proj.min(0), proj.max(0)
        span = np.maximum(hi - lo, 1e-6)
        pts = ((proj - lo) / span * (panel_size * 0.8) + panel_size * 0.1).astype(int)
        panel = np.full((panel_size, panel_size, 3), 255, np.uint8)
        links = (getattr(self, 'dataset_meta', None) or {}).get('skeleton_links', [])
        for link in links:
            u, v = link
            if u < len(pts) and v < len(pts):
                cv2.line(panel, tuple(pts[u]), tuple(pts[v]), (60, 140, 60), 2)
        for p in pts:
            cv2.circle(panel, tuple(p), 4, (0, 0, 255), -1)
        if image is None:
            return panel
        h = image.shape[0]
        panel = cv2.resize(panel, (h, h))
        return np.concatenate([image, panel], axis=1)
