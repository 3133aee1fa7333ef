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

# 22-color categorical palette used by the reference's probability-area and
# contour heatmap modes (local_visualizer.py:378-399 values)
_AREA_COLORS = np.array([
    [230, 25, 75], [60, 180, 75], [255, 225, 25], [0, 130, 200],
    [245, 130, 48], [145, 30, 180], [70, 240, 240], [240, 50, 230],
    [210, 245, 60], [250, 190, 212], [0, 128, 128], [220, 190, 255],
    [255, 250, 200], [128, 0, 0], [170, 255, 195], [128, 128, 0],
    [255, 215, 180], [255, 255, 255], [170, 110, 40], [0, 0, 128],
    [128, 128, 128], [0, 0, 0],
])

# COCO-17 -> OpenPose-18 joint reorder (reference local_visualizer.py:380-382):
# a synthetic neck (mean of both shoulders) is inserted at index 17 first.
_OPENPOSE_FROM_MMPOSE = [17, 6, 8, 10, 7, 9, 12, 14, 16, 13, 15, 2, 1, 4, 3]
_OPENPOSE_TO = [1, 2, 3, 4, 6, 7, 8, 9, 10, 12, 13, 14, 15, 16, 17]
_OPENPOSE_SKELETON = [
    (0, 1), (1, 2), (2, 3), (3, 4), (1, 5), (5, 6), (6, 7), (1, 8),
    (8, 9), (9, 10), (1, 11), (11, 12), (12, 13), (0, 14), (0, 15),
    (14, 16), (15, 17),
]
_OPENPOSE_LINK_COLORS = np.array([
    [255, 0, 0], [255, 85, 0], [255, 170, 0], [255, 255, 0], [170, 255, 0],
    [85, 255, 0], [0, 255, 0], [0, 255, 85], [0, 255, 170], [0, 255, 255],
    [0, 170, 255], [0, 85, 255], [0, 0, 255], [85, 0, 255], [170, 0, 255],
    [255, 0, 255], [255, 0, 170],
])


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
        skeleton_style: str = "mmpose",
        show_kpt_idx: bool = False,
    ) -> np.ndarray:
        """Draw keypoints + skeleton (+ bboxes) on a BGR image.

        ``skeleton_style='openpose'`` renders limbs as filled ellipse
        polygons with the OpenPose joint layout (reference
        ``local_visualizer.py:_draw_instances_kpts_openpose:345``).
        """
        assert skeleton_style in ("mmpose", "openpose")
        img = image.copy()
        kpt_thr = self.kpt_thr if kpt_thr is None else kpt_thr

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

        if skeleton_style == "openpose" and K == 17:
            return self._draw_instances_openpose(img, keypoints, keypoint_scores, kpt_thr)

        meta = self.dataset_meta or {}
        kpt_colors = meta.get("keypoint_colors")
        links = meta.get("skeleton_links", [])
        link_colors = meta.get("skeleton_link_colors")

        for n in range(N):
            for li, (a, b) in enumerate(links):
                if keypoint_scores[n, a] < kpt_thr or keypoint_scores[n, b] < kpt_thr:
                    continue
                color = tuple(int(c) for c in (link_colors[li] if link_colors is not None else (0, 255, 0)))
                pa = tuple(np.round(keypoints[n, a]).astype(int))
                pb = tuple(np.round(keypoints[n, b]).astype(int))
                if self.show_keypoint_weight:
                    t = self.alpha * max(0.0, min(1.0, 0.5 * (keypoint_scores[n, a] + keypoint_scores[n, b])))
                    overlay = img.copy()
                    cv2.line(overlay, pa, pb, color, self.line_width + 1)
                    img = cv2.addWeighted(overlay, t, img, 1 - t, 0)
                else:
                    cv2.line(img, pa, pb, color, self.line_width + 1)
            for k in range(K):
                if keypoint_scores[n, k] < kpt_thr:
                    continue
                color = tuple(int(c) for c in (kpt_colors[k] if kpt_colors is not None else (0, 0, 255)))
                center = tuple(np.round(keypoints[n, k]).astype(int))
                if self.show_keypoint_weight:
                    t = self.alpha * max(0.0, min(1.0, keypoint_scores[n, k]))
                    overlay = img.copy()
                    cv2.circle(overlay, center, self.radius, color, -1)
                    img = cv2.addWeighted(overlay, t, img, 1 - t, 0)
                else:
                    cv2.circle(img, center, self.radius, color, -1)
                if show_kpt_idx:
                    cv2.putText(img, str(k), (center[0] + self.radius, center[1] - self.radius),
                                cv2.FONT_HERSHEY_SIMPLEX, 0.4, color, 1, cv2.LINE_AA)
        return img

    def _draw_instances_openpose(self, img, keypoints, keypoint_scores, kpt_thr):
        """OpenPose-style rendering for COCO-17 poses: insert a synthetic
        neck joint (shoulder midpoint), remap to the OpenPose-18 layout, and
        draw body limbs as filled ellipse polygons at fixed 0.6 alpha."""
        import math

        img_h, img_w = img.shape[:2]
        info = np.concatenate([keypoints, keypoint_scores[..., None]], axis=-1)  # (N, 17, 3)
        neck = info[:, [5, 6]].mean(axis=1)
        neck[:, 2] = ((info[:, 5, 2] > kpt_thr) & (info[:, 6, 2] > kpt_thr)).astype(np.float32)
        info = np.insert(info, 17, neck, axis=1)  # (N, 18, 3)
        remapped = info.copy()
        remapped[:, _OPENPOSE_TO] = info[:, _OPENPOSE_FROM_MMPOSE]
        kpts, vis = remapped[..., :2], remapped[..., 2]

        for n in range(kpts.shape[0]):
            for sk_id, (a, b) in enumerate(_OPENPOSE_SKELETON):
                pa, pb = kpts[n, a], kpts[n, b]
                if (vis[n, a] < kpt_thr or vis[n, b] < kpt_thr
                        or not (0 < pa[0] < img_w and 0 < pa[1] < img_h)
                        or not (0 < pb[0] < img_w and 0 < pb[1] < img_h)):
                    continue
                color = tuple(int(c) for c in _OPENPOSE_LINK_COLORS[sk_id % len(_OPENPOSE_LINK_COLORS)])
                mx, my = (pa + pb) / 2
                length = float(np.hypot(*(pa - pb)))
                angle = math.degrees(math.atan2(pa[1] - pb[1], pa[0] - pb[0]))
                poly = cv2.ellipse2Poly(
                    (int(mx), int(my)), (int(length / 2), int(max(self.line_width, 2))), int(angle), 0, 360, 1
                )
                overlay = img.copy()
                cv2.fillConvexPoly(overlay, poly, color)
                img = cv2.addWeighted(overlay, 0.6, img, 0.4, 0)
            for k in range(kpts.shape[1]):
                if vis[n, k] < kpt_thr:
                    continue
                color = tuple(int(c) for c in _OPENPOSE_LINK_COLORS[k % len(_OPENPOSE_LINK_COLORS)])
                cv2.circle(img, tuple(np.round(kpts[n, k]).astype(int)), self.radius, color, -1)
        return img

    def draw_heatmaps(
        self, image: np.ndarray, heatmaps: np.ndarray, draw_type: str = "featmap"
    ) -> np.ndarray:
        """Overlay heatmaps (reference ``_draw_instance_heatmap:487``).

        - ``featmap``: max-projected JET colormap overlay
        - ``p_area``: per-keypoint filled contour covering 75% of each map's
          probability mass, one palette color per keypoint
        - ``contours``: nested per-decile probability-mass contours on a
          grayscale copy of the image
        """
        assert draw_type in ("featmap", "p_area", "contours")
        hm = np.asarray(heatmaps, dtype=np.float32)
        if hm.ndim == 2:
            hm = hm[None]

        if draw_type == "featmap":
            flat = hm.max(axis=0)
            flat = flat / max(flat.max(), 1e-6)
            hm_img = cv2.applyColorMap((flat * 255).astype(np.uint8), cv2.COLORMAP_JET)
            hm_img = cv2.resize(hm_img, (image.shape[1], image.shape[0]))
            return cv2.addWeighted(image, 1 - self.alpha * 0.6, hm_img, self.alpha * 0.6, 0)

        def mass_threshold(heatmap, frac):
            """Value cutting off the top ``frac`` of the map's total mass."""
            srt = np.sort(heatmap.reshape(-1))[::-1]
            cumsum = np.cumsum(srt)
            idx = np.searchsorted(cumsum, frac * max(cumsum[-1], 1e-12))
            return srt[min(idx, len(srt) - 1)]

        if draw_type == "p_area":
            painted = image.copy()
            for k, heatmap in enumerate(hm):
                if heatmap.sum() < 0.75:
                    continue
                heatmap = cv2.resize(heatmap, (image.shape[1], image.shape[0]))
                thr = mass_threshold(heatmap, 0.75)
                binary = (heatmap > thr).astype(np.uint8)
                contours, _ = cv2.findContours(binary, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
                color = _AREA_COLORS[k % len(_AREA_COLORS)].tolist()
                filled = cv2.drawContours(image.copy(), contours, -1, color, thickness=-1, lineType=cv2.LINE_4)
                blended = cv2.addWeighted(filled, 0.7, painted, 0.3, 0)
                painted = np.where(binary[..., None] > 0, blended, painted)
                painted = cv2.drawContours(painted, contours, -1, color, thickness=1, lineType=cv2.LINE_4)
            return painted

        # contours: nested decile probability-mass outlines on grayscale
        gray = cv2.cvtColor(cv2.cvtColor(image, cv2.COLOR_BGR2GRAY), cv2.COLOR_GRAY2BGR)
        painted = gray.copy()
        for heatmap in hm:
            if heatmap.sum() < 0.5:
                continue
            heatmap = cv2.resize(heatmap, (image.shape[1], image.shape[0]))
            for i, frac in enumerate(np.linspace(0.9, 0.1, 9)):
                thr = mass_threshold(heatmap, frac)
                binary = (heatmap > thr).astype(np.uint8)
                contours, _ = cv2.findContours(binary, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
                color = _AREA_COLORS[i % len(_AREA_COLORS)].tolist()
                painted = cv2.drawContours(painted, contours, -1, color, thickness=1, lineType=cv2.LINE_4)
        return painted

    def add_datasample(
        self,
        name: str,
        image: np.ndarray,
        data_sample=None,
        draw_gt: bool = False,
        draw_pred: bool = True,
        draw_heatmap: bool = False,
        draw_bbox: bool = True,
        show: bool = False,
        out_file: Optional[str] = None,
        kpt_thr: float = 0.3,
        skeleton_style: str = "mmpose",
        show_kpt_idx: bool = False,
        heatmap_draw_type: str = "featmap",
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
                    np.asarray(inst.get("bboxes")) if draw_bbox and "bboxes" in inst else None,
                    kpt_thr=kpt_thr,
                    skeleton_style=skeleton_style,
                    show_kpt_idx=show_kpt_idx,
                )
                if draw_heatmap and "pred_fields" in data_sample._fields and "heatmaps" in data_sample.pred_fields:
                    img = self.draw_heatmaps(
                        img, np.asarray(data_sample.pred_fields.heatmaps), draw_type=heatmap_draw_type
                    )
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
