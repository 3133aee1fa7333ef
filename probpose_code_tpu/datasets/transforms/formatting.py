"""PackPoseInputs: bundle pipeline results into (inputs, PoseDataSample).

Parity target: reference ``datasets/transforms/formatting.py:61`` including
the ProbPose keys (``keypoints_visibility``, ``in_image``,
``keypoints_in_image``, ``bbox_mask``, ``bbox_xyxy_wrt_input``).

Images stay NumPy (HWC uint8/float); batching to device arrays happens in
the loader/collate step — there is no per-sample tensor conversion.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from probpose_code_tpu.registry import TRANSFORMS
from probpose_code_tpu.structures import InstanceData, PixelData, PoseDataSample
from probpose_code_tpu.datasets.transforms.loading import materialize_image


@TRANSFORMS.register_module()
class PackPoseInputs:
    instance_mapping_table = dict(
        bbox="bboxes",
        bbox_score="bbox_scores",
        keypoints="keypoints",
        keypoints_cam="keypoints_cam",
        keypoints_visible="keypoints_visible",
        keypoints_visibility="keypoints_visibility",
        bbox_scale="bbox_scales",
        head_size="head_size",
        in_image="in_image",
        keypoints_scaled="keypoints_scaled",
        heatmap_keypoints="heatmap_keypoints",
        keypoints_in_image="keypoints_in_image",
        bbox_mask="bbox_mask",
        out_heatmaps="out_heatmaps",
        out_kpt_weights="out_kpt_weights",
        bbox_xyxy_wrt_input="bbox_xyxy_wrt_input",
    )

    field_mapping_table = dict(
        heatmaps="heatmaps",
        instance_heatmaps="instance_heatmaps",
        heatmap_mask="heatmap_mask",
        heatmap_weights="heatmap_weights",
        displacements="displacements",
        displacement_weights="displacement_weights",
    )

    label_mapping_table = dict(
        keypoint_labels="keypoint_labels",
        keypoint_x_labels="keypoint_x_labels",
        keypoint_y_labels="keypoint_y_labels",
        keypoint_weights="keypoint_weights",
        keypoints_visible_weights="keypoints_visible_weights",
    )

    def __init__(
        self,
        meta_keys=(
            "id",
            "img_id",
            "img_path",
            "category_id",
            "crowd_index",
            "ori_shape",
            "img_shape",
            "input_size",
            "input_center",
            "input_scale",
            "flip",
            "flip_direction",
            "flip_indices",
            "raw_ann_info",
            "dataset_name",
            "pad_to_contain",
            "area",
        ),
        pack_transformed: bool = False,
    ):
        self.meta_keys = meta_keys
        self.pack_transformed = pack_transformed

    def __call__(self, results: Dict) -> Optional[dict]:
        materialize_image(results)  # lazy-loaded images carry bytes, not pixels
        inputs = None
        if "img" in results:
            inputs = np.ascontiguousarray(results["img"])  # HWC (BGR)
        elif "lifting_target" in results and "keypoints" in results:
            inputs = np.asarray(results.get("keypoint_labels", results["keypoints"]))

        if "in_image" in results:
            if "keypoints_in_image" not in results:
                results["keypoints_in_image"] = results["in_image"]
            results["keypoints_in_image"] = np.asarray(results["keypoints_in_image"]).astype(bool) & np.asarray(
                results["in_image"]
            ).astype(bool)

        data_sample = PoseDataSample()

        gt_instances = InstanceData()
        inst_table = results.get("instance_mapping_table", self.instance_mapping_table)
        for key, packed_key in inst_table.items():
            if key in results:
                gt_instances.set_field(results[key], packed_key)
        if self.pack_transformed and "transformed_keypoints" in results:
            gt_instances.set_field(results["transformed_keypoints"], "transformed_keypoints")
        data_sample.gt_instances = gt_instances

        gt_instance_labels = InstanceData()
        label_table = results.get("label_mapping_table", self.label_mapping_table)
        for key, packed_key in label_table.items():
            if key in results:
                value = results[key]
                if isinstance(value, list):
                    value = np.stack(value)
                gt_instance_labels.set_field(np.asarray(value), packed_key)
        data_sample.gt_instance_labels = gt_instance_labels

        gt_fields = PixelData()
        field_table = results.get("field_mapping_table", self.field_mapping_table)
        for key, packed_key in field_table.items():
            if key in results:
                value = results[key]
                if isinstance(value, list):
                    value = np.stack(value)
                gt_fields.set_field(np.asarray(value), packed_key)
        data_sample.gt_fields = gt_fields

        metainfo = {k: results[k] for k in self.meta_keys if k in results}
        data_sample.set_metainfo(metainfo)

        packed = dict(inputs=inputs, data_samples=data_sample)
        # device-pipeline passthrough (TopdownAffine(device_warp=True) +
        # GenerateTarget(device=True)): ship the canvas + geometry instead of
        # a pre-warped crop / pre-rendered heatmaps
        for key in ("canvas", "warp_mat", "warp_separable", "device_kpts_hm", "device_kpts_visible"):
            if key in results:
                packed[key] = results[key]
        return packed


@TRANSFORMS.register_module()
class PackOneStageInputs:
    """Pack a bottomup sample for one-stage (YOLOX-Pose / RTMO) training.

    Instead of building a ``PoseDataSample`` (the reference packs
    ``gt_instance_labels`` consumed per-image in Python,
    ``yoloxpose_head.py:465-630``), this emits the flat arrays the jitted
    dense loss consumes; :func:`collate_onestage` pads them to a static
    ``max_gt`` so target assignment traces once.
    """

    def __call__(self, results: dict) -> dict:
        materialize_image(results)  # lazy-loaded images carry bytes, not pixels
        img = results["img"]
        kpts = np.asarray(results.get("keypoints", np.zeros((0, 17, 2))), np.float32)
        kvis = np.asarray(results.get("keypoints_visible", np.zeros(kpts.shape[:2])), np.float32)
        if kvis.ndim == 3:  # (N, K, 2) with weights in last dim
            kvis_w = kvis[..., 1]
            kvis = kvis[..., 0]
        else:
            kvis_w = np.ones_like(kvis)
        n = len(kpts)
        bbox = np.asarray(results.get("bbox", np.zeros((0, 4))), np.float32).reshape(n, 4) if n else np.zeros((0, 4), np.float32)
        area = results.get("area")
        if area is None or len(np.asarray(area).reshape(-1)) != n:
            area = np.clip((bbox[:, 2] - bbox[:, 0]) * (bbox[:, 3] - bbox[:, 1]) * 0.53, 1, None)
        packed = dict(
            inputs=img.astype(np.float32),
            gt_bboxes=bbox,
            gt_labels=np.zeros(n, np.int32),
            gt_keypoints=kpts,
            gt_keypoints_visible=kvis,
            gt_vis_weights=kvis_w.astype(np.float32),
            gt_areas=np.asarray(area, np.float32).reshape(-1),
            img_meta=dict(
                id=results.get("id", results.get("img_id", 0)),
                img_id=results.get("img_id", 0),
                ori_shape=results.get("ori_shape"),
                input_size=results.get("input_size"),
                input_center=results.get("input_center"),
                input_scale=results.get("input_scale"),
                flip_indices=results.get("flip_indices"),
            ),
        )
        if results.get("heatmap_mask") is not None:
            packed["heatmap_mask"] = np.asarray(results["heatmap_mask"], np.float32)
        return packed


def collate_onestage(samples, max_gt: int = 50):
    """Pad per-image GT to static ``max_gt`` and stack (see PackOneStageInputs)."""
    samples = [s for s in samples if s is not None]
    B = len(samples)
    K = max((s["gt_keypoints"].shape[1] if len(s["gt_keypoints"]) else 0) for s in samples) or 17
    out = dict(
        inputs=np.stack([s["inputs"] for s in samples]),
        gt_bboxes=np.zeros((B, max_gt, 4), np.float32),
        gt_labels=np.zeros((B, max_gt), np.int32),
        gt_keypoints=np.zeros((B, max_gt, K, 2), np.float32),
        gt_keypoints_visible=np.zeros((B, max_gt, K), np.float32),
        gt_vis_weights=np.ones((B, max_gt, K), np.float32),
        gt_areas=np.ones((B, max_gt), np.float32),
        gt_valid=np.zeros((B, max_gt), bool),
    )
    metas = []
    for b, s in enumerate(samples):
        n = min(len(s["gt_bboxes"]), max_gt)
        if n:
            out["gt_bboxes"][b, :n] = s["gt_bboxes"][:n]
            out["gt_labels"][b, :n] = s["gt_labels"][:n]
            out["gt_keypoints"][b, :n] = s["gt_keypoints"][:n]
            out["gt_keypoints_visible"][b, :n] = s["gt_keypoints_visible"][:n]
            out["gt_vis_weights"][b, :n] = s["gt_vis_weights"][:n]
            out["gt_areas"][b, :n] = s["gt_areas"][:n]
            out["gt_valid"][b, :n] = True
        metas.append(s.get("img_meta", {}))
    out["img_metas"] = metas
    return out
