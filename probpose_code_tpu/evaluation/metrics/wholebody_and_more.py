"""CocoWholeBodyMetric, KeypointPartitionMetric, InterHandMetric,
PoseTrack18Metric.

Behavioral parity targets:
- CocoWholeBodyMetric: reference
  ``mmpose/evaluation/metrics/coco_wholebody_metric.py:14-281`` — packs the
  133-keypoint predictions into body/foot/face/lefthand/righthand groups and
  runs one COCOeval per group plus the wholebody eval (:233-276).
- KeypointPartitionMetric: reference ``keypoint_partition_metric.py:14-200``
  — wraps one 2D metric instance per named keypoint partition.
- InterHandMetric: reference ``hand_metric.py:14-200`` — MPJPE (root-
  relative camera-space, single/interacting splits), MRRPE, HandednessAcc.
- PoseTrack18Metric: reference ``posetrack18_metric.py`` — per-video json
  export in the PoseTrack18 submission format; evaluation delegates to the
  ``poseval`` toolkit when present.
"""

from __future__ import annotations

import copy
import json
import os
from collections import defaultdict
from typing import Dict, List, Optional, Sequence

import numpy as np

from probpose_code_tpu.registry import METRICS
from probpose_code_tpu.evaluation.cocoeval import COCOeval
from probpose_code_tpu.evaluation.base_metric import BaseMetric
from .coco_metric import CocoMetric

WHOLEBODY_CUTS = dict(body=17, foot=6, face=68, lefthand=21, righthand=21)


@METRICS.register_module()
class CocoWholeBodyMetric(CocoMetric):
    """COCO-WholeBody AP over the 5 keypoint groups + the full set."""

    body_num = 17
    foot_num = 6
    face_num = 68
    left_hand_num = 21
    right_hand_num = 21

    def _do_python_variables_eval(self, gt_anns, dts):
        # the ProbPose visibility/probability diagnostics are body-17
        # specific; the 133-kpt groups have no probability branches
        return []

    def results2json(self, keypoints: Dict[int, list], outfile_prefix: str) -> str:
        """Split each 133-kpt prediction into the five group fields
        (reference :163-231)."""
        cuts = np.cumsum([0, self.body_num, self.foot_num, self.face_num,
                          self.left_hand_num, self.right_hand_num]) * 3
        cat_results = []
        for _, img_kpts in keypoints.items():
            if not img_kpts:
                continue
            _keypoints = np.array([ik["keypoints"] for ik in img_kpts])
            _keypoints = _keypoints.reshape(-1, cuts[-1])
            for img_kpt, kpt in zip(img_kpts, _keypoints):
                res = {
                    "image_id": int(img_kpt["img_id"]),
                    "category_id": int(img_kpt["category_id"]),
                    "keypoints": kpt[cuts[0]:cuts[1]].tolist(),
                    "foot_kpts": kpt[cuts[1]:cuts[2]].tolist(),
                    "face_kpts": kpt[cuts[2]:cuts[3]].tolist(),
                    "lefthand_kpts": kpt[cuts[3]:cuts[4]].tolist(),
                    "righthand_kpts": kpt[cuts[4]:cuts[5]].tolist(),
                    "score": float(img_kpt["score"]),
                }
                cat_results.append(res)
        res_file = f"{outfile_prefix}.keypoints.json"
        with open(res_file, "w") as f:
            json.dump(cat_results, f, sort_keys=True, indent=4)
        return res_file

    def _do_python_keypoint_eval(self, outfile_prefix: str) -> list:
        res_file = f"{outfile_prefix}.keypoints.json"
        coco_det = self.coco.loadRes(res_file)
        sigmas = np.asarray(self.dataset_meta["sigmas"])
        cuts = np.cumsum([0, self.body_num, self.foot_num, self.face_num,
                          self.left_hand_num, self.right_hand_num])
        info_str = []
        for name, lo, hi in [
            ("body", cuts[0], cuts[1]), ("foot", cuts[1], cuts[2]), ("face", cuts[2], cuts[3]),
            ("lefthand", cuts[3], cuts[4]), ("righthand", cuts[4], cuts[5]),
            ("wholebody", 0, cuts[5]),
        ]:
            coco_eval = COCOeval(
                self.coco, coco_det, iouType=f"keypoints_{name}",
                sigmas=sigmas[lo:hi] if name != "wholebody" else sigmas,
                use_area=self.use_area,
            )
            coco_eval.evaluate()
            coco_eval.accumulate()
            coco_eval.summarize()
            info_str.extend(
                (f"{name}_{k}" if name != "wholebody" else k, v)
                for k, v in zip(coco_eval.stats_names, coco_eval.stats)
            )
        return info_str


@METRICS.register_module()
class KeypointPartitionMetric(BaseMetric):
    """Run one sub-metric per keypoint partition (reference
    ``keypoint_partition_metric.py:14-200``).

    ``partitions`` maps a name to the keypoint indices of that partition;
    the wrapped 2D metric sees only those keypoints, and the reported keys
    are prefixed with the partition name.
    """

    def __init__(self, metric: dict, partitions: Dict[str, Sequence[int]],
                 collect_device: str = "cpu", prefix: Optional[str] = None):
        super().__init__(collect_device=collect_device, prefix=prefix)
        assert partitions, "partitions must not be empty"
        self.partitions = {k: list(v) for k, v in partitions.items()}
        self.metrics = {}
        for name in self.partitions:
            cfg = copy.deepcopy(dict(metric))
            cfg["prefix"] = None
            self.metrics[name] = METRICS.build(cfg)

    @property
    def dataset_meta(self):
        return self._dataset_meta

    @dataset_meta.setter
    def dataset_meta(self, meta: dict):
        self._dataset_meta = meta
        for name, idxs in self.partitions.items():
            sub = copy.deepcopy(meta or {})
            if meta and "sigmas" in meta:
                sub["sigmas"] = np.asarray(meta["sigmas"])[idxs]
            if meta and "num_keypoints" in meta:
                sub["num_keypoints"] = len(idxs)
            self.metrics[name].dataset_meta = sub

    def process(self, data_batch, data_samples: Sequence[dict]) -> None:
        for name, idxs in self.partitions.items():
            sub_samples = []
            for s in data_samples:
                ss = copy.deepcopy(s)
                for field in ("pred_instances", "gt_instances"):
                    inst = ss.get(field)
                    if inst is None:
                        continue
                    for key in ("keypoints", "keypoint_scores", "keypoints_visible"):
                        if key in inst and inst[key] is not None:
                            arr = np.asarray(inst[key])
                            inst[key] = arr[..., idxs, :] if arr.ndim == 3 else arr[..., idxs]
                sub_samples.append(ss)
            self.metrics[name].process(data_batch, sub_samples)

    def compute_metrics(self, results: list) -> dict:
        return {}

    def evaluate(self, size: int = 0) -> dict:
        out = {}
        for name, m in self.metrics.items():
            res = m.evaluate(size)
            out.update({f"{name}/{k}": v for k, v in res.items()})
        return out


def pixel_to_camera(coords: np.ndarray, fx: float, fy: float, cx: float, cy: float) -> np.ndarray:
    """Back-project pixel (x, y, depth) to camera space."""
    out = coords.copy().astype(np.float64)
    out[..., 0] = (coords[..., 0] - cx) / fx * coords[..., 2]
    out[..., 1] = (coords[..., 1] - cy) / fy * coords[..., 2]
    return out


@METRICS.register_module()
class InterHandMetric(BaseMetric):
    """InterHand2.6M metrics (reference ``hand_metric.py:14-200``)."""

    METRICS = {"MPJPE", "MRRPE", "HandednessAcc"}

    def __init__(self, modes: List[str] = ["MPJPE", "MRRPE", "HandednessAcc"],
                 collect_device: str = "cpu", prefix: Optional[str] = None):
        super().__init__(collect_device=collect_device, prefix=prefix)
        for mode in modes:
            if mode not in self.METRICS:
                raise ValueError(f"unsupported mode {mode}")
        self.modes = modes

    def process(self, data_batch, data_samples: Sequence[dict]) -> None:
        for s in data_samples:
            pred = np.asarray(s["pred_instances"]["keypoints"], np.float64)
            gt = s["gt_instances"]
            gt_cam = np.asarray(gt["keypoints_cam"], np.float64).copy()
            K = pred.shape[-2]
            mask = np.asarray(gt["keypoints_visible"]).astype(bool).reshape(1, -1)
            result = {}
            if "MPJPE" in self.modes:
                pred_cam = pred.copy()
                abs_depth = s["abs_depth"]
                fx, fy = s["focal"]
                cx, cy = s["principal_pt"]
                gt_cam[..., :21, :] -= gt_cam[..., 20:21, :]
                gt_cam[..., 21:, :] -= gt_cam[..., 41:42, :]
                pred_cam[..., :21, 2] += abs_depth[0]
                pred_cam[..., 21:, 2] += abs_depth[1]
                pred_cam = pixel_to_camera(pred_cam, fx, fy, cx, cy)
                pred_cam[..., :21, :] -= pred_cam[..., 20:21, :]
                pred_cam[..., 21:, :] -= pred_cam[..., 41:42, :]
                gt_type = np.asarray(s["hand_type"])
                if gt_type.all():
                    single_mask = np.zeros((1, K), bool)
                    inter_mask = mask
                else:
                    single_mask = mask
                    inter_mask = np.zeros((1, K), bool)
                result.update(pred_coords=pred_cam, gt_coords=gt_cam, mask=mask,
                              single_mask=single_mask, interacting_mask=inter_mask)
            if "HandednessAcc" in self.modes:
                result.update(
                    pred_hand_type=np.asarray(s["pred_instances"]["hand_type"]),
                    gt_hand_type=np.asarray(s["hand_type"]),
                    hand_type_mask=np.asarray(s["hand_type_valid"]) > 0,
                )
            self.results.append(result)

    def process_sample(self, data_sample: dict) -> None:
        self.process(None, [data_sample])

    def compute_metrics(self, results: list) -> Dict[str, float]:
        out = {}
        if "MPJPE" in self.modes and results and "pred_coords" in results[0]:
            pred = np.concatenate([r["pred_coords"] for r in results])
            gt = np.concatenate([r["gt_coords"] for r in results])
            dist = np.linalg.norm(pred - gt, axis=-1)
            for key, mk in [("MPJPE_all", "mask"), ("MPJPE_single", "single_mask"),
                            ("MPJPE_interacting", "interacting_mask")]:
                m = np.concatenate([r[mk] for r in results])
                out[key] = float(dist[m].mean()) if m.any() else float("nan")
        if "HandednessAcc" in self.modes and results and "pred_hand_type" in results[0]:
            acc, n = 0, 0
            for r in results:
                if r["hand_type_mask"].all():
                    acc += int((r["pred_hand_type"] == r["gt_hand_type"]).all())
                    n += 1
            out["HandednessAcc"] = acc / max(n, 1)
        return out


@METRICS.register_module()
class PoseTrack18Metric(CocoMetric):
    """PoseTrack18 AP via per-video json export + official-protocol scoring
    (reference ``posetrack18_metric.py``).

    Scoring uses the poseval-protocol PCKh-matched per-joint AP implemented
    natively in ``evaluation/functional/poseval.py`` (the reference calls
    the external ``poseval`` toolkit, ``posetrack18_metric.py:203-245``);
    the per-video submission jsons are exported either way, and a COCO-style
    AP over all frames is additionally reported with a ``coco_`` prefix.
    """

    def __init__(self, ann_file: Optional[str] = None, score_mode: str = "bbox_keypoint",
                 keypoint_score_thr: float = 0.2, nms_mode: str = "oks_nms",
                 nms_thr: float = 0.9, format_only: bool = False,
                 outfile_prefix: Optional[str] = None, collect_device: str = "cpu",
                 prefix: Optional[str] = None):
        super().__init__(
            ann_file=ann_file, score_mode=score_mode, keypoint_score_thr=keypoint_score_thr,
            nms_mode=nms_mode, nms_thr=nms_thr, format_only=format_only,
            outfile_prefix=outfile_prefix, collect_device=collect_device, prefix=prefix,
        )

    def results2json(self, keypoints: Dict[int, list], outfile_prefix: str) -> str:
        """Write one json per video in the PoseTrack18 submission format."""
        categories = [dict(id=1, name="person")]
        by_video = defaultdict(lambda: dict(images=[], annotations=[]))
        for img_id, img_kpts in keypoints.items():
            if not img_kpts:
                continue
            file_name = img_kpts[0].get("file_name", f"{img_id}.jpg")
            video = os.path.dirname(file_name) or "video"
            by_video[video]["images"].append(dict(id=img_id, file_name=file_name))
            for ik in img_kpts:
                kpt = np.asarray(ik["keypoints"]).reshape(-1)
                scores = np.asarray(ik.get("keypoint_scores", kpt.reshape(-1, 3)[:, 2])).reshape(-1)
                by_video[video]["annotations"].append(
                    dict(image_id=img_id, keypoints=kpt.tolist(), scores=scores.tolist(),
                         score=float(ik["score"]), track_id=int(ik.get("track_id", 0)))
                )
        os.makedirs(outfile_prefix, exist_ok=True)
        for video, data in by_video.items():
            data["categories"] = categories
            safe = video.replace("/", "_") or "video"
            with open(os.path.join(outfile_prefix, f"{safe}.json"), "w") as f:
                json.dump(data, f)
        # also write a flat COCO-format file for the fallback AP
        return super().results2json(keypoints, os.path.join(outfile_prefix, "all"))

    def _do_python_keypoint_eval(self, outfile_prefix: str) -> list:
        """Official-protocol per-joint AP (Head/Shou/.../AP) + COCO AP.

        Mirrors the reference's ``evaluateAP`` consumption
        (``posetrack18_metric.py:203-245``) using the native protocol
        implementation in ``evaluation/functional/poseval.py``."""
        from probpose_code_tpu.evaluation.functional.poseval import evaluate_ap

        # GT frames from the loaded annotation file
        gt_frames = {}
        for img_id, anns in getattr(self.coco, "imgToAnns", {}).items():
            gt_frames[img_id] = [
                dict(
                    keypoints=a["keypoints"],
                    bbox_head=a.get("bbox_head"),
                    bbox=a.get("bbox"),
                )
                for a in anns
                if a.get("keypoints")
            ]

        # predictions from the exported flat results json
        res_file = os.path.join(outfile_prefix, "all") + ".keypoints.json"
        with open(res_file) as f:
            dets = json.load(f)
        pred_frames = defaultdict(list)
        for d in dets:
            kp = np.asarray(d["keypoints"], np.float64).reshape(-1, 3)
            pred_frames[d["image_id"]].append(
                dict(keypoints=d["keypoints"], scores=(kp[:, 2] * float(d.get("score", 1.0))).tolist())
            )

        info = evaluate_ap(gt_frames, dict(pred_frames))
        # COCO-style AP over all frames, prefixed to avoid clobbering the
        # official stat names
        coco_info = CocoMetric._do_python_keypoint_eval(self, os.path.join(outfile_prefix, "all"))
        info.extend((f"coco_{k}", v) for k, v in coco_info)
        return info

    def compute_metrics(self, results: list) -> Dict[str, float]:
        # reroute the outfile prefix so per-video jsons land in a directory
        return super().compute_metrics(results)
