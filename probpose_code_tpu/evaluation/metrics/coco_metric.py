"""CocoMetric — COCO AP / Ex-OKS evaluation orchestrator.

Parity target: reference ``mmpose/evaluation/metrics/coco_metric.py`` (1,360
LoC). Core pipeline preserved:

- ``process``: collect per-sample predictions incl. the ProbPose fields
  (keypoint_probs / oks / error / visible, :263-311) and matching GT dicts
- pad_to_contain precompute on the GT annotations (:220)
- scoring modes (bbox / keypoint / bbox_keypoint / bbox_rle) with
  ``score_thresh_type='prob'`` (:545-574); the keypoint v-channel in the
  dumped json carries the predicted in-image probability
- OKS-NMS / soft-OKS-NMS, json dump (results2json)
- classification diagnostics (``_do_python_variables_eval:819``):
  best-threshold visibility / probability accuracies; the learned
  probability threshold feeds the Ex-OKS evaluator's confidence_thr
- the COCOeval grid over ``extended`` x ``match_by_bbox`` (:671-750) with
  stat prefixes ``Ex_`` / ``bbox_`` and suffix ``_NoBrd``.

Heavy plotting diagnostics of the reference (vector fields, OKS-vs-IoU,
heatmap calibration curves; gated there by ``EVAL_HEATMAPS=False``) are
intentionally not ported; their metric-dict outputs are.
"""

from __future__ import annotations

import os
import os.path as osp
import tempfile
from collections import OrderedDict, defaultdict
from typing import Dict, List, Optional, Sequence

import numpy as np

from probpose_code_tpu.datasets.coco_api import COCO
from probpose_code_tpu.registry import METRICS
from probpose_code_tpu.structures.bbox import bbox_xyxy2xywh
from probpose_code_tpu.structures.keypoint import find_min_padding_exact

from ..base_metric import BaseMetric
from ..cocoeval import COCOeval
from ..functional.nms import oks_nms, soft_oks_nms


def _sample_view(sample) -> dict:
    """Uniform dict view over PoseDataSample / dict samples."""
    if isinstance(sample, dict):
        return sample
    view = dict(sample.metainfo)
    view["pred_instances"] = {k: np.asarray(v) for k, v in sample.pred_instances.items()}
    view["gt_instances"] = {k: np.asarray(v) if not isinstance(v, list) else v
                            for k, v in sample.gt_instances.items()}
    return view


@METRICS.register_module()
class CocoMetric(BaseMetric):
    default_prefix: Optional[str] = "coco"

    def __init__(
        self,
        ann_file: Optional[str] = None,
        use_area: bool = True,
        iou_type: str = "keypoints",
        score_mode: str = "bbox_keypoint",
        score_thresh_type: str = "score",
        keypoint_score_thr: float = 0.2,
        nms_mode: str = "oks_nms",
        nms_thr: float = 0.9,
        format_only: bool = False,
        pred_converter: Optional[Dict] = None,
        gt_converter: Optional[Dict] = None,
        outfile_prefix: Optional[str] = None,
        collect_device: str = "cpu",
        prefix: Optional[str] = None,
        extended: List[bool] = [False],
        match_by_bbox: List[bool] = [False],
        ignore_border_points: List[bool] = [False],
        ignore_stats: List[str] = [],
        padding: float = 1.25,
        diagnostics: bool = False,
    ):
        super().__init__(collect_device=collect_device, prefix=prefix)
        self.ann_file = ann_file
        self.coco = COCO(ann_file) if ann_file is not None else None

        self.use_area = use_area
        self.iou_type = iou_type
        assert score_mode in ("bbox", "bbox_keypoint", "bbox_rle", "keypoint")
        self.score_mode = score_mode
        assert score_thresh_type in ("score", "prob")
        self.score_thresh_type = score_thresh_type
        self.keypoint_score_thr = keypoint_score_thr
        assert nms_mode in ("oks_nms", "soft_oks_nms", "none")
        self.nms_mode = nms_mode
        self.nms_thr = nms_thr
        if format_only:
            assert outfile_prefix is not None
        self.format_only = format_only
        self.outfile_prefix = outfile_prefix
        self.pred_converter = pred_converter
        self.gt_converter = gt_converter

        n = max(len(extended), len(match_by_bbox))
        extended = extended * n if len(extended) == 1 and n > 1 else extended
        match_by_bbox = match_by_bbox * n if len(match_by_bbox) == 1 and n > 1 else match_by_bbox
        if len(ignore_border_points) == 1 and n > 1:
            ignore_border_points = ignore_border_points * n
        assert len(extended) == len(match_by_bbox) >= 1
        self.extended = extended
        self.match_by_bbox = match_by_bbox
        self.ignore_border_points = ignore_border_points
        self.ignore_stats = ignore_stats
        self.padding = padding

        self.diagnostics = diagnostics
        self.prob_thr = -1.0
        self.has_probability = True
        self._compute_min_padding_in_coco()

    def _compute_min_padding_in_coco(self):
        if self.coco is None:
            return
        for ann in self.coco.anns.values():
            if "pad_to_contain" in ann:
                continue
            kpts = np.array(ann["keypoints"]).reshape(-1, 3)
            bbox = np.array(ann["bbox"]).flatten()
            ann["pad_to_contain"] = find_min_padding_exact(bbox, kpts).tolist()

    # ------------------------------------------------------------------

    def process(self, data_batch, data_samples: Sequence) -> None:
        for raw_sample in data_samples:
            sample = _sample_view(raw_sample)
            pred_inst = sample["pred_instances"]
            keypoints = np.asarray(pred_inst["keypoints"])
            if keypoints.ndim == 2:
                keypoints = keypoints[None]
            N, K, _ = keypoints.shape
            keypoint_scores = np.asarray(pred_inst["keypoint_scores"]).reshape(N, K)

            def _get(name):
                if name in pred_inst:
                    return np.asarray(pred_inst[name]).reshape(N, K)
                return keypoint_scores.copy()

            if "keypoints_probs" not in pred_inst:
                self.has_probability = False

            pred = dict(
                id=sample["id"],
                img_id=sample["img_id"],
                keypoints=keypoints,
                keypoint_scores=keypoint_scores,
                keypoints_visible=_get("keypoints_visible"),
                keypoint_probs=_get("keypoints_probs"),
                keypoint_oks=_get("keypoints_oks"),
                keypoint_error=_get("keypoints_error"),
                # bottomup samples carry a per-instance category array; the
                # COCO json wants one scalar per prediction (person=1)
                category_id=int(np.asarray(sample.get("category_id", 1)).reshape(-1)[0])
                if np.size(sample.get("category_id", 1)) else 1,
            )
            if "bboxes" in pred_inst:
                pred["bbox"] = bbox_xyxy2xywh(np.asarray(pred_inst["bboxes"]))

            gt_inst = sample.get("gt_instances", {})
            if "bbox_scores" in pred_inst:
                bbox_scores = np.asarray(pred_inst["bbox_scores"])
            elif "bbox_scores" not in gt_inst or len(np.asarray(gt_inst["bbox_scores"])) != len(keypoints):
                bbox_scores = np.ones(len(keypoints))
            else:
                bbox_scores = np.asarray(gt_inst["bbox_scores"])
            pred["bbox_scores"] = bbox_scores

            # ground truth (for ann-file-free evaluation)
            gt = dict(width=None, height=None)
            if self.coco is None:
                gt["width"], gt["height"] = sample.get("ori_shape", (None, None))[::-1] if sample.get("ori_shape") else (None, None)
                gt["img_id"] = sample["img_id"]
                gt["raw_ann_info"] = sample.get("raw_ann_info")
            self.results.append((pred, gt))

    # ------------------------------------------------------------------

    def compute_metrics(self, results: list) -> Dict[str, float]:
        preds, gts = zip(*results)

        tmp_dir = None
        if self.outfile_prefix is None:
            tmp_dir = tempfile.TemporaryDirectory()
            outfile_prefix = osp.join(tmp_dir.name, "results")
        else:
            outfile_prefix = self.outfile_prefix
            os.makedirs(osp.dirname(outfile_prefix) or ".", exist_ok=True)

        if self.coco is None:
            coco_json_path = self.gt_to_coco_json(gt_dicts=gts, outfile_prefix=outfile_prefix)
            self.coco = COCO(coco_json_path)
            self._compute_min_padding_in_coco()

        kpts = defaultdict(list)
        for pred in preds:
            img_id = pred["img_id"]
            for idx, keypoints in enumerate(pred["keypoints"]):
                instance = {
                    "id": pred["id"],
                    "img_id": pred["img_id"],
                    "category_id": pred["category_id"],
                    "keypoints": keypoints,
                    "keypoint_scores": pred["keypoint_scores"][idx],
                    "bbox_score": pred["bbox_scores"][idx],
                    "keypoints_visible": pred["keypoints_visible"][idx],
                    "keypoint_probs": pred["keypoint_probs"][idx],
                    "keypoint_oks": pred["keypoint_oks"][idx],
                    "keypoint_error": pred["keypoint_error"][idx],
                }
                if "bbox" in pred:
                    instance["bbox"] = pred["bbox"][idx]
                area = (np.max(keypoints[:, 0]) - np.min(keypoints[:, 0])) * (
                    np.max(keypoints[:, 1]) - np.min(keypoints[:, 1])
                )
                instance["area"] = area
                kpts[img_id].append(instance)

        kpts = self._sort_and_unique_bboxes(kpts, key="id")

        # scoring + NMS
        valid_kpts = defaultdict(list)
        num_keypoints = self.dataset_meta["num_keypoints"]
        for img_id, instances in kpts.items():
            for instance in instances:
                instance["keypoints"] = np.concatenate(
                    [np.asarray(instance["keypoints"]), np.asarray(instance["keypoint_probs"])[:, None]], axis=-1
                )
                if self.score_mode == "bbox":
                    instance["score"] = float(instance["bbox_score"])
                elif self.score_mode == "keypoint":
                    instance["score"] = float(np.mean(instance["keypoint_scores"]))
                elif self.score_mode == "bbox_rle":
                    ks = instance["keypoint_scores"]
                    instance["score"] = float(instance["bbox_score"] + np.mean(ks) + np.max(ks))
                else:  # bbox_keypoint
                    thresh_by = (
                        instance["keypoint_scores"]
                        if self.score_thresh_type == "score"
                        else instance["keypoint_probs"]
                    )
                    valid = thresh_by > self.keypoint_score_thr
                    mean_kpt_score = (
                        float(instance["keypoint_scores"][valid].mean()) if valid.any() else 0.0
                    )
                    instance["score"] = float(instance["bbox_score"]) * mean_kpt_score

            if self.nms_mode == "none":
                valid_kpts[img_id] = instances
            else:
                nms_fn = oks_nms if self.nms_mode == "oks_nms" else soft_oks_nms
                keep = nms_fn(instances, self.nms_thr, sigmas=self.dataset_meta["sigmas"])
                valid_kpts[img_id] = [instances[k] for k in keep]

        self.results2json(valid_kpts, outfile_prefix=outfile_prefix)

        if self.format_only:
            return {}

        eval_results: "OrderedDict[str, float]" = OrderedDict()
        try:
            info = self._do_python_variables_eval(self.coco.anns, valid_kpts)
            eval_results.update(OrderedDict(info))
        except Exception:  # diagnostics must never break evaluation
            import traceback

            traceback.print_exc()

        if self.diagnostics:
            try:
                eval_results.update(OrderedDict(self._do_vector_fields_eval(self.coco.anns, valid_kpts)))
                eval_results.update(OrderedDict(self._do_oks_to_iou_eval(self.coco.anns, valid_kpts)))
            except Exception:
                import traceback

                traceback.print_exc()

        info = self._do_python_keypoint_eval(outfile_prefix)
        eval_results.update(OrderedDict(info))

        if tmp_dir is not None:
            tmp_dir.cleanup()
        return eval_results

    # ------------------------------------------------------------------

    def gt_to_coco_json(self, gt_dicts: Sequence[dict], outfile_prefix: str) -> str:
        """Convert raw GT annotations carried by the samples into a COCO json."""
        import json

        image_infos = []
        annotations = []
        img_ids = set()
        ann_ids = set()
        for gt_dict in gt_dicts:
            if gt_dict.get("img_id") is None or gt_dict.get("raw_ann_info") is None:
                continue
            if gt_dict["img_id"] not in img_ids:
                image_infos.append(
                    dict(id=gt_dict["img_id"], width=gt_dict.get("width"), height=gt_dict.get("height"))
                )
                img_ids.add(gt_dict["img_id"])
            raw = gt_dict["raw_ann_info"]
            raw_list = raw if isinstance(raw, list) else [raw]
            for ann in raw_list:
                if ann is None or ann["id"] in ann_ids:
                    continue
                ann_ids.add(ann["id"])
                annotations.append(dict(ann))
        coco_json = dict(
            info={},
            images=image_infos,
            categories=[dict(id=1, name="person")],
            licenses=None,
            annotations=annotations,
        )
        path = f"{outfile_prefix}.gt.json"
        with open(path, "w") as f:
            json.dump(coco_json, f)
        return path

    def results2json(self, keypoints: Dict[int, list], outfile_prefix: str) -> str:
        import json

        num_keypoints = self.dataset_meta["num_keypoints"]
        cat_results = []
        for _, img_kpts in keypoints.items():
            if not img_kpts:
                continue
            _keypoints = np.array([ik["keypoints"] for ik in img_kpts]).reshape(-1, num_keypoints * 3)
            for img_kpt, keypoint in zip(img_kpts, _keypoints):
                res = {
                    "image_id": int(img_kpt["img_id"]),
                    "category_id": int(img_kpt["category_id"]),
                    "keypoints": keypoint.tolist(),
                    "score": float(img_kpt["score"]),
                }
                if "bbox" in img_kpt:
                    res["bbox"] = np.asarray(img_kpt["bbox"]).tolist()
                if "keypoints_visible" in img_kpt:
                    res["visibility"] = np.asarray(img_kpt["keypoints_visible"]).tolist()
                cat_results.append(res)

        res_file = f"{outfile_prefix}.keypoints.json"
        with open(res_file, "w") as f:
            json.dump(cat_results, f, sort_keys=True, indent=4)
        return res_file

    def _do_python_keypoint_eval(self, outfile_prefix: str) -> list:
        res_file = f"{outfile_prefix}.keypoints.json"
        coco_det = self.coco.loadRes(res_file)
        sigmas = self.dataset_meta["sigmas"]

        info_str = []
        for extended_oks, match_by_bbox, ignore_border in zip(
            self.extended, self.match_by_bbox, self.ignore_border_points
        ):
            prefix = ("Ex_" if extended_oks else "") + ("bbox_" if match_by_bbox else "")
            if extended_oks and match_by_bbox:
                prefix = "Ex_bbox_"
            elif match_by_bbox:
                prefix = "bbox_"
            elif extended_oks:
                prefix = "Ex_"
            else:
                prefix = ""
            suffix = "_NoBrd" if ignore_border else ""

            coco_eval = COCOeval(
                self.coco,
                coco_det,
                iouType=self.iou_type,
                sigmas=sigmas,
                use_area=self.use_area,
                extended_oks=extended_oks,
                match_by_bbox=match_by_bbox,
                confidence_thr=self.prob_thr,
                padding=self.padding,
                ignore_near_bbox=ignore_border,
            )
            coco_eval.evaluate()
            coco_eval.accumulate()
            coco_eval.summarize()

            items = [
                (f"{prefix}{k}{suffix}", v)
                for k, v in zip(coco_eval.stats_names, coco_eval.stats)
                if k not in self.ignore_stats
            ]
            info_str.extend(items)
        return info_str

    def _do_python_variables_eval(self, gt_anns: Dict, dts: Dict[int, list]) -> list:
        """Visibility / in-image probability classification diagnostics;
        learns ``prob_thr`` consumed by the Ex-OKS grid."""
        gt_dict = {}
        for _, g in (gt_anns.items() if isinstance(gt_anns, dict) else enumerate(gt_anns)):
            kpts = np.array(g["keypoints"])
            if np.allclose(kpts, 0):
                continue
            gt_dict[(g["image_id"], g["id"])] = g
        dt_dict = {}
        for _, img_d in dts.items():
            for d in img_d:
                if not np.isscalar(d["id"]) and np.size(d["id"]) != 1:
                    # bottomup predictions carry the image's ann-id LIST, not
                    # a per-instance ann id — the 1:1 pred->GT-ann mapping
                    # these diagnostics need only exists in topdown GT-bbox
                    # mode, so skip them cleanly
                    return []
                dt_dict[(d["img_id"], int(np.asarray(d["id"]).reshape(())))] = d

        gt_vis, dt_vis, dt_probs, dt_scores = [], [], [], []
        for key, g in gt_dict.items():
            if key not in dt_dict:
                continue
            d = dt_dict[key]
            # recompute out-of-image visibility from the min padding needed to
            # contain each keypoint (reference coco_metric.py:866-878): points
            # outside the padded box are v=3, annotated-as-out points that are
            # actually inside become v=1
            gk = np.array(g["keypoints"], dtype=np.float64).reshape(-1, 3)
            gtv = gk[:, 2].copy()
            min_padding = find_min_padding_exact(np.array(g["bbox"], dtype=np.float64).flatten(), gk)
            kpts_out = min_padding > self.padding
            gtv[(gtv > 2) & (~kpts_out)] = 1
            gtv[kpts_out] = 3
            gt_vis.append(gtv)
            dt_vis.append(np.asarray(d["keypoints_visible"]).reshape(-1))
            dt_probs.append(np.asarray(d["keypoint_probs"]).reshape(-1))
            dt_scores.append(np.asarray(d["keypoint_scores"]).reshape(-1))
        if not gt_vis:
            return []

        gt_vis = np.concatenate(gt_vis).astype(np.float32)
        dt_vis = np.concatenate(dt_vis).astype(np.float32)
        dt_probs = np.concatenate(dt_probs).astype(np.float32)
        dt_scores = np.concatenate(dt_scores).astype(np.float32)

        # in-image probability target: v in {1,2} -> 1, v==3 -> 0, v==0 -> n/a
        gt_probs = gt_vis.copy()
        gt_probs[gt_probs == 0] = np.nan
        gt_probs[(gt_probs == 1) | (gt_probs == 2)] = 1
        gt_probs[gt_probs == 3] = 0

        # visibility target: v==1 -> 0 (occluded), v==2 -> 1, else n/a
        gt_v = gt_vis.copy()
        gt_v[gt_v == 0] = np.nan
        gt_v[gt_v == 1] = 0
        gt_v[gt_v == 2] = 1
        gt_v[gt_v == 3] = np.nan

        info_str = []
        vis_acc, vis_thr = self._do_classification_eval(gt_v, dt_vis, force_balance=True)
        info_str.extend([("vis_acc", float(vis_acc)), ("vis_thr", float(vis_thr))])

        unique_gt_probs = np.unique(gt_probs[~np.isnan(gt_probs)])
        if len(unique_gt_probs) > 1:
            prob_acc, prob_thr = self._do_classification_eval(gt_probs, dt_probs)
            info_str.extend([("prob_acc", float(prob_acc)), ("prob_thr", float(prob_thr))])
            score_acc, score_thr = self._do_classification_eval(gt_probs, dt_scores)
            info_str.extend([("score_acc", float(score_acc)), ("score_thr", float(score_thr))])
            self.prob_thr = prob_thr if self.has_probability else score_thr
        return info_str

    def _do_vector_fields_eval(self, gt_anns: Dict, dts: Dict[int, list]) -> list:
        """Prediction-error vector-field diagnostics.

        Counterpart of reference ``coco_metric.py:_do_python_vector_fields_eval:752``
        (which computes the normalized error vectors and out-of-window masks
        but discards them — plotting leftovers); here the summary statistics
        are returned as metrics: mean/median normalized error-vector length,
        the fraction of GT keypoints outside the padded activation window,
        and the fraction of predictions outside the GT bbox.
        """
        from probpose_code_tpu.structures import fix_bbox_aspect_ratio

        gt_dict = {}
        for _, g in (gt_anns.items() if isinstance(gt_anns, dict) else enumerate(gt_anns)):
            if np.allclose(np.array(g["keypoints"]), 0):
                continue
            gt_dict[(g["image_id"], g["id"])] = g
        dt_dict = {}
        for _, img_d in dts.items():
            for d in img_d:
                if not np.isscalar(d["id"]) and np.size(d["id"]) != 1:
                    return []  # bottomup: no per-instance ann id (see above)
                dt_dict[(d["img_id"], int(np.asarray(d["id"]).reshape(())))] = d

        vecs, out_abox, out_bbox = [], [], []
        for key, g in gt_dict.items():
            if key not in dt_dict:
                continue
            d = dt_dict[key]
            gtk = np.array(g["keypoints"], dtype=np.float32).reshape(-1, 3)
            dtk = np.array(d["keypoints"], dtype=np.float32).reshape(gtk.shape[0], -1)[:, :2]
            mask = gtk[:, 2] > 0
            if not mask.any():
                continue
            bbox = np.array(g["bbox"], dtype=np.float32).flatten()
            abox = fix_bbox_aspect_ratio(bbox, aspect_ratio=3 / 4, padding=self.padding, bbox_format="xywh").flatten()
            w, h = max(bbox[2], 1e-6), max(bbox[3], 1e-6)
            v = (dtk - gtk[:, :2]) / np.array([w, h], np.float32)
            oa = (
                (gtk[:, 0] < abox[0]) | (gtk[:, 0] > abox[0] + abox[2])
                | (gtk[:, 1] < abox[1]) | (gtk[:, 1] > abox[1] + abox[3])
            )
            ob = (
                (dtk[:, 0] < bbox[0]) | (dtk[:, 0] > bbox[0] + bbox[2])
                | (dtk[:, 1] < bbox[1]) | (dtk[:, 1] > bbox[1] + bbox[3])
            )
            vecs.append(v[mask])
            out_abox.append(oa[mask])
            out_bbox.append(ob[mask])
        if not vecs:
            return []
        norms = np.linalg.norm(np.concatenate(vecs), axis=-1)
        return [
            ("vec_err_mean", float(norms.mean())),
            ("vec_err_median", float(np.median(norms))),
            ("gt_out_of_window_rate", float(np.concatenate(out_abox).mean())),
            ("dt_out_of_bbox_rate", float(np.concatenate(out_bbox).mean())),
        ]

    def _do_heatmap_calibrations_eval(self, gt_kpts, dt_heatmaps, gt_aboxes):
        """Probability-mass calibration of predicted heatmaps.

        Counterpart of reference ``coco_metric.py:_do_heatmap_calibrations_eval:1009``
        (gated there by the module flag ``EVAL_HEATMAPS=False`` and computing
        without returning): for each annotated GT keypoint, rank heatmap
        pixels by value, bin the cumulative probability mass into 5% bands
        and record which band contains the GT pixel. A calibrated probmap
        puts mass-fraction p of keypoints inside the top-p band.

        Returns (x_labels, binned_ratios, avg_areas).
        """
        gt_kpts = np.array(gt_kpts, dtype=np.float32)
        dt_heatmaps = np.asarray(dt_heatmaps, dtype=np.float32)
        gt_aboxes = np.asarray(gt_aboxes, dtype=np.float32)
        B, C, H, W = dt_heatmaps.shape

        # GT keypoints -> heatmap space through the activation-window affine
        scale = (gt_aboxes[:, None, 2:4] - 1) / (np.array([W, H], np.float32) - 1)
        kpts_hm = (gt_kpts[..., :2] - gt_aboxes[:, None, :2]) / scale
        vis = gt_kpts[..., 2].reshape(-1)

        kpts_flat = kpts_hm.reshape(-1, 2).astype(int)
        maps_flat = dt_heatmaps.reshape(B * C, H, W)
        valid = (
            (vis > 0) & (vis < 3)
            & (kpts_flat[:, 0] >= 0) & (kpts_flat[:, 0] <= W - 1)
            & (kpts_flat[:, 1] >= 0) & (kpts_flat[:, 1] <= H - 1)
        )
        kpts_flat = kpts_flat[valid]
        maps_flat = maps_flat[valid]

        bar_width = 0.05
        thresholds = np.linspace(0, 1.0 + 1e-10, int(1 / bar_width) + 1, endpoint=True)
        avg_areas = np.zeros(len(thresholds) - 1)
        binned_ratios = np.zeros(len(thresholds) - 1)
        for kpt, htm in zip(kpts_flat, maps_flat):
            kpt_lin = int(kpt[1]) * W + int(kpt[0])
            flat = htm.reshape(-1)
            order = np.argsort(flat, kind="stable")[::-1]
            cumsum = np.clip(np.cumsum(flat[order]), 0, 1)
            lower = np.hstack(([0], cumsum[:-1]))[:, None]
            upper = cumsum[:, None]
            weights = np.clip(np.minimum(upper, thresholds[1:]) - np.maximum(lower, thresholds[:-1]), 0, None)
            zero_rows = weights.sum(axis=1) < 1e-10
            weights[zero_rows, -1] = 1
            weights /= weights.sum(axis=1, keepdims=True)
            avg_areas += weights.sum(axis=0)
            binned_ratios += weights[order.argsort()[kpt_lin]]
        n = max(len(kpts_flat), 1)
        binned_ratios = (binned_ratios / n)[::-1]
        avg_areas = (avg_areas / (n * H * W))[::-1]
        x_labels = (thresholds[1:] + thresholds[:-1]) / 2
        return x_labels, binned_ratios, avg_areas

    def _do_oks_to_iou_eval(self, gt_anns: Dict, dts: Dict[int, list]) -> list:
        """OKS quality vs instance crowding (reference ``:1085``, returns
        instead of discarding): greedily match detections to GTs by bbox IoU
        (>= 0.5, descending confidence); each matched detection contributes
        (OKS with its GT, max IoU with the OTHER GTs). Reported as overall
        mean OKS and mean OKS in isolated (iou < 0.1) vs crowded bins.
        """
        sigmas = np.asarray(self.dataset_meta["sigmas"], dtype=np.float64)
        vars_ = (sigmas * 2) ** 2

        gt_by_img: Dict = defaultdict(list)
        for _, g in (gt_anns.items() if isinstance(gt_anns, dict) else enumerate(gt_anns)):
            gt_by_img[g["image_id"]].append(g)

        def bbox_iou(a, b):  # xywh arrays (N, 4) x (M, 4) -> (N, M)
            ax1, ay1 = a[:, 0], a[:, 1]
            ax2, ay2 = a[:, 0] + a[:, 2], a[:, 1] + a[:, 3]
            bx1, by1 = b[:, 0], b[:, 1]
            bx2, by2 = b[:, 0] + b[:, 2], b[:, 1] + b[:, 3]
            ix = np.clip(np.minimum(ax2[:, None], bx2) - np.maximum(ax1[:, None], bx1), 0, None)
            iy = np.clip(np.minimum(ay2[:, None], by2) - np.maximum(ay1[:, None], by1), 0, None)
            inter = ix * iy
            union = (a[:, 2] * a[:, 3])[:, None] + b[:, 2] * b[:, 3] - inter
            return inter / np.clip(union, 1e-10, None)

        oks_list, crowd_iou_list = [], []
        for img_id, image_gt in gt_by_img.items():
            image_dt = dts.get(img_id, [])
            if not image_dt or not image_gt:
                continue
            dt_conf = np.array([d.get("score", 1.0) for d in image_dt])
            order = np.argsort(dt_conf)[::-1]
            image_dt = [image_dt[i] for i in order]
            gt_bboxes = np.array([np.asarray(g["bbox"], dtype=np.float64).flatten()[:4] for g in image_gt])
            have_dt_bboxes = all(d.get("bbox") is not None for d in image_dt)
            if have_dt_bboxes:
                # reference path: greedy bbox-IoU matching (>= 0.5) by
                # descending confidence
                dt_bboxes = np.array([np.asarray(d["bbox"], dtype=np.float64).flatten()[:4] for d in image_dt])
                ious = bbox_iou(dt_bboxes, gt_bboxes)
                value = ious.copy()
                value[value < 0.5] = 0
                matching = np.full(len(image_dt), -1, dtype=int)
                crowding = ious.copy()
                for dti in range(len(image_dt)):
                    if value[dti].max() > 0:
                        gti = int(np.argmax(value[dti]))
                        matching[dti] = gti
                        value[:, gti] = 0
                        crowding[dti, gti] = -1  # own GT excluded from crowding
                    else:
                        crowding[dti, :] = -1
            else:
                # pure topdown dts carry no detector bbox: match by
                # annotation id, crowding = its GT's max IoU with other GTs
                gt_index = {g["id"]: i for i, g in enumerate(image_gt)}
                # bottomup dts carry the image's ann-id LIST, never a
                # per-instance ann id -> no match (same guard as the
                # visibility diagnostics)
                matching = np.array(
                    [
                        gt_index.get(int(np.asarray(d.get("id")).reshape(())), -1)
                        if (np.isscalar(d.get("id")) or np.size(d.get("id")) == 1)
                        else -1
                        for d in image_dt
                    ],
                    dtype=int,
                )
                gt_ious = bbox_iou(gt_bboxes, gt_bboxes)
                np.fill_diagonal(gt_ious, -1)
                crowding = np.full((len(image_dt), len(image_gt)), -1.0)
                for dti, gti in enumerate(matching):
                    if gti >= 0:
                        crowding[dti, :] = gt_ious[gti].max()

            for dti, d in enumerate(image_dt):
                gti = matching[dti]
                if gti < 0:
                    continue
                g = image_gt[gti]
                gk = np.asarray(g["keypoints"], dtype=np.float64).reshape(-1, 3)
                dk = np.asarray(d["keypoints"], dtype=np.float64).reshape(gk.shape[0], -1)[:, :2]
                m = gk[:, 2] > 0
                if not m.any():
                    continue
                e = ((dk[:, 0] - gk[:, 0]) ** 2 + (dk[:, 1] - gk[:, 1]) ** 2) / max(g["area"], 1e-10) / 2.0 / vars_[: len(gk)]
                oks_list.append(float(np.mean(np.exp(-e[m]))))
                crowd_iou_list.append(float(crowding[dti].max()) if len(image_gt) > 1 else 0.0)

        if not oks_list:
            return []
        oks = np.array(oks_list)
        crowd = np.array(crowd_iou_list)
        out = [("oks_mean", float(oks.mean()))]
        isolated = crowd < 0.1
        if isolated.any():
            out.append(("oks_isolated", float(oks[isolated].mean())))
        if (~isolated).any():
            out.append(("oks_crowded", float(oks[~isolated].mean())))
        return out

    def _do_classification_eval(self, gts, dts, force_balance: bool = False):
        mask = ~np.isnan(gts)
        gts = gts[mask].astype(bool)
        dts = dts[mask]
        if force_balance:
            pos_idx = np.where(gts)[0]
            neg_idx = np.where(~gts)[0]
            num = min(len(pos_idx), len(neg_idx))
            if num == 0:
                return -1, -1
            np.random.shuffle(pos_idx)
            np.random.shuffle(neg_idx)
            idx = np.concatenate([pos_idx[:num], neg_idx[:num]])
            gts, dts = gts[idx], dts[idx]

        thresholds = np.linspace(0, 1.00, 21, endpoint=True)
        preds = dts[:, None] > thresholds
        correct = preds == gts[:, None]
        acc = correct.sum(axis=0) / len(gts)
        best = int(np.argmax(acc))
        return acc[best], thresholds[best]

    @staticmethod
    def _sort_and_unique_bboxes(kpts: Dict[int, list], key: str = "id") -> Dict[int, list]:
        for img_id, instances in kpts.items():
            instances = sorted(instances, key=lambda x: x[key])
            deduped = [
                inst for i, inst in enumerate(instances) if i == 0 or inst[key] != instances[i - 1][key]
            ]
            kpts[img_id] = deduped
        return kpts
